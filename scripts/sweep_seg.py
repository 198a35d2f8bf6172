"""Sequential A/B sweep of segmented-engine knobs on the headline config
(1080p, 8 bounces, 4 progressive frames), one fresh bench subprocess per
variant (PERF.md measurement rules: the subprocess fences with a device
scalar readback and a crashed worker only poisons its own process).

Run: python scripts/sweep_seg.py [variant ...]   (default: all VARIANTS)
Unknown variant names are an error (exit 2), not a silent no-op.
Results append to /tmp/sweep_seg.log as they land.
"""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VARIANTS = [
    ("baseline", {}),
    # tiled raygen (square pixel blocks per kernel tile) — default OFF
    # after the round-4 2x2 A/B measured it at -1.2 Mrays/s (PERF.md)
    ("tiled", {"RTF_TPU_TILED_RAYGEN": "1"}),
    ("chunk128", {"RTF_TPU_FUSED_CHUNK": "128"}),
    # finer level-1 culling via the PROVEN chunk mechanism (the sub-run
    # scalar-prefetch levers crash the remote Mosaic compiler): smaller
    # chunks = finer cull granularity + finer front-to-back ordering at
    # the cost of more chunk_order rows + more per-chunk scalar steps.
    # NOTE chunk=64 requires SUB=8 (chunk//sub must be a multiple of 8 —
    # pack_fused_tables asserts), hence no plain "chunk64" variant.
    ("chunk64_sub8", {"RTF_TPU_FUSED_CHUNK": "64",
                      "RTF_TPU_FUSED_SUB": "8"}),
    ("chunk128_sub8", {"RTF_TPU_FUSED_CHUNK": "128",
                       "RTF_TPU_FUSED_SUB": "8"}),
    ("sub8", {"RTF_TPU_FUSED_SUB": "8"}),
    ("rows16", {"RTF_TPU_SEG_ROWS": "16"}),
    ("rows8", {"RTF_TPU_SEG_ROWS": "8"}),
    ("rows16_sub8", {"RTF_TPU_SEG_ROWS": "16", "RTF_TPU_FUSED_SUB": "8"}),
    ("rows16_chunk128", {"RTF_TPU_SEG_ROWS": "16",
                         "RTF_TPU_FUSED_CHUNK": "128"}),
    ("mbits3", {"RTF_TPU_SEG_MBITS": "3"}),
    ("mbits5", {"RTF_TPU_SEG_MBITS": "5"}),
    ("every2", {"RTF_TPU_SEG_EVERY": "2"}),
    # deeper liveness-window cascades (/16, /32 sort+trace windows for
    # the ~3%-live late bounce segments; default stops at /8)
    ("wdepth4", {"RTF_TPU_SEG_WDEPTH": "4"}),
    ("wdepth5", {"RTF_TPU_SEG_WDEPTH": "5"}),
    # per-sub-run cull bits (scalar-prefetch bitmask gates each sub-run's
    # vector slab + any-reduce; the row-group idea without its overhead)
    ("subbits", {"RTF_TPU_SEG_SUBBITS": "1"}),
    ("subbits_wdepth4", {"RTF_TPU_SEG_SUBBITS": "1",
                         "RTF_TPU_SEG_WDEPTH": "4"}),
    # sub-run [lo, hi) hull: the bitmask's win without its per-run
    # cond/shift (which crash the remote Mosaic compiler)
    ("subiv", {"RTF_TPU_SEG_SUBIV": "1"}),
    ("subiv_chunk128", {"RTF_TPU_SEG_SUBIV": "1",
                        "RTF_TPU_FUSED_CHUNK": "128"}),
    ("subiv_sub8", {"RTF_TPU_SEG_SUBIV": "1", "RTF_TPU_FUSED_SUB": "8"}),
    # static-loop hull gate (probe_mosaic p10 composition: no dynamic
    # trip count / shift — the constructs Mosaic rejects at full scale)
    ("subiv2", {"RTF_TPU_SEG_SUBIV": "2"}),
    ("subiv2_sub8", {"RTF_TPU_SEG_SUBIV": "2", "RTF_TPU_FUSED_SUB": "8"}),
    ("subiv2_chunk128", {"RTF_TPU_SEG_SUBIV": "2",
                         "RTF_TPU_FUSED_CHUNK": "128"}),
    # row-group culling granularity (default 0 = whole tile; measured
    # round 4 at the headline: 16/8/4 = 29.6/24.6/16.6 vs 31.0 — the
    # per-group cond + any-reduce overhead loses on coherent camera
    # pools, PERF.md. Knob kept for incoherent pools: sweep_config4.py)
    ("group0", {"RTF_TPU_SEG_GROUP": "0"}),
    ("group8", {"RTF_TPU_SEG_GROUP": "8"}),
    ("group4", {"RTF_TPU_SEG_GROUP": "4"}),
    ("group16", {"RTF_TPU_SEG_GROUP": "16"}),
    # static phase split (RTF_TPU_SEG_SPLIT = s0): slice the pool to the
    # live-prefix bucket after the reorder entering segment s0 and run
    # every remaining segment at that width — removes the full-pool-width
    # tail concatenates (the ~18-21 ms/segment reorder floor, PERF.md r4)
    ("split2", {"RTF_TPU_SEG_SPLIT": "2"}),
    ("split3", {"RTF_TPU_SEG_SPLIT": "3"}),
    ("split4", {"RTF_TPU_SEG_SPLIT": "4"}),
    ("split2_wdepth4", {"RTF_TPU_SEG_SPLIT": "2",
                        "RTF_TPU_SEG_WDEPTH": "4"}),
    # chunk-visit-axis window (RTF_TPU_SEG_VDEPTH = k): run each
    # segment on the smallest static visit width (nchunks, /2, ../2^k)
    # covering the max accepted-chunk count over its tiles — removes
    # the ~2.1 us/step skipped-visit grid floor. On top of the split-3
    # default; each level adds one kernel-shape compile per variant
    ("vdepth1", {"RTF_TPU_SEG_VDEPTH": "1"}),
    ("vdepth2", {"RTF_TPU_SEG_VDEPTH": "2"}),
    # block-permutation reorder (RTF_TPU_SEG_BPERM = rows/block; _FROM =
    # first bounce segment that uses it, earlier ones keep the exact sort)
    ("bperm8", {"RTF_TPU_SEG_BPERM": "8"}),
    ("bperm16", {"RTF_TPU_SEG_BPERM": "16"}),
    ("bperm4", {"RTF_TPU_SEG_BPERM": "4"}),
    ("bperm8_from3", {"RTF_TPU_SEG_BPERM": "8",
                      "RTF_TPU_SEG_BPERM_FROM": "3"}),
    ("bperm8_from4", {"RTF_TPU_SEG_BPERM": "8",
                      "RTF_TPU_SEG_BPERM_FROM": "4"}),
    # hybrid: every k-th reorder in the bperm region is the exact
    # compacting sort (resets within-block divergence, RTF_TPU_SEG_BPERM_EXACT)
    ("bperm8_exact2", {"RTF_TPU_SEG_BPERM": "8",
                       "RTF_TPU_SEG_BPERM_EXACT": "2"}),
    ("bperm8_exact3", {"RTF_TPU_SEG_BPERM": "8",
                       "RTF_TPU_SEG_BPERM_EXACT": "3"}),
    ("bperm8_exact4", {"RTF_TPU_SEG_BPERM": "8",
                       "RTF_TPU_SEG_BPERM_EXACT": "4"}),
]


def run(name, env_over):
    env = dict(os.environ)
    env.update(env_over)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_rtf")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    t0 = time.time()
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"), "--single",
             "1920", "1080", "4"],
            capture_output=True, text=True, timeout=1700, env=env,
            cwd=REPO)
        out = ""
        for line in proc.stdout.splitlines():
            if line.startswith("RESULT"):
                out = line
        msg = (f"{name}: {out or 'NO RESULT'} "
               f"({time.time() - t0:.0f}s) rc={proc.returncode}")
        if not out:
            msg += " err=" + (proc.stderr or "")[-200:].replace("\n", " ")
    except subprocess.TimeoutExpired:
        msg = f"{name}: TIMEOUT ({time.time() - t0:.0f}s)"
    print(msg, flush=True)
    with open("/tmp/sweep_seg.log", "a") as f:
        f.write(msg + "\n")


def main():
    known = {n for n, _ in VARIANTS}
    names = sys.argv[1:] or [n for n, _ in VARIANTS]
    unknown = [n for n in names if n not in known]
    if unknown:
        print(f"unknown variant(s): {unknown}; known: {sorted(known)}",
              file=sys.stderr)
        sys.exit(2)
    for name, env_over in VARIANTS:
        if name in names:
            run(name, env_over)


if __name__ == "__main__":
    main()
