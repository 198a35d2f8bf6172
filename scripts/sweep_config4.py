"""Sequential A/B sweep of segmented-engine knobs on BASELINE config 4
(canopy illumination estimate, 111k tris, 222k-probe incoherent pool) —
the probe pool is where culling-granularity levers should pay most
(VERDICT r3 item 7). One fresh bench subprocess per variant; results
append to /tmp/sweep_config4.log.

Run: python scripts/sweep_config4.py [variant ...]   (default: all)
Unknown variant names are an error (exit 2), not a silent no-op.
"""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VARIANTS = [
    ("baseline", {}),
    ("group16", {"RTF_TPU_SEG_GROUP": "16"}),
    ("group8", {"RTF_TPU_SEG_GROUP": "8"}),
    ("dbits1", {"RTF_TPU_SEG_DBITS": "1"}),
    ("dbits2", {"RTF_TPU_SEG_DBITS": "2"}),
    ("group8_dbits1", {"RTF_TPU_SEG_GROUP": "8",
                       "RTF_TPU_SEG_DBITS": "1"}),
    ("mbits5", {"RTF_TPU_SEG_MBITS": "5"}),
    ("chunk128", {"RTF_TPU_FUSED_CHUNK": "128"}),
    ("sub8", {"RTF_TPU_FUSED_SUB": "8"}),
    ("bperm8", {"RTF_TPU_SEG_BPERM": "8"}),
    # per-sub-run cull bits: incoherent probe pools are where finer
    # culling granularity should pay most (tile bundles are widest)
    ("subbits", {"RTF_TPU_SEG_SUBBITS": "1"}),
    ("subbits_group16", {"RTF_TPU_SEG_SUBBITS": "1",
                         "RTF_TPU_SEG_GROUP": "16"}),
    ("subiv", {"RTF_TPU_SEG_SUBIV": "1"}),
    ("subiv_group16", {"RTF_TPU_SEG_SUBIV": "1",
                       "RTF_TPU_SEG_GROUP": "16"}),
    # static-loop hull gate (probe_mosaic p10 composition; see
    # pallas_seg SUBIV_DEFAULT) — the SUBIV variant that avoids the
    # dynamic-trip-count construct Mosaic rejects at full kernel scale
    ("subiv2", {"RTF_TPU_SEG_SUBIV": "2"}),
    ("subiv2_group16", {"RTF_TPU_SEG_SUBIV": "2",
                        "RTF_TPU_SEG_GROUP": "16"}),
    # chunk-visit-axis window (RTF_TPU_SEG_VDEPTH): the 111k-tri canopy
    # packs 434 chunks, so every segment steps 434 visit columns per
    # tile while accepting a few dozen — the skipped-step floor
    # (~2.1 us/step) this window removes is largest exactly here
    ("vdepth2", {"RTF_TPU_SEG_VDEPTH": "2"}),
    ("vdepth3", {"RTF_TPU_SEG_VDEPTH": "3"}),
    ("vdepth4", {"RTF_TPU_SEG_VDEPTH": "4"}),
    ("vdepth3_group16", {"RTF_TPU_SEG_VDEPTH": "3",
                         "RTF_TPU_SEG_GROUP": "16"}),
    ("vdepth3_chunk128", {"RTF_TPU_SEG_VDEPTH": "3",
                          "RTF_TPU_FUSED_CHUNK": "128"}),
    ("subiv2_dbits1", {"RTF_TPU_SEG_SUBIV": "2",
                       "RTF_TPU_SEG_DBITS": "1"}),
]


def run(name, env_over):
    env = dict(os.environ)
    env.update(env_over)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_rtf")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    t0 = time.time()
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"),
             "--config", "4"],
            capture_output=True, text=True, timeout=1700, env=env,
            cwd=REPO)
        out = ""
        for line in proc.stdout.splitlines():
            if line.startswith("AUX "):
                out = line
        msg = (f"{name}: {out or 'NO RESULT'} "
               f"({time.time() - t0:.0f}s) rc={proc.returncode}")
        if not out:
            msg += " err=" + (proc.stderr or "")[-200:].replace("\n", " ")
    except subprocess.TimeoutExpired:
        msg = f"{name}: TIMEOUT ({time.time() - t0:.0f}s)"
    print(msg, flush=True)
    with open("/tmp/sweep_config4.log", "a") as f:
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
