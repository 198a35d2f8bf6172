"""A/B the sorted-state wavefront engine (cc17622) on BASELINE configs
3 (BTF sphere) and 7 (strands): RTF_TPU_SORTED_TRACE=0 (round-3
unsorted wavefront) vs 1 (coherence-sorted trace + sorted-state shade).
One fresh bench subprocess per cell; appends to /tmp/ab_config37.log.

Run: python scripts/ab_config37.py [3|7 ...]   (default: both)
"""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(config: str, sorted_flag: str) -> None:
    env = dict(os.environ)
    env["RTF_TPU_SORTED_TRACE"] = sorted_flag
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_rtf")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    t0 = time.time()
    name = f"config{config}_sorted{sorted_flag}"
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"),
             "--config", config],
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
    with open("/tmp/ab_config37.log", "a") as f:
        f.write(msg + "\n")


def main() -> None:
    configs = sys.argv[1:] or ["3", "7"]
    for c in configs:
        for flag in ("1", "0"):
            run(c, flag)


if __name__ == "__main__":
    main()
