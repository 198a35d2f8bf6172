"""Sweep fused-kernel tunables (UNROLL, SUB, CHUNK, ROWS) on the real
chip via bench.py --single subprocesses (one Mosaic compile each).

Usage: python scripts/sweep_fused.py "UNROLL=2" "SUB=64,UNROLL=2" ...
Each arg is a comma-separated list of VAR=VAL, where VAR maps to
RTF_TPU_<VAR> (UNROLL -> RTF_TPU_UNROLL, SUB -> RTF_TPU_FUSED_SUB,
CHUNK -> RTF_TPU_FUSED_CHUNK, ROWS -> RTF_TPU_FUSED_ROWS).
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VARMAP = {
    "UNROLL": "RTF_TPU_UNROLL",
    "SUB": "RTF_TPU_FUSED_SUB",
    "CHUNK": "RTF_TPU_FUSED_CHUNK",
    "ROWS": "RTF_TPU_FUSED_ROWS",
    "SORTED": "RTF_TPU_SORTED",
    "SEG_EVERY": "RTF_TPU_SEG_EVERY",
    "SEG_ROWS": "RTF_TPU_SEG_ROWS",
    "SORT_BLOCK": "RTF_TPU_SORT_BLOCK",
    "SEG_MBITS": "RTF_TPU_SEG_MBITS",
    "DBITS": "RTF_TPU_SEG_DBITS",
}


def main() -> None:
    combos = sys.argv[1:] or ["UNROLL=1", "UNROLL=2", "UNROLL=4"]
    for combo in combos:
        env = dict(os.environ)
        cmd = [sys.executable, "bench.py", "--single", "1920", "1080", "3"]
        for pair in combo.split(","):
            k, v = pair.split("=")
            if k.strip() == "CFG":  # run a BASELINE config instead
                cmd = [sys.executable, "bench.py", "--config", v.strip()]
                continue
            env[VARMAP[k.strip()]] = v.strip()
        try:
            proc = subprocess.run(
                cmd, cwd=REPO, env=env, capture_output=True, text=True,
                timeout=1500,
            )
            out = proc.stdout.strip().splitlines()
            line = out[-1] if out else "(no output)"
        except subprocess.TimeoutExpired:
            line, proc = "(timeout)", None
        print(f"{combo}: {line}", flush=True)
        if proc is not None and proc.returncode != 0:
            err = proc.stderr.strip().splitlines()
            print(f"  stderr: {err[-1] if err else ''}", flush=True)


if __name__ == "__main__":
    main()
