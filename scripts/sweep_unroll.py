"""Sweep RTF_TPU_UNROLL for the fused/brute trace kernels on the real chip.

Each value is a distinct Mosaic kernel variant (30-300 s remote compile),
so each attempt runs in its own subprocess with a generous timeout and the
per-frame scalar-readback fence from bench.py (block_until_ready does not
fence through the tunnel — PERF.md measurement rule).

Usage: python scripts/sweep_unroll.py [unroll values...]
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    values = [int(v) for v in sys.argv[1:]] or [1, 2, 4]
    for v in values:
        env = dict(os.environ, RTF_TPU_UNROLL=str(v))
        proc = subprocess.run(
            [sys.executable, "bench.py", "--single", "1920", "1080", "3"],
            cwd=REPO, env=env, capture_output=True, text=True, timeout=1500,
        )
        out = proc.stdout.strip().splitlines()
        line = out[-1] if out else "(no output)"
        print(f"UNROLL={v}: {line}")
        if proc.returncode != 0:
            err = proc.stderr.strip().splitlines()
            print(f"  stderr: {err[-1] if err else ''}", file=sys.stderr)


if __name__ == "__main__":
    main()
