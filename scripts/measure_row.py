"""On-chip comparison of the row-bundle trace engine (ops/pallas_row.py)
vs the scalar-broadcast streaming engine (ops/pallas_brute.py).

Cases: coherent camera-like rays and incoherent random rays, at a small
(3k) and a large (110k) triangle count. Each (engine, case) runs in its
own subprocess (a Mosaic HTTP 500 poisons the client that hit it), and
every timing is fenced by a scalar device->host readback (PERF.md
measurement rule: block_until_ready does not fence through the tunnel).

Usage: python scripts/measure_row.py [case...]
  cases default to: brute:small:coh row:small:coh brute:small:inc
  row:small:inc brute:big:inc row:big:inc
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = """
import time
import numpy as np
import jax
import jax.numpy as jnp

engine, size, coh = {case!r}.split(":")

rng = np.random.default_rng(0)
n = 3072 if size == "small" else 110592
# triangles scattered in a box, sorted along Morton-ish order by sorting
# on x+y+z so chunks are spatially tight (like the real builder's pack)
c = (rng.random((n, 3)) * 20 - 10).astype(np.float32)
order = np.argsort(c.sum(axis=1))
c = c[order]
v0 = c
e1 = (rng.standard_normal((n, 3)) * 0.15).astype(np.float32)
e2 = (rng.standard_normal((n, 3)) * 0.15).astype(np.float32)

R = 2_073_600 if size == "small" else 221_184
if coh == "coh":
    # camera-like: one origin, directions in a narrow frustum
    o = np.tile(np.array([[0.0, 0.0, -30.0]], np.float32), (R, 1))
    px = rng.random((R, 2)).astype(np.float32) * 0.6 - 0.3
    d = np.concatenate([px, np.ones((R, 1), np.float32)], axis=1)
else:
    o = (rng.random((R, 3)) * 20 - 10).astype(np.float32)
    d = rng.standard_normal((R, 3)).astype(np.float32)
d = d / np.linalg.norm(d, axis=1, keepdims=True)

from raytracerfacility_tpu.ops.pallas_brute import pack_tri_table, trace_closest_pallas
from raytracerfacility_tpu.ops.pallas_row import trace_closest_row

tbl = pack_tri_table(jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2))
tbl = jax.tree.map(jnp.asarray, tbl)
oj, dj = jnp.asarray(o), jnp.asarray(d)
tmin = jnp.full(R, 1e-3, jnp.float32)
tmax = jnp.full(R, 1e6, jnp.float32)

fn = trace_closest_row if engine == "row" else trace_closest_pallas

res = fn(tbl, oj, dj, tmin, tmax)
hits = int(jnp.sum(res.hit))  # fence
t0 = time.perf_counter()
N = 3
for _ in range(N):
    res = fn(tbl, oj, dj, tmin, tmax)
    _ = float(res.t[0])  # fence
dt = (time.perf_counter() - t0) / N
print(f"CASE {case!r} {{dt*1e3:.1f}} ms  {{R/dt/1e6:.2f}} Mrays/s  hits={{hits}}", flush=True)
"""


def main() -> None:
    cases = sys.argv[1:] or [
        "brute:small:coh", "row:small:coh",
        "brute:small:inc", "row:small:inc",
        "brute:big:inc", "row:big:inc",
    ]
    for case in cases:
        code = CHILD.format(case=case)
        proc = subprocess.run(
            [sys.executable, "-c", code], cwd=REPO,
            capture_output=True, text=True, timeout=1200,
        )
        out = proc.stdout.strip().splitlines()
        print(out[-1] if out else f"{case}: (no output)")
        if proc.returncode != 0:
            err = proc.stderr.strip().splitlines()
            print(f"  {case} FAILED: {err[-1] if err else ''}")


if __name__ == "__main__":
    main()
