"""Measure the shared-geometry instanced engine (ops/pallas_inst.py) at
a scale the denormalized world-space bake cannot hold.

Scene: a forest of N instances of one M-tri procedural tree canopy.
At N=1024, M=262144 the denormalized table would be 1024 x 262144 =
268M world triangles (~21.5 GB at 80 B/tri — beyond the v5e's 16 GB
HBM before pack-time intermediates), while the shared tables hold the
262144-tri object table (~13 MB) + 1024 instance records (64 KB).
This is the workload class the reference serves with shared BLAS +
instance records (ref RayTracer.cu:1618-1715).

Prints one line per phase; final RESULT line:
  RESULT <mrays/s> <n_inst> <obj_tris> <world_tris> <table_MB>

Run on the chip: python scripts/bench_instanced.py [n_inst] [obj_tris]
(defaults 1024 x 262144). Measurement follows PERF.md fencing rules
(device-scalar readback, fresh-compile subprocess recommended).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from raytracerfacility_tpu.ops.pallas_inst import (
    pack_instanced_tables,
    trace_closest_instanced,
)


def _tree_geom(n_tris: int, seed: int = 0):
    """A unit-scale procedural canopy blob: triangles scattered in a
    sphere of foliage over a trunk — spatially coherent (Morton runs
    cull well), like the reference's procedural vegetation."""
    rng = np.random.default_rng(seed)
    n_leaf = int(n_tris * 0.9)
    n_trunk = n_tris - n_leaf
    # foliage: small triangles on a ball at height 1.5, radius 1
    u = rng.standard_normal((n_leaf, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    r = 1.0 * rng.random((n_leaf, 1)) ** (1 / 3)
    c = u * r + np.array([0.0, 1.5, 0.0])
    e1 = rng.standard_normal((n_leaf, 3)) * 0.02
    e2 = rng.standard_normal((n_leaf, 3)) * 0.02
    v0 = c - (e1 + e2) / 3.0
    # trunk: thin triangles along y in [0, 1.5]
    h = rng.random((n_trunk, 1)) * 1.5
    a = rng.random((n_trunk, 1)) * 2 * np.pi
    tc = np.concatenate([0.05 * np.cos(a), h, 0.05 * np.sin(a)], axis=1)
    te1 = rng.standard_normal((n_trunk, 3)) * 0.03
    te2 = rng.standard_normal((n_trunk, 3)) * 0.03
    tv0 = tc - (te1 + te2) / 3.0
    return (np.concatenate([v0, tv0]).astype(np.float32),
            np.concatenate([e1, te1]).astype(np.float32),
            np.concatenate([e2, te2]).astype(np.float32))


def main() -> None:
    n_inst = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    obj_tris = int(sys.argv[2]) if len(sys.argv) > 2 else 262144
    grid = int(np.ceil(np.sqrt(n_inst)))

    t0 = time.time()
    geom = _tree_geom(obj_tris)
    rng = np.random.default_rng(1)
    mats = []
    for i in range(n_inst):
        gx, gz = i % grid, i // grid
        s = 0.8 + 0.4 * rng.random()
        th = rng.random() * 2 * np.pi
        cth, sth = np.cos(th), np.sin(th)
        m = np.array([
            [s * cth, 0.0, -s * sth, 4.0 * gx],
            [0.0, s, 0.0, 0.0],
            [s * sth, 0.0, s * cth, 4.0 * gz],
            [0.0, 0.0, 0.0, 1.0],
        ], np.float32)
        mats.append(m)
    # chunk is SMEM-window-bound at 512 (512 B/row, 2 buffering levels
    # -> 524 KB of the ~1 MB core budget; 2048 measured to fail load)
    tables = pack_instanced_tables(
        [geom], np.zeros(n_inst, np.int32), mats, chunk=512, sub=32)
    jax.block_until_ready(tables["table"])
    table_mb = tables["table"].size * 4 / 1e6
    nsteps = int(tables["step_chunk"].shape[0])
    print(f"pack: {time.time()-t0:.1f}s obj_tris={obj_tris} "
          f"n_inst={n_inst} steps={nsteps} table={table_mb:.1f}MB",
          flush=True)

    # camera pool: 512x512 primaries looking across the forest
    w = h = 512
    r = w * h
    extent = 4.0 * grid
    eye = np.array([extent * 0.5, 6.0, -0.15 * extent], np.float32)
    look = np.array([extent * 0.5, 1.0, extent * 0.5], np.float32)
    fwd = look - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, [0, 1, 0]); right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    px, py = np.meshgrid((np.arange(w) + 0.5) / w * 2 - 1,
                         (np.arange(h) + 0.5) / h * 2 - 1)
    d = (fwd[None] + 0.9 * (px.reshape(-1, 1) * right[None]
                            + py.reshape(-1, 1) * up[None]))
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    o = jnp.asarray(np.broadcast_to(eye, (r, 3)).copy())
    d = jnp.asarray(d)
    tmin = jnp.full(r, 1e-3, jnp.float32)
    tmax = jnp.full(r, 1e9, jnp.float32)

    t0 = time.time()
    res, iid = trace_closest_instanced(tables, o, d, tmin, tmax)
    fence = float(jnp.sum(res.t[:1]))  # device-scalar fence (PERF.md)
    print(f"compile+first trace: {time.time()-t0:.1f}s fence={fence:.3f}",
          flush=True)

    t0 = time.time()
    reps = 3
    for _ in range(reps):
        res, iid = trace_closest_instanced(tables, o, d, tmin, tmax)
        fence = float(jnp.sum(res.t[:1]))
    dt = (time.time() - t0) / reps
    hit_frac = float(jnp.mean(res.hit.astype(jnp.float32)))
    mrays = r / dt / 1e6
    world_tris = n_inst * obj_tris
    print(f"trace: {dt*1e3:.1f} ms/frame hit={hit_frac:.3f}", flush=True)
    print(f"RESULT {mrays:.3f} {n_inst} {obj_tris} {world_tris} "
          f"{table_mb:.1f}", flush=True)


if __name__ == "__main__":
    main()
