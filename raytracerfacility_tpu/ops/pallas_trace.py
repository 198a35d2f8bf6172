"""Pallas TPU traversal kernel: the whole BVH walk as ONE device kernel.

Motivation (measured on the v5e runtime this framework targets): the XLA
while-loop traversal executes each HLO op in the loop body as a separate
host-mediated kernel (~0.5 ms per op-execution through the runtime relay),
so a full traversal costs iterations x body-ops x 0.5 ms. A Pallas kernel
collapses the entire walk into a single op-execution whose internal loop
runs at silicon speed.

Mosaic has no per-lane vector gather, so node/triangle fetches use one-hot
matmuls on the MXU: a block of B rays builds a (B, M) one-hot of its node
indices and multiplies against the packed node table (M, 8). That trades
~M x 8 FLOPs per gather for random access — the right trade on a matmul
machine for the table sizes of this framework's scenes (<= ~8k nodes per
one-hot chunk; larger tables are gathered chunk by chunk).

Integer metadata (skip links, leaf meta, prim ids) rides through the same
matmul as exact small-integer floats: one-hot rows are exact {0,1} and
values < 2^24 survive the MXU's f32 path exactly (verified by the parity
tests against the XLA traversal).

Layout: rays are processed in blocks of B = 8*128 lanes shaped (8, 128)
(the native f32 tile); all per-ray state lives in registers/VMEM for the
whole walk.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracerfacility_tpu.ops.bvh import BVH
from raytracerfacility_tpu.ops.intersect import TraceResult

BLOCK = int(os.environ.get("RTF_TPU_PALLAS_BLOCK", "512"))  # rays/instance
_NODE_CHUNK = int(os.environ.get("RTF_TPU_PALLAS_CHUNK", "256"))  # one-hot width
_MAX_STEPS = int(os.environ.get("RTF_TPU_PALLAS_MAX_STEPS", "4096"))


def _onehot_gather(idx, table_ref, num_rows: int, out_cols: int):
    """Gather rows of ``table_ref`` (num_rows, out_cols) by ``idx`` (B,)
    via chunked one-hot matmuls. Returns (B, out_cols) f32."""
    b = idx.shape[0]
    out = jnp.zeros((b, out_cols), jnp.float32)
    num_chunks = pl.cdiv(num_rows, _NODE_CHUNK)
    for c in range(num_chunks):
        base = c * _NODE_CHUNK
        cols = jax.lax.broadcasted_iota(jnp.int32, (b, _NODE_CHUNK), 1) + base
        onehot = (idx[:, None] == cols).astype(jnp.float32)
        chunk = table_ref[pl.ds(base, _NODE_CHUNK), :]
        out = out + jnp.dot(onehot, chunk, preferred_element_type=jnp.float32)
    return out


def _traversal_kernel(
    o_ref, d_ref, tmin_ref, tmax_ref,  # ray block inputs
    nodes_ref, tris_ref,  # scene tables (padded)
    t_ref, prim_ref, u_ref, v_ref,  # outputs
    *,
    num_nodes: int,
    num_tris: int,
    leaf_size: int,
):
    ox = o_ref[:, 0]
    oy = o_ref[:, 1]
    oz = o_ref[:, 2]
    dx = d_ref[:, 0]
    dy = d_ref[:, 1]
    dz = d_ref[:, 2]
    tmin = tmin_ref[:, 0]
    tmax = tmax_ref[:, 0]

    eps = 1e-20
    ivx = 1.0 / jnp.where(jnp.abs(dx) < eps, jnp.where(dx < 0, -eps, eps), dx)
    ivy = 1.0 / jnp.where(jnp.abs(dy) < eps, jnp.where(dy < 0, -eps, eps), dy)
    ivz = 1.0 / jnp.where(jnp.abs(dz) < eps, jnp.where(dz < 0, -eps, eps), dz)

    b = ox.shape[0]
    end = num_nodes

    def tri_test(slot):
        row = _onehot_gather(slot, tris_ref, num_tris, 12)
        v0x, v0y, v0z = row[:, 0], row[:, 1], row[:, 2]
        e1x, e1y, e1z = row[:, 3], row[:, 4], row[:, 5]
        e2x, e2y, e2z = row[:, 6], row[:, 7], row[:, 8]
        prim = row[:, 9].astype(jnp.int32)  # stored as exact float value
        # pvec = d x e2
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        ok_det = jnp.abs(det) > 1e-12
        inv_det = jnp.where(ok_det, 1.0 / jnp.where(ok_det, det, 1.0), 0.0)
        tx, ty, tz = ox - v0x, oy - v0y, oz - v0z
        uu = (tx * px + ty * py + tz * pz) * inv_det
        # qvec = t x e1
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        vv = (dx * qx + dy * qy + dz * qz) * inv_det
        tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
        ok = ok_det & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
        return ok, tt, uu, vv, prim

    def step(state):
        node, best_t, prim, uu, vv = state
        active = node < end
        nidx = jnp.minimum(jnp.maximum(node, 0), end - 1)
        row = _onehot_gather(nidx, nodes_ref, num_nodes, 8)
        t1x = (row[:, 0] - ox) * ivx
        t2x = (row[:, 3] - ox) * ivx
        t1y = (row[:, 1] - oy) * ivy
        t2y = (row[:, 4] - oy) * ivy
        t1z = (row[:, 2] - oz) * ivz
        t2z = (row[:, 5] - oz) * ivz
        near = jnp.maximum(
            jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
            jnp.minimum(t1z, t2z),
        )
        far = jnp.minimum(
            jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
            jnp.maximum(t1z, t2z),
        )
        box_hit = active & (jnp.maximum(near, tmin) <= jnp.minimum(far, best_t))

        # meta columns stored as exact-integer floats (not bitcast):
        # col 6 = skip, col 7 = leaf meta (count * 2^21 + start). All values
        # stay < 2^24 so the f32 MXU path reproduces them exactly; the
        # pallas path therefore supports up to 2^21 (~2M) primitives.
        skip = row[:, 6].astype(jnp.int32)
        meta = row[:, 7].astype(jnp.int32)
        count = meta >> 21
        start = meta & ((1 << 21) - 1)
        leaf = count > 0
        do_leaf = box_hit & leaf
        for k in range(leaf_size):
            slot = jnp.minimum(jnp.maximum(start + k, 0), num_tris - 1)
            ok, tt, u_c, v_c, p_c = tri_test(slot)
            ok = ok & do_leaf & (k < count) & (tt > tmin) & (tt < best_t)
            best_t = jnp.where(ok, tt, best_t)
            prim = jnp.where(ok, p_c, prim)
            uu = jnp.where(ok, u_c, uu)
            vv = jnp.where(ok, v_c, vv)

        node = jnp.where(box_hit & ~leaf, nidx + 1, skip)
        node = jnp.where(active, node, end)
        return node, best_t, prim, uu, vv

    def body(carry):
        it, state = carry
        return it + 1, step(state)

    def cond(carry):
        it, state = carry
        return (it < _MAX_STEPS) & jnp.any(state[0] < end)

    init = (
        jnp.zeros((b,), jnp.int32),
        tmax,
        jnp.full((b,), -1, jnp.int32),
        jnp.zeros((b,), jnp.float32),
        jnp.zeros((b,), jnp.float32),
    )
    _, (node, best_t, prim, uu, vv) = jax.lax.while_loop(cond, body, (jnp.int32(0), init))

    t_ref[:, 0] = best_t
    prim_ref[:, 0] = prim
    u_ref[:, 0] = uu
    v_ref[:, 0] = vv


def _pack_meta_tables(bvh: BVH):
    """Re-encode node/tri tables with metadata as exact-integer floats
    (the bitcast encoding used by the XLA path cannot ride an MXU matmul)."""
    nodes = bvh.nodes
    skip = bvh.skip
    meta = bvh.leaf_meta
    count = meta >> 27
    start = meta & ((1 << 27) - 1)
    meta_f = (count * (1 << 21) + start).astype(jnp.float32)
    nodes_f = jnp.concatenate(
        [nodes[:, 0:6], skip.astype(jnp.float32)[:, None], meta_f[:, None]],
        axis=1,
    )
    prim_f = bvh.tri_prim.astype(jnp.float32)
    tris_f = jnp.concatenate(
        [bvh.tris[:, 0:9], prim_f[:, None], jnp.zeros((bvh.tris.shape[0], 2))],
        axis=1,
    )
    # pad tables to the one-hot chunk width
    def pad_rows(a):
        pad = (-a.shape[0]) % _NODE_CHUNK
        if pad:
            a = jnp.concatenate([a, jnp.zeros((pad, a.shape[1]), a.dtype)], axis=0)
        return a

    return pad_rows(nodes_f), pad_rows(tris_f)


@functools.partial(jax.jit, static_argnames=("num_nodes", "num_tris", "leaf_size"))
def _run(nodes_f, tris_f, origin, direction, tmin, tmax,
         num_nodes: int, num_tris: int, leaf_size: int):
    r = origin.shape[0]
    grid = (r // BLOCK,)
    kernel = functools.partial(
        _traversal_kernel,
        num_nodes=num_nodes,
        num_tris=num_tris,
        leaf_size=leaf_size,
    )
    ray_spec = lambda cols: pl.BlockSpec(
        (BLOCK, cols), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    table_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((BLOCK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    t, prim, u, v = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[ray_spec(3), ray_spec(3), ray_spec(1), ray_spec(1),
                  table_spec, table_spec],
        out_specs=(out_spec, out_spec, out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((r, 1), jnp.float32),
            jax.ShapeDtypeStruct((r, 1), jnp.int32),
            jax.ShapeDtypeStruct((r, 1), jnp.float32),
            jax.ShapeDtypeStruct((r, 1), jnp.float32),
        ),
    )(origin, direction, tmin, tmax, nodes_f, tris_f)
    return t[:, 0], prim[:, 0], u[:, 0], v[:, 0]


def trace_closest_pallas(
    bvh: BVH,
    nodes_f: jax.Array,
    tris_f: jax.Array,
    origin: jax.Array,
    direction: jax.Array,
    tmin,
    tmax,
) -> TraceResult:
    """Closest-hit traversal as one Pallas kernel per ray block.

    ``nodes_f``/``tris_f`` come from :func:`_pack_meta_tables` (cache them
    with the scene). Curve primitives are not yet supported in the kernel;
    callers dispatch curve scenes to the XLA path.
    """
    batch = origin.shape[:-1]
    r = math.prod(batch) if batch else 1
    pad = (-r) % BLOCK
    o = origin.reshape(r, 3)
    d = direction.reshape(r, 3)
    tmin_f = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (r,))[:, None]
    tmax_f = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))[:, None]
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3))], axis=0)
        d = jnp.concatenate([d, jnp.ones((pad, 3))], axis=0)
        tmin_f = jnp.concatenate([tmin_f, jnp.zeros((pad, 1))], axis=0)
        tmax_f = jnp.concatenate([tmax_f, jnp.zeros((pad, 1))], axis=0)

    t, prim, u, v = _run(
        nodes_f, tris_f, o, d, tmin_f, tmax_f,
        num_nodes=bvh.num_nodes,
        num_tris=bvh.tris.shape[0],
        leaf_size=bvh.leaf_size,
    )
    t = t[:r].reshape(batch)
    prim = prim[:r].reshape(batch)
    return TraceResult(
        t=t,
        prim=prim,
        u=u[:r].reshape(batch),
        v=v[:r].reshape(batch),
        hit=prim >= 0,
    )


pack_meta_tables = _pack_meta_tables
