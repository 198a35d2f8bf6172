"""Stackless BVH traversal as an unrolled, fused, vectorized loop.

TPU replacement for RT-core traversal + anyhit/closesthit dispatch
(ref RayTracer.cu:355-366 optixLaunch; RayFunctions.cuh). Every ray lane
walks the *threaded* preorder BVH (ops/bvh.py): AABB hit on an internal
node -> descend to ``node + 1``; miss or leaf -> jump to ``skip[node]``.
No per-ray stack, so the whole ray pool advances in lockstep on the VPU
with packed-row gathers + FMA slab tests; divergence costs only masked
work, never serialization.

Performance shape (measured on v5e): a *naive* ``while_loop`` pays an HBM
round-trip of the full ray state per node visit (~1 ms/step at 230k rays).
Unrolling ``UNROLL`` traversal steps inside each ``while_loop`` iteration
lets XLA fuse them into one kernel whose node/triangle tables and ray
state stay VMEM-resident — ~0.1 us/step, a >1000x difference. The
early-exit check (``any(active)``) then runs once per UNROLL steps, which
also bounds wasted tail iterations.

Leaf handling is branchless: every step tests ``leaf_size`` triangles
from the leaf's contiguous Morton-ordered range (masked to the actual
count and to leaf nodes).
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp

from raytracerfacility_tpu.ops.bvh import BVH, decode_int_column
from raytracerfacility_tpu.ops.intersect import TraceResult

# Measured on v5e: a while_loop with a MINIMAL body is the fast path — the
# body fuses into a couple of kernels and iterations run back-to-back on
# device (~2.6 us/iteration at 230k lanes; full primary traversal of the
# bench scene in 0.5 ms). Large unrolled bodies are ~1000x slower (each
# step's ops stop fusing and round-trip HBM). Two benchmarking traps that
# previously inverted this conclusion, kept here as a warning:
#   1. NEVER close over device arrays in a jitted hot path — gathers against
#      HLO *constants* take a catastrophic slow path (1400x) on this
#      backend. Pass tables as arguments.
#   2. Repeated calls with IDENTICAL inputs can be served from an execution
#      cache; benchmark with varying inputs.
# PREFIX (unrolled straight-line steps before the loop) and UNROLL (steps
# per while body) stay configurable for experimentation; defaults are the
# measured optimum.
TRAVERSE_PREFIX = int(os.environ.get("RTF_TPU_TRAVERSE_PREFIX", "0"))
UNROLL = int(os.environ.get("RTF_TPU_TRAVERSE_UNROLL", "1"))
_MAX_OUTER = 8192  # safety bound on while-tail iterations
_DIR_EPS = 1e-20


def _safe_inv(direction: jax.Array) -> jax.Array:
    d = jnp.where(
        jnp.abs(direction) < _DIR_EPS,
        jnp.where(direction < 0.0, -_DIR_EPS, _DIR_EPS),
        direction,
    )
    return 1.0 / d


def _as_int(x: jax.Array) -> jax.Array:
    """Decode a biased int column (see ops/bvh.py INT_BIAS)."""
    return decode_int_column(x)


def _tri_test(tris, slot, origin, direction, tmin=None, has_curves=False):
    """Primitive test against packed rows: Moller-Trumbore for triangles,
    sphere-swept-segment intersection for curve rows (col 11 kind).
    Returns (ok, t, u, v, prim)."""
    row = tris[slot]  # (R, 12)
    v0 = row[:, 0:3]
    e1 = row[:, 3:6]
    e2 = row[:, 6:9]
    prim = _as_int(row[:, 9])
    pvec = jnp.cross(direction, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvec = origin - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(direction * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    ok = (jnp.abs(det) > 1e-12) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
    if has_curves:
        from raytracerfacility_tpu.ops.curve import intersect_round_cone

        is_curve = _as_int(row[:, 11]) == 1
        tmin_c = jnp.float32(0.0) if tmin is None else tmin
        c_ok, c_t, c_u = intersect_round_cone(
            origin, direction, v0, e1, e2[:, 0], e2[:, 1],
            tmin_c, jnp.float32(3.4e38),
        )
        ok = jnp.where(is_curve, c_ok, ok)
        t = jnp.where(is_curve, c_t, t)
        u = jnp.where(is_curve, c_u, u)
        v = jnp.where(is_curve, 0.0, v)
    return ok, t, u, v, prim


def trace_closest_bvh(
    bvh: BVH,
    geometry,  # unused (kept for interface symmetry with brute force)
    origin: jax.Array,
    direction: jax.Array,
    tmin: jax.Array,
    tmax: jax.Array,
) -> TraceResult:
    del geometry
    leaf_size = bvh.leaf_size
    batch = jnp.broadcast_shapes(origin.shape[:-1], jnp.shape(tmin), jnp.shape(tmax))
    flat = (math.prod(batch),) if batch else (1,)
    origin = jnp.broadcast_to(origin, batch + (3,)).reshape(flat + (3,))
    direction = jnp.broadcast_to(direction, batch + (3,)).reshape(flat + (3,))
    tmin_f = jnp.broadcast_to(tmin, batch).reshape(flat)
    tmax_f = jnp.broadcast_to(tmax, batch).reshape(flat)
    inv_dir = _safe_inv(direction)

    nodes = bvh.nodes
    tris = bvh.tris
    end = bvh.num_nodes
    n_tris = tris.shape[0]

    def step(node, best_t, prim, uu, vv):
        active = node < end
        nidx = jnp.clip(node, 0, end - 1)
        row = nodes[nidx]  # (R, 8) single gather
        t1 = (row[:, 0:3] - origin) * inv_dir
        t2 = (row[:, 3:6] - origin) * inv_dir
        near = jnp.max(jnp.minimum(t1, t2), axis=-1)
        far = jnp.min(jnp.maximum(t1, t2), axis=-1)
        box_hit = active & (jnp.maximum(near, tmin_f) <= jnp.minimum(far, best_t))

        skip = _as_int(row[:, 6])
        meta = _as_int(row[:, 7])
        count = meta >> 27
        start = meta & ((1 << 27) - 1)
        leaf = count > 0
        do_leaf = box_hit & leaf
        for k in range(leaf_size):
            slot = jnp.clip(start + k, 0, n_tris - 1)
            ok, t, u, v, p = _tri_test(
                tris, slot, origin, direction, tmin_f, bvh.has_curves
            )
            # exact ties resolve to the lowest ORIGINAL primitive index,
            # matching the brute-force oracle (argmin over original order),
            # pallas_brute and the fused kernel — cross-engine determinism
            # on shared mesh edges, which tie exactly on bounce rays
            ok = ok & do_leaf & (k < count) & (t > tmin_f) & (
                (t < best_t) | ((t == best_t) & (p < prim))
            )
            best_t = jnp.where(ok, t, best_t)
            prim = jnp.where(ok, p, prim)
            uu = jnp.where(ok, u, uu)
            vv = jnp.where(ok, v, vv)

        node = jnp.where(box_hit & ~leaf, nidx + 1, skip)
        node = jnp.where(active, node, end)
        return node, best_t, prim, uu, vv

    # fully-unrolled prefix (fused straight-line code)
    carry = (
        jnp.zeros(flat, jnp.int32),
        tmax_f,
        jnp.full(flat, -1, jnp.int32),
        jnp.zeros(flat, jnp.float32),
        jnp.zeros(flat, jnp.float32),
    )
    for _ in range(TRAVERSE_PREFIX):
        carry = step(*carry)

    # while tail for straggler lanes (correctness; rarely iterates)
    def body(c):
        *state, it = c
        for _ in range(UNROLL):
            state = step(*state)
        return (*state, it + 1)

    def cond(c):
        return (c[-1] < _MAX_OUTER) & jnp.any(c[0] < end)

    node, best_t, prim, uu, vv, _ = jax.lax.while_loop(
        cond, body, (*carry, jnp.int32(0))
    )
    return TraceResult(
        t=best_t.reshape(batch),
        prim=prim.reshape(batch),
        u=uu.reshape(batch),
        v=vv.reshape(batch),
        hit=(prim >= 0).reshape(batch),
    )


def trace_any_bvh(
    bvh: BVH,
    geometry,
    origin: jax.Array,
    direction: jax.Array,
    tmin: jax.Array,
    tmax: jax.Array,
) -> jax.Array:
    """Occlusion query: lanes terminate on their first confirmed hit
    (the TERMINATE_ON_FIRST_HIT semantics of the reference's shadow rays,
    RayFunctions.cuh:81-83)."""
    del geometry
    leaf_size = bvh.leaf_size
    batch = jnp.broadcast_shapes(origin.shape[:-1], jnp.shape(tmin), jnp.shape(tmax))
    flat = (math.prod(batch),) if batch else (1,)
    origin = jnp.broadcast_to(origin, batch + (3,)).reshape(flat + (3,))
    direction = jnp.broadcast_to(direction, batch + (3,)).reshape(flat + (3,))
    tmin_f = jnp.broadcast_to(tmin, batch).reshape(flat)
    tmax_f = jnp.broadcast_to(tmax, batch).reshape(flat)
    inv_dir = _safe_inv(direction)

    nodes = bvh.nodes
    tris = bvh.tris
    end = bvh.num_nodes
    n_tris = tris.shape[0]

    def step(node, occluded):
        active = (node < end) & ~occluded
        nidx = jnp.clip(node, 0, end - 1)
        row = nodes[nidx]
        t1 = (row[:, 0:3] - origin) * inv_dir
        t2 = (row[:, 3:6] - origin) * inv_dir
        near = jnp.max(jnp.minimum(t1, t2), axis=-1)
        far = jnp.min(jnp.maximum(t1, t2), axis=-1)
        box_hit = active & (jnp.maximum(near, tmin_f) <= jnp.minimum(far, tmax_f))

        skip = _as_int(row[:, 6])
        meta = _as_int(row[:, 7])
        count = meta >> 27
        start = meta & ((1 << 27) - 1)
        leaf = count > 0
        do_leaf = box_hit & leaf
        found = jnp.zeros_like(occluded)
        for k in range(leaf_size):
            slot = jnp.clip(start + k, 0, n_tris - 1)
            ok, t, _, _, _ = _tri_test(
                tris, slot, origin, direction, tmin_f, bvh.has_curves
            )
            found = found | (ok & do_leaf & (k < count) & (t > tmin_f) & (t < tmax_f))
        occluded = occluded | found

        node = jnp.where(box_hit & ~leaf, nidx + 1, skip)
        node = jnp.where(active & ~occluded, node, end)
        return node, occluded

    carry = (jnp.zeros(flat, jnp.int32), jnp.zeros(flat, bool))
    for _ in range(TRAVERSE_PREFIX):
        carry = step(*carry)

    def body(c):
        node, occluded, it = c
        for _ in range(UNROLL):
            node, occluded = step(node, occluded)
        return node, occluded, it + 1

    def cond(c):
        return (c[-1] < _MAX_OUTER) & jnp.any(c[0] < end)

    _, occluded, _ = jax.lax.while_loop(cond, body, (*carry, jnp.int32(0)))
    return occluded.reshape(batch)


def trace_collect_same_instance(
    bvh: BVH,
    origin: jax.Array,
    direction: jax.Array,
    tmin: jax.Array,
    tmax: jax.Array,
    instance: jax.Array,  # (...,) int32 instance filter per lane
    max_hits: int = 4,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """BSSRDF probe: collect up to ``max_hits`` hits on the SAME instance
    along (tmin, tmax), in traversal order.

    Mirrors the SpacialSampling ray type's anyhit program
    (ref BSSDF.cuh:18-37: ignore other instances, record position+normal,
    terminate after 4 records). Returns
    ``(count (...,), t (...,K), prim (...,K), u (...,K), v (...,K))``.
    """
    leaf_size = bvh.leaf_size
    batch = jnp.broadcast_shapes(
        origin.shape[:-1], jnp.shape(tmin), jnp.shape(tmax), instance.shape
    )
    flat = (math.prod(batch),) if batch else (1,)
    origin = jnp.broadcast_to(origin, batch + (3,)).reshape(flat + (3,))
    direction = jnp.broadcast_to(direction, batch + (3,)).reshape(flat + (3,))
    tmin_f = jnp.broadcast_to(tmin, batch).reshape(flat)
    tmax_f = jnp.broadcast_to(tmax, batch).reshape(flat)
    inst_f = jnp.broadcast_to(instance, batch).reshape(flat)
    inv_dir = _safe_inv(direction)

    nodes = bvh.nodes
    tris = bvh.tris
    end = bvh.num_nodes
    n_tris = tris.shape[0]

    def step(node, count, rec_t, rec_prim, rec_u, rec_v):
        active = (node < end) & (count < max_hits)
        nidx = jnp.clip(node, 0, end - 1)
        row = nodes[nidx]
        t1 = (row[:, 0:3] - origin) * inv_dir
        t2 = (row[:, 3:6] - origin) * inv_dir
        near = jnp.max(jnp.minimum(t1, t2), axis=-1)
        far = jnp.min(jnp.maximum(t1, t2), axis=-1)
        box_hit = active & (jnp.maximum(near, tmin_f) <= jnp.minimum(far, tmax_f))

        skip = _as_int(row[:, 6])
        meta = _as_int(row[:, 7])
        cnt = meta >> 27
        start = meta & ((1 << 27) - 1)
        leaf = cnt > 0
        do_leaf = box_hit & leaf
        for k in range(leaf_size):
            slot = jnp.clip(start + k, 0, n_tris - 1)
            trow = tris[slot]
            tri_inst = _as_int(trow[:, 10])
            ok, t, u, v, p = _tri_test(
                tris, slot, origin, direction, tmin_f, bvh.has_curves
            )
            ok = (
                ok & do_leaf & (k < cnt) & (t > tmin_f) & (t < tmax_f)
                & (tri_inst == inst_f) & (count < max_hits)
            )
            for r in range(max_hits):
                write = ok & (count == r)
                rec_t = rec_t.at[:, r].set(jnp.where(write, t, rec_t[:, r]))
                rec_prim = rec_prim.at[:, r].set(
                    jnp.where(write, p, rec_prim[:, r])
                )
                rec_u = rec_u.at[:, r].set(jnp.where(write, u, rec_u[:, r]))
                rec_v = rec_v.at[:, r].set(jnp.where(write, v, rec_v[:, r]))
            count = jnp.where(ok, count + 1, count)

        node = jnp.where(box_hit & ~leaf, nidx + 1, skip)
        node = jnp.where(active, node, end)
        return node, count, rec_t, rec_prim, rec_u, rec_v

    carry = (
        jnp.zeros(flat, jnp.int32),
        jnp.zeros(flat, jnp.int32),
        jnp.zeros(flat + (max_hits,), jnp.float32),
        jnp.full(flat + (max_hits,), -1, jnp.int32),
        jnp.zeros(flat + (max_hits,), jnp.float32),
        jnp.zeros(flat + (max_hits,), jnp.float32),
    )
    for _ in range(TRAVERSE_PREFIX):
        carry = step(*carry)

    def body(c):
        *state, it = c
        for _ in range(UNROLL):
            state = step(*state)
        return (*state, it + 1)

    def cond(c):
        return (c[-1] < _MAX_OUTER) & jnp.any((c[0] < end) & (c[1] < max_hits))

    _, count, rec_t, rec_prim, rec_u, rec_v, _ = jax.lax.while_loop(
        cond, body, (*carry, jnp.int32(0))
    )
    k = (max_hits,)
    return (
        count.reshape(batch),
        rec_t.reshape(batch + k),
        rec_prim.reshape(batch + k),
        rec_u.reshape(batch + k),
        rec_v.reshape(batch + k),
    )
