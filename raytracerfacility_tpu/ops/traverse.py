"""Stackless BVH traversal as a dense vectorized while-loop.

TPU replacement for RT-core traversal + anyhit/closesthit dispatch
(ref RayTracer.cu:355-366 optixLaunch; RayFunctions.cuh). Every ray lane
walks the *threaded* preorder BVH (ops/bvh.py): AABB hit on an internal
node -> descend to ``node + 1``; miss or leaf -> jump to ``skip[node]``.
No per-ray stack, so the whole ray pool advances in lockstep on the VPU with
pure gathers + FMA slab tests; divergence costs only masked work, never
serialization.

Leaf intersection is branchless: every iteration tests ``leaf_size``
triangles from ``leaf_start`` (masked to the actual count and to leaf
nodes), fetched contiguously from the Morton-ordered triangle copy.

This is the reference implementation the Pallas kernel (ops/pallas_trace.py)
is validated against; both are validated against the brute-force oracle.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from raytracerfacility_tpu.ops.bvh import BVH
from raytracerfacility_tpu.ops.intersect import TraceResult

_MAX_ITERS = 100_000  # hard safety bound; never reached on sane trees
_DIR_EPS = 1e-20


def _safe_inv(direction: jax.Array) -> jax.Array:
    d = jnp.where(
        jnp.abs(direction) < _DIR_EPS,
        jnp.where(direction < 0.0, -_DIR_EPS, _DIR_EPS),
        direction,
    )
    return 1.0 / d


def _leaf_intersect(
    bvh: BVH,
    leaf_start: jax.Array,
    k: int,
    origin: jax.Array,
    direction: jax.Array,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Moller-Trumbore against triangle ``leaf_start + k`` per lane."""
    slot = jnp.clip(leaf_start + k, 0, bvh.tri_v0.shape[0] - 1)
    v0 = bvh.tri_v0[slot]
    e1 = bvh.tri_e1[slot]
    e2 = bvh.tri_e2[slot]
    pvec = jnp.cross(direction, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvec = origin - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(direction * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    ok = (jnp.abs(det) > 1e-12) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
    return ok, (t, u, v), slot


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
    origin = jnp.broadcast_to(origin, batch + (3,))
    direction = jnp.broadcast_to(direction, batch + (3,))
    tmin = jnp.broadcast_to(tmin, batch)
    tmax = jnp.broadcast_to(tmax, batch)
    inv_dir = _safe_inv(direction)

    end = bvh.num_nodes

    def cond(carry):
        node, best_t, prim, uu, vv, it = carry
        return (it < _MAX_ITERS) & jnp.any(node < end)

    def body(carry):
        node, best_t, prim, uu, vv, it = carry
        active = node < end
        nidx = jnp.clip(node, 0, end - 1)

        bmin = bvh.aabb_min[nidx]
        bmax = bvh.aabb_max[nidx]
        t1 = (bmin - origin) * inv_dir
        t2 = (bmax - origin) * inv_dir
        near = jnp.max(jnp.minimum(t1, t2), axis=-1)
        far = jnp.min(jnp.maximum(t1, t2), axis=-1)
        box_hit = active & (jnp.maximum(near, tmin) <= jnp.minimum(far, best_t))

        leaf = bvh.is_leaf[nidx]
        count = bvh.leaf_count[nidx]
        start = bvh.leaf_start[nidx]
        do_leaf = box_hit & leaf
        for k in range(leaf_size):
            ok, (t, u, v), slot = _leaf_intersect(bvh, start, k, origin, direction)
            ok = ok & do_leaf & (k < count) & (t > tmin) & (t < best_t)
            best_t = jnp.where(ok, t, best_t)
            prim = jnp.where(ok, bvh.tri_prim[slot], prim)
            uu = jnp.where(ok, u, uu)
            vv = jnp.where(ok, v, vv)

        descend = box_hit & ~leaf
        node = jnp.where(descend, nidx + 1, bvh.skip[nidx])
        node = jnp.where(active, node, end)
        return node, best_t, prim, uu, vv, it + 1

    init = (
        jnp.zeros(batch, jnp.int32),
        tmax,
        jnp.full(batch, -1, jnp.int32),
        jnp.zeros(batch, jnp.float32),
        jnp.zeros(batch, jnp.float32),
        jnp.int32(0),
    )
    node, best_t, prim, uu, vv, _ = jax.lax.while_loop(cond, body, init)
    hit = prim >= 0
    return TraceResult(t=best_t, prim=prim, u=uu, v=vv, hit=hit)


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
    origin = jnp.broadcast_to(origin, batch + (3,))
    direction = jnp.broadcast_to(direction, batch + (3,))
    tmin = jnp.broadcast_to(tmin, batch)
    tmax = jnp.broadcast_to(tmax, batch)
    inv_dir = _safe_inv(direction)
    end = bvh.num_nodes

    def cond(carry):
        node, occluded, it = carry
        return (it < _MAX_ITERS) & jnp.any(node < end)

    def body(carry):
        node, occluded, it = carry
        active = node < end
        nidx = jnp.clip(node, 0, end - 1)
        bmin = bvh.aabb_min[nidx]
        bmax = bvh.aabb_max[nidx]
        t1 = (bmin - origin) * inv_dir
        t2 = (bmax - origin) * inv_dir
        near = jnp.max(jnp.minimum(t1, t2), axis=-1)
        far = jnp.min(jnp.maximum(t1, t2), axis=-1)
        box_hit = active & (jnp.maximum(near, tmin) <= jnp.minimum(far, tmax))

        leaf = bvh.is_leaf[nidx]
        count = bvh.leaf_count[nidx]
        start = bvh.leaf_start[nidx]
        do_leaf = box_hit & leaf
        found = jnp.zeros_like(occluded)
        for k in range(leaf_size):
            ok, (t, _, _), _ = _leaf_intersect(bvh, start, k, origin, direction)
            found = found | (ok & do_leaf & (k < count) & (t > tmin) & (t < tmax))
        occluded = occluded | found

        descend = box_hit & ~leaf
        node = jnp.where(descend, nidx + 1, bvh.skip[nidx])
        node = jnp.where(active & ~occluded, node, end)
        return node, occluded, it + 1

    init = (jnp.zeros(batch, jnp.int32), jnp.zeros(batch, bool), jnp.int32(0))
    _, occluded, _ = jax.lax.while_loop(cond, body, init)
    return occluded
