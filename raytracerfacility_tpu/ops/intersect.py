"""Ray-triangle intersection: Moller-Trumbore + brute-force tracers.

The brute-force O(rays x triangles) tracer is the framework's correctness
oracle (SURVEY.md section 4 test pyramid) *and* the fallback traversal when a
scene is too small to amortize a BVH build. It replaces what the reference
delegates to OptiX RT cores (hardware BVH traversal, RayTracer.cu:355-366).

Triangles are stored as ``(v0, e1, e2)`` SoA (precomputed edge basis) so the
inner loop is pure fused VPU arithmetic; rays stream over triangle chunks via
``lax.scan`` carrying a running closest-hit record, bounding peak memory to
``rays x chunk``.

Hit parameterization matches OptiX: barycentrics ``(u, v)`` weight vertices
1 and 2 (``P = (1-u-v) v0 + u v1 + v v2``), like
``optixGetTriangleBarycentrics`` consumed at RayDataDefinations.hpp:127-164.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

_DET_EPS = 1e-12


@struct.dataclass
class TraceResult:
    """Closest-hit record for a ray pool (all fields shaped (...,))."""

    t: jax.Array  # hit distance (tmax when missed)
    prim: jax.Array  # triangle index (int32, -1 when missed)
    u: jax.Array  # barycentric for vertex 1
    v: jax.Array  # barycentric for vertex 2
    hit: jax.Array  # bool


def moller_trumbore(
    origin: jax.Array,  # (..., 3)
    direction: jax.Array,  # (..., 3)
    v0: jax.Array,  # (T, 3)
    e1: jax.Array,  # (T, 3)
    e2: jax.Array,  # (T, 3)
    tmin: jax.Array,  # (...,)
    tmax: jax.Array,  # (...,)
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """All-pairs ray/triangle test: returns (valid (..., T), t, u, v).

    No backface culling (OptiX default in the reference: no CULL flags set).
    """
    o = origin[..., None, :]
    d = direction[..., None, :]
    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > _DET_EPS, 1.0 / det, 0.0)
    tvec = o - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    valid = (
        (jnp.abs(det) > _DET_EPS)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > tmin[..., None])
        & (t < tmax[..., None])
    )
    return valid, t, u, v


def _chunk_starts(num_tris: int, chunk: int) -> jax.Array:
    num_chunks = -(-num_tris // chunk)
    return jnp.arange(num_chunks, dtype=jnp.int32) * chunk


def trace_closest_bruteforce(
    v0: jax.Array,
    e1: jax.Array,
    e2: jax.Array,
    origin: jax.Array,
    direction: jax.Array,
    tmin: jax.Array,
    tmax: jax.Array,
    chunk: int = 512,
    kind: jax.Array | None = None,
) -> TraceResult:
    """Closest hit against every primitive, scanning chunks.

    ``tmin``/``tmax`` broadcast against the ray batch shape. ``kind`` marks
    sphere-swept curve rows (ops/curve.py encoding); None = all triangles.
    """
    num_tris = v0.shape[0]
    chunk = min(chunk, max(num_tris, 1))
    pad = (-num_tris) % chunk
    if pad:
        # padded triangles are degenerate (det == 0) -> never hit
        zeros = jnp.zeros((pad, 3), v0.dtype)
        v0 = jnp.concatenate([v0, zeros], axis=0)
        e1 = jnp.concatenate([e1, zeros], axis=0)
        e2 = jnp.concatenate([e2, zeros], axis=0)
        if kind is not None:
            kind = jnp.concatenate([kind, jnp.zeros(pad, kind.dtype)])

    batch_shape = jnp.broadcast_shapes(
        origin.shape[:-1], jnp.shape(tmin), jnp.shape(tmax)
    )
    tmin = jnp.broadcast_to(tmin, batch_shape)
    tmax = jnp.broadcast_to(tmax, batch_shape)

    init = TraceResult(
        t=jnp.broadcast_to(tmax, batch_shape),
        prim=jnp.full(batch_shape, -1, jnp.int32),
        u=jnp.zeros(batch_shape, jnp.float32),
        v=jnp.zeros(batch_shape, jnp.float32),
        hit=jnp.zeros(batch_shape, bool),
    )

    def body(best: TraceResult, start: jax.Array) -> tuple[TraceResult, None]:
        c_v0 = jax.lax.dynamic_slice_in_dim(v0, start, chunk)
        c_e1 = jax.lax.dynamic_slice_in_dim(e1, start, chunk)
        c_e2 = jax.lax.dynamic_slice_in_dim(e2, start, chunk)
        valid, t, u, v = moller_trumbore(
            origin, direction, c_v0, c_e1, c_e2, tmin, best.t
        )
        if kind is not None:
            from raytracerfacility_tpu.ops.curve import intersect_round_cone

            c_kind = jax.lax.dynamic_slice_in_dim(kind, start, chunk)
            c_ok, c_t, c_u = intersect_round_cone(
                origin[..., None, :], direction[..., None, :],
                c_v0, c_e1, c_e2[:, 0], c_e2[:, 1],
                tmin[..., None], best.t[..., None],
            )
            is_curve = c_kind == 1
            valid = jnp.where(is_curve, c_ok, valid)
            t = jnp.where(is_curve, c_t, t)
            u = jnp.where(is_curve, c_u, u)
            v = jnp.where(is_curve, 0.0, v)
        t = jnp.where(valid, t, jnp.inf)
        local = jnp.argmin(t, axis=-1)
        t_best = jnp.take_along_axis(t, local[..., None], axis=-1)[..., 0]
        improved = t_best < best.t
        take = lambda arr: jnp.take_along_axis(arr, local[..., None], axis=-1)[..., 0]
        return (
            TraceResult(
                t=jnp.where(improved, t_best, best.t),
                prim=jnp.where(improved, (start + local).astype(jnp.int32), best.prim),
                u=jnp.where(improved, take(u), best.u),
                v=jnp.where(improved, take(v), best.v),
                hit=best.hit | improved,
            ),
            None,
        )

    result, _ = jax.lax.scan(body, init, _chunk_starts(v0.shape[0], chunk))
    return result


def trace_any_bruteforce(
    v0: jax.Array,
    e1: jax.Array,
    e2: jax.Array,
    origin: jax.Array,
    direction: jax.Array,
    tmin: jax.Array,
    tmax: jax.Array,
    chunk: int = 512,
) -> jax.Array:
    """Occlusion query: True if *any* triangle intersects in (tmin, tmax).

    Implements the reference's shadow-ray flags TERMINATE_ON_FIRST_HIT |
    DISABLE_ANYHIT | DISABLE_CLOSESTHIT (RayFunctions.cuh:81-83): alpha
    cutouts do NOT apply to occlusion rays.
    """
    num_tris = v0.shape[0]
    chunk = min(chunk, max(num_tris, 1))
    pad = (-num_tris) % chunk
    if pad:
        zeros = jnp.zeros((pad, 3), v0.dtype)
        v0 = jnp.concatenate([v0, zeros], axis=0)
        e1 = jnp.concatenate([e1, zeros], axis=0)
        e2 = jnp.concatenate([e2, zeros], axis=0)

    batch_shape = jnp.broadcast_shapes(
        origin.shape[:-1], jnp.shape(tmin), jnp.shape(tmax)
    )
    tmin = jnp.broadcast_to(tmin, batch_shape)
    tmax = jnp.broadcast_to(tmax, batch_shape)
    init = jnp.zeros(batch_shape, bool)

    def body(occluded: jax.Array, start: jax.Array) -> tuple[jax.Array, None]:
        c_v0 = jax.lax.dynamic_slice_in_dim(v0, start, chunk)
        c_e1 = jax.lax.dynamic_slice_in_dim(e1, start, chunk)
        c_e2 = jax.lax.dynamic_slice_in_dim(e2, start, chunk)
        valid, _, _, _ = moller_trumbore(
            origin, direction, c_v0, c_e1, c_e2, tmin, tmax
        )
        return occluded | jnp.any(valid, axis=-1), None

    occluded, _ = jax.lax.scan(body, init, _chunk_starts(v0.shape[0], chunk))
    return occluded
