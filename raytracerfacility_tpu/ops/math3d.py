"""Batched 3D math + Monte-Carlo sampling primitives.

Replaces the reference's scalar device library
(``include/RayTracerFacility/RayTracer/RayTracerUtilities.cuh:89-157`` and the
2.6k-line ``CudaMath.hpp`` vector library) with SoA jnp ops: every function
takes ``(..., 3)`` arrays and broadcasts, so one call shades an entire ray
pool on the VPU.

Convention: vectors are stored in the trailing axis; all dots/crosses reduce
over ``axis=-1``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from raytracerfacility_tpu.ops.rng import lcg_next, lcg_next2

TWO_PI = 6.2831853071795864769


def dot(a: jax.Array, b: jax.Array, keepdims: bool = True) -> jax.Array:
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def cross(a: jax.Array, b: jax.Array) -> jax.Array:
    # explicit component form (jnp.cross's roll-based lowering provokes
    # layout transposes on TPU for (R, 3) operands)
    ax, ay, az = a[..., 0], a[..., 1], a[..., 2]
    bx, by, bz = b[..., 0], b[..., 1], b[..., 2]
    return jnp.stack(
        [ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=-1
    )


def length(v: jax.Array, keepdims: bool = True) -> jax.Array:
    return jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=keepdims))


def normalize(v: jax.Array) -> jax.Array:
    """glm-style normalize (no epsilon; 0-vectors produce non-finite output,
    matching the reference's behavior)."""
    return v * jax.lax.rsqrt(jnp.sum(v * v, axis=-1, keepdims=True))


def safe_normalize(v: jax.Array, eps: float = 1e-20) -> jax.Array:
    """Normalize that returns 0 for (near-)zero vectors. Used where the
    wavefront engine must keep dead lanes finite (masked lanes still execute)."""
    sq = jnp.sum(v * v, axis=-1, keepdims=True)
    return v * jax.lax.rsqrt(jnp.maximum(sq, eps)) * (sq > eps)


def reflect(incident: jax.Array, normal: jax.Array) -> jax.Array:
    """Ref: RayTracerUtilities.cuh:89-92."""
    return incident - 2.0 * dot(incident, normal) * normal


def refract(incident: jax.Array, normal: jax.Array, ior: jax.Array) -> jax.Array:
    """Ref: RayTracerUtilities.cuh:94-108 (branchless re-derivation)."""
    cos_i = jnp.clip(dot(incident, normal), -1.0, 1.0)
    entering = cos_i < 0.0
    cos_i_abs = jnp.abs(cos_i)
    eta = jnp.where(entering, 1.0 / ior, ior)
    n = jnp.where(entering, normal, -normal)
    k = 1.0 - eta * eta * (1.0 - cos_i_abs * cos_i_abs)
    refracted = incident * eta + (eta * cos_i_abs - jnp.sqrt(jnp.maximum(k, 0.0))) * n
    return jnp.where(k < 0.0, jnp.zeros_like(incident), refracted)


def tangent_space(normal: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Build an orthonormal (tangent, binormal) frame around ``normal``.

    Ref: RayTracerUtilities.cuh:110-120 (``GetTangentSpace``): helper is
    +X unless |n.x| > 0.99, then +Z; tangent = normalize(n x helper),
    binormal = normalize(n x tangent).
    """
    use_z = jnp.abs(normal[..., 0:1]) > 0.99
    helper = jnp.where(
        use_z,
        jnp.array([0.0, 0.0, 1.0], normal.dtype),
        jnp.array([1.0, 0.0, 0.0], normal.dtype),
    )
    tangent = normalize(cross(normal, helper))
    binormal = normalize(cross(normal, tangent))
    return tangent, binormal


def _from_tangent_space(
    local: jax.Array, normal: jax.Array
) -> jax.Array:
    """world = T*x + B*y + N*z with the frame of :func:`tangent_space`."""
    tangent, binormal = tangent_space(normal)
    return (
        tangent * local[..., 0:1]
        + binormal * local[..., 1:2]
        + normal * local[..., 2:3]
    )


def sample_hemisphere(
    state: jax.Array, normal: jax.Array, alpha: jax.Array | float | None = None
) -> tuple[jax.Array, jax.Array]:
    """Sample a direction in the hemisphere around ``normal``.

    With ``alpha`` (concentration in [0,1]): cos(theta) is drawn uniformly in
    ``[1-(1-alpha)^2, 1]`` — alpha=0 is the full hemisphere, alpha=1 collapses
    to ``normal``. Ref: RayTracerUtilities.cuh:122-133. Without ``alpha``:
    the uniform-cos variant of RayTracerUtilities.cuh:135-145.

    Draws exactly two variates in the reference's order (cos_theta then phi).
    Returns ``(new_state, direction)``.

    PERF: computed in planar (component-wise) form with a single stack at
    the end. (R, 3)-shaped intermediates put the 3-sized axis on the 128
    TPU lanes (42x waste) and seed layout-transpose fights; the planar form
    measured 13x faster on v5e.
    """
    state, u_cos, u_phi = lcg_next2(state)
    if alpha is None:
        cos_theta = u_cos
    else:
        alpha = jnp.asarray(alpha, jnp.float32)
        one_minus = 1.0 - alpha
        cos_theta = 1.0 - u_cos * one_minus * one_minus
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    phi = TWO_PI * u_phi
    lx = jnp.cos(phi) * sin_theta
    ly = jnp.sin(phi) * sin_theta
    lz = cos_theta

    nx, ny, nz = normal[..., 0], normal[..., 1], normal[..., 2]
    # tangent frame (planar form of tangent_space): helper = +X, or +Z when
    # |n.x| > 0.99 (ref RayTracerUtilities.cuh:110-120)
    use_z = jnp.abs(nx) > 0.99
    hx = jnp.where(use_z, 0.0, 1.0)
    hz = jnp.where(use_z, 1.0, 0.0)
    # t = normalize(cross(n, h)); h = (hx, 0, hz)
    tx = ny * hz
    ty = nz * hx - nx * hz
    tz = -ny * hx
    inv = jax.lax.rsqrt(jnp.maximum(tx * tx + ty * ty + tz * tz, 1e-20))
    tx, ty, tz = tx * inv, ty * inv, tz * inv
    # b = normalize(cross(n, t))
    bx = ny * tz - nz * ty
    by = nz * tx - nx * tz
    bz = nx * ty - ny * tx
    inv = jax.lax.rsqrt(jnp.maximum(bx * bx + by * by + bz * bz, 1e-20))
    bx, by, bz = bx * inv, by * inv, bz * inv

    ox = tx * lx + bx * ly + nx * lz
    oy = ty * lx + by * ly + ny * lz
    oz = tz * lx + bz * ly + nz * lz
    return state, jnp.stack([ox, oy, oz], axis=-1)


def sample_sphere(state: jax.Array, shape_like: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Uniform direction on the sphere. Ref: RayTracerUtilities.cuh:147-152."""
    state, u_theta = lcg_next(state)
    state, u_phi = lcg_next(state)
    theta = TWO_PI * u_theta
    phi = jnp.arccos(jnp.clip(1.0 - 2.0 * u_phi, -1.0, 1.0))
    del shape_like
    direction = jnp.stack(
        [
            jnp.sin(phi) * jnp.cos(theta),
            jnp.sin(phi) * jnp.sin(theta),
            jnp.cos(phi),
        ],
        axis=-1,
    )
    return state, direction


def sample_disk(state: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Unit vector on the disk rim. Ref: RayTracerUtilities.cuh:154-157."""
    state, u = lcg_next(state)
    theta = TWO_PI * u
    return state, jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)


def rotate_about_axis(v: jax.Array, axis: jax.Array, angle: jax.Array) -> jax.Array:
    """Rodrigues rotation of ``v`` about unit ``axis`` (glm::rotate(vec3, ...))."""
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    if c.ndim < v.ndim:
        c = c[..., None]
        s = s[..., None]
    return v * c + cross(axis, v) * s + axis * dot(axis, v) * (1.0 - c)


def transform_points(matrix: jax.Array, points: jax.Array) -> jax.Array:
    """Apply a 4x4 transform to ``(..., 3)`` points (w=1)."""
    return points @ matrix[:3, :3].T + matrix[:3, 3]


def transform_directions(matrix: jax.Array, dirs: jax.Array) -> jax.Array:
    """Apply a 4x4 transform to ``(..., 3)`` directions (w=0, no translation).

    NOTE: the reference transforms normals with the plain global transform,
    not the inverse transpose (RayDataDefinations.hpp:375) — we reproduce
    that for parity; it is exact for rigid + uniform-scale transforms.
    """
    return dirs @ matrix[:3, :3].T
