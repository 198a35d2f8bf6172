"""Vectorized texture sampling: bilinear 2D fetches and cubemap lookup.

Replaces ``cudaTextureObject`` fetches (ref RayDataDefinations.hpp:248-281,
bound with wrap addressing + linear filtering + normalized coords at
RayTracer.cu:305-338) with gather-based bilinear sampling from a padded
texture *stack*: all of a scene's 2D textures are padded to a common
``(H, W)`` and stacked into one ``(K, H, W, 4)`` array so a single shading
pass can fetch from per-lane texture indices with one gather.

Cubemap sampling ports the manual 6-face selection the reference already
does in software (RayTracerUtilities.cuh:54-80).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def build_texture_stack(
    textures: list[np.ndarray],
) -> tuple[jax.Array, jax.Array]:
    """Pad a list of ``(h, w, 4)`` float32 textures to a common size and stack.

    Returns ``(texels (K, H, W, 4), sizes (K, 2) int32 as (h, w))``. With an
    empty list, returns a 1x1x1 dummy so downstream shapes stay static.
    """
    if not textures:
        return (
            jnp.zeros((1, 1, 1, 4), jnp.float32),
            jnp.ones((1, 2), jnp.int32),
        )
    max_h = max(t.shape[0] for t in textures)
    max_w = max(t.shape[1] for t in textures)
    stack = np.zeros((len(textures), max_h, max_w, 4), np.float32)
    sizes = np.zeros((len(textures), 2), np.int32)
    for i, t in enumerate(textures):
        t = np.asarray(t, np.float32)
        if t.ndim == 2:
            t = t[..., None]
        if t.shape[-1] < 4:
            t = np.concatenate(
                [t, np.ones(t.shape[:-1] + (4 - t.shape[-1],), np.float32)], axis=-1
            )
        stack[i, : t.shape[0], : t.shape[1]] = t[..., :4]
        sizes[i] = (t.shape[0], t.shape[1])
    return jnp.asarray(stack), jnp.asarray(sizes)


def sample_stack_bilinear(
    texels: jax.Array,  # (K, H, W, 4)
    sizes: jax.Array,  # (K, 2) int32
    index: jax.Array,  # (...,) int32 texture id per lane (clamped >= 0)
    uv: jax.Array,  # (..., 2)
) -> jax.Array:
    """Bilinear fetch with wrap addressing and half-texel centers.

    Matches CUDA's linear filtering of normalized coords
    (``tex2D(u, v)`` samples texel centers at ``(i + 0.5) / size``) with
    ``cudaAddressModeWrap`` (RayTracer.cu:309-313).
    Returns ``(..., 4)`` texels.
    """
    index = jnp.clip(index, 0, texels.shape[0] - 1)
    hw = sizes[index]  # (..., 2)
    h = hw[..., 0].astype(jnp.float32)
    w = hw[..., 1].astype(jnp.float32)
    # wrap normalized coords, convert to texel space centered on texel centers
    u = uv[..., 0] - jnp.floor(uv[..., 0])
    v = uv[..., 1] - jnp.floor(uv[..., 1])
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    wi = hw[..., 1]
    hi = hw[..., 0]
    x0i = jnp.mod(x0.astype(jnp.int32), wi)
    x1i = jnp.mod(x0i + 1, wi)
    y0i = jnp.mod(y0.astype(jnp.int32), hi)
    y1i = jnp.mod(y0i + 1, hi)

    t00 = texels[index, y0i, x0i]
    t10 = texels[index, y0i, x1i]
    t01 = texels[index, y1i, x0i]
    t11 = texels[index, y1i, x1i]
    top = t00 * (1.0 - fx) + t10 * fx
    bot = t01 * (1.0 - fx) + t11 * fx
    return top * (1.0 - fy) + bot * fy


def sample_cubemap(faces: jax.Array, direction: jax.Array) -> jax.Array:
    """Cubemap fetch via manual face selection + bilinear face sample.

    ``faces`` is ``(6, H, W, 4)`` ordered +X, -X, +Y, -Y, +Z, -Z, matching
    the reference's binding order (RayTracer.cu:315-338). The face-selection
    and uv math ports RayTracerUtilities.cuh:54-80.
    """
    d = direction
    ax = jnp.abs(d[..., 0])
    ay = jnp.abs(d[..., 1])
    az = jnp.abs(d[..., 2])

    z_major = (az >= ax) & (az >= ay)
    y_major = (~z_major) & (ay >= ax)
    x_major = ~(z_major | y_major)

    face_z = jnp.where(d[..., 2] < 0.0, 5, 4)
    face_y = jnp.where(d[..., 1] < 0.0, 3, 2)
    face_x = jnp.where(d[..., 0] < 0.0, 1, 0)
    face = jnp.where(z_major, face_z, jnp.where(y_major, face_y, face_x))

    ma = 0.5 / jnp.where(z_major, az, jnp.where(y_major, ay, ax))
    uz = jnp.stack(
        [jnp.where(d[..., 2] < 0.0, -d[..., 0], d[..., 0]), -d[..., 1]], axis=-1
    )
    uy = jnp.stack(
        [d[..., 0], jnp.where(d[..., 1] > 0.0, d[..., 2], -d[..., 2])], axis=-1
    )
    ux = jnp.stack(
        [jnp.where(d[..., 0] < 0.0, d[..., 2], -d[..., 2]), -d[..., 1]], axis=-1
    )
    uv = jnp.where(
        z_major[..., None], uz, jnp.where(y_major[..., None], uy, ux)
    )
    uv = uv * ma[..., None] + 0.5

    sizes = jnp.broadcast_to(
        jnp.array([faces.shape[1], faces.shape[2]], jnp.int32), (6, 2)
    )
    return sample_stack_bilinear(faces, sizes, face, uv)
