"""Environment lighting: cubemap / flat color, Nishita sky, single light.

Ports the behavior of ``include/RayTracerFacility/RayTracer/Environment.cuh``:

* ``CalculateEnvironmentalLight`` (ref :147-175) — the miss-shader radiance
  with the three environment modes and the inverse-gamma post-op.
* ``NishitaSkyIncidentLight`` (ref :75-145) — single-scattering Rayleigh+Mie
  march, vectorized: the sequential per-ray sample march becomes a cumsum
  over a static sample axis, and the inner light march an all-samples
  validity mask (the reference's early ``break`` simply zeroes the sample's
  contribution, ref :122-137).

The environment *mode* is static Python config (it changes rarely and resets
accumulation in the reference anyway, RayTracer.cu:258-261), so XLA prunes
the unused branches per-compile.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from raytracerfacility_tpu.enums import EnvironmentalLightingType
from raytracerfacility_tpu.ops.math3d import dot
from raytracerfacility_tpu.ops.texture import sample_cubemap

# numpy (host) constants: module-level jnp arrays are device buffers that
# poison every jit that closes over them (see ops/rng.py note)
import numpy as _np

_BETA_R = _np.array([3.8e-6, 13.5e-6, 33.1e-6], _np.float32)
_BETA_M = _np.array([21e-6, 21e-6, 21e-6], _np.float32)


@struct.dataclass
class AtmosphereState:
    """Ref RayTracer.hpp:115-126 (defaults preserved)."""

    earth_radius: jax.Array  # km
    atmosphere_radius: jax.Array  # km
    hr: jax.Array  # Rayleigh scale height, m
    hm: jax.Array  # Mie scale height, m
    g: jax.Array  # Mie mean cosine

    @classmethod
    def default(cls) -> "AtmosphereState":
        return cls(
            earth_radius=jnp.float32(6360.0),
            atmosphere_radius=jnp.float32(6420.0),
            hr=jnp.float32(7994.0),
            hm=jnp.float32(1200.0),
            g=jnp.float32(0.76),
        )


@struct.dataclass
class EnvironmentState:
    """Device-side environment parameters (pytree).

    Mirrors ``EnvironmentProperties`` (ref RayTracer.hpp:103-126) minus the
    statics that live in :class:`EnvironmentConfig`.
    """

    skylight_intensity: jax.Array
    ambient_light_intensity: jax.Array
    light_size: jax.Array
    gamma: jax.Array
    sun_direction: jax.Array  # (3,)
    color: jax.Array  # (3,)
    cubemap: jax.Array | None  # (6, H, W, 4) or None
    atmosphere: AtmosphereState

    @classmethod
    def default(cls, **overrides) -> "EnvironmentState":
        base = dict(
            skylight_intensity=jnp.float32(1.0),
            ambient_light_intensity=jnp.float32(0.1),
            light_size=jnp.float32(0.0),
            gamma=jnp.float32(1.0),
            sun_direction=jnp.array([0.0, 1.0, 0.0], jnp.float32),
            color=jnp.array([1.0, 1.0, 1.0], jnp.float32),
            cubemap=None,
            atmosphere=AtmosphereState.default(),
        )
        base.update(overrides)
        return cls(**base)


def cie_sky_intensity(ray_dir, sun_dir, zenith):
    """CIE overcast/clear-sky luminance ratio (ref Environment.cuh:8-26).

    Present for parity: the reference defines but never calls it; exposed
    here as a utility for custom sky shaders."""
    horizon = ray_dir[..., 1] <= 0.0
    flat = jnp.stack(
        [ray_dir[..., 0], jnp.full(ray_dir.shape[:-1], 0.01), ray_dir[..., 2]],
        axis=-1,
    )
    rd = jnp.where(horizon[..., None], flat, ray_dir)
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)

    def angle(a, b):
        return jnp.arccos(jnp.clip(jnp.sum(a * b, axis=-1), -1.0, 1.0))

    gamma = angle(sun_dir, rd)
    cos2_gamma = jnp.cos(gamma) ** 2
    theta = angle(zenith, rd)
    z0 = angle(zenith, sun_dir)
    cos2_z0 = jnp.cos(z0) ** 2
    e = 2.7182818
    return (
        (0.91 + 10.0 * e ** (-3.0 * gamma) + 0.45 * cos2_gamma)
        * (1.0 - e ** (-0.32 / jnp.cos(theta)))
        / 0.27
        / (0.91 + 10.0 * e ** (-3.0 * z0) + 0.45 * cos2_z0)
    )


def _ray_sphere_both(orig: jax.Array, direction: jax.Array, radius) -> tuple:
    """Both intersection distances with a sphere at the origin.

    Ref Environment.cuh:28-65 (SolveQuadratic + RaySphereIntersect),
    branchless: returns (valid, t0, t1) with t0 <= t1.
    """
    a = jnp.sum(direction * direction, axis=-1)
    b = 2.0 * jnp.sum(direction * orig, axis=-1)
    c = jnp.sum(orig * orig, axis=-1) - radius * radius
    discr = b * b - 4.0 * a * c
    valid = discr >= 0.0
    sq = jnp.sqrt(jnp.maximum(discr, 0.0))
    q = jnp.where(b < 0.0, -0.5 * (b - sq), -0.5 * (b + sq))
    # guard the q==0 / a==0 degenerate cases like the reference's b==0 branch
    safe_a = jnp.where(a == 0.0, 1.0, a)
    safe_q = jnp.where(q == 0.0, 1.0, q)
    x1 = q / safe_a
    x2 = c / safe_q
    t0 = jnp.minimum(x1, x2)
    t1 = jnp.maximum(x1, x2)
    return valid, t0, t1


def nishita_sky(
    position: jax.Array,  # (..., 3)
    ray_dir: jax.Array,  # (..., 3)
    env: EnvironmentState,
    num_samples: int = 16,
    num_samples_light: int = 8,
) -> jax.Array:
    """Single-scattering sky radiance. Ref Environment.cuh:75-145.

    ``num_samples`` / ``num_samples_light`` are static (they are config ints
    in the reference too, RayTracer.hpp:124-125).
    """
    earth_radius = env.atmosphere.earth_radius * 1000.0
    atmosphere_radius = env.atmosphere.atmosphere_radius * 1000.0
    hr = env.atmosphere.hr
    hm = env.atmosphere.hm
    g = env.atmosphere.g

    up = _np.array([0.0, 1.0, 0.0], _np.float32)
    orig = position + up * earth_radius
    valid, t0, t1 = _ray_sphere_both(orig, ray_dir, atmosphere_radius)
    valid = valid & (t1 >= 0.0)
    tmin = jnp.where((t0 > 0.0), jnp.maximum(t0, 0.0), 0.0)
    tmax = jnp.minimum(t1, 999999999999.0)

    seg_len = (tmax - tmin) / num_samples  # (...,)
    mu = jnp.sum(ray_dir * env.sun_direction, axis=-1)
    phase_r = 3.0 / (16.0 * jnp.pi) * (1.0 + mu * mu)
    phase_m = (
        3.0
        / (8.0 * jnp.pi)
        * ((1.0 - g * g) * (1.0 + mu * mu))
        / ((2.0 + g * g) * jnp.power(1.0 + g * g - 2.0 * g * mu, 1.5))
    )

    # Sample positions along the view ray: (..., S, 3)
    i = jnp.arange(num_samples, dtype=jnp.float32)
    t_mid = tmin[..., None] + (i + 0.5) * seg_len[..., None]
    sample_pos = orig[..., None, :] + t_mid[..., :, None] * ray_dir[..., None, :]
    height = jnp.linalg.norm(sample_pos, axis=-1) - earth_radius
    # Exponent clamp: rays marching below ground produce huge optical depths;
    # the reference's sequential march hits inf and relies on its light-march
    # `break` to skip those samples. Clamping at e^60 keeps every product
    # finite (the transmittance underflows to 0 either way).
    hr_i = jnp.exp(jnp.minimum(-height / hr, 60.0)) * seg_len[..., None]  # (..., S)
    hm_i = jnp.exp(jnp.minimum(-height / hm, 60.0)) * seg_len[..., None]
    # reference accumulates optical depth sequentially; inclusive cumsum
    optical_r = jnp.cumsum(hr_i, axis=-1)
    optical_m = jnp.cumsum(hm_i, axis=-1)

    # Light march from each sample toward the sun: (..., S, L)
    _, _, t1_light = _ray_sphere_both(
        sample_pos, jnp.broadcast_to(env.sun_direction, sample_pos.shape),
        atmosphere_radius,
    )
    seg_light = t1_light / num_samples_light  # (..., S)
    j = jnp.arange(num_samples_light, dtype=jnp.float32)
    tl_mid = (j + 0.5) * seg_light[..., None]  # (..., S, L)
    light_pos = sample_pos[..., None, :] + tl_mid[..., None] * env.sun_direction
    height_light = jnp.linalg.norm(light_pos, axis=-1) - earth_radius
    # the reference breaks out (and drops the sample) if any light sample
    # dips below ground (Environment.cuh:126-131)
    light_valid = jnp.all(height_light >= 0.0, axis=-1)  # (..., S)
    od_light_r = (
        jnp.sum(jnp.exp(jnp.minimum(-height_light / hr, 60.0)), axis=-1) * seg_light
    )
    od_light_m = (
        jnp.sum(jnp.exp(jnp.minimum(-height_light / hm, 60.0)), axis=-1) * seg_light
    )

    tau = (
        _BETA_R * (optical_r + od_light_r)[..., None]
        + _BETA_M * 1.1 * (optical_m + od_light_m)[..., None]
    )
    attenuation = jnp.exp(-tau)  # (..., S, 3)
    sum_r = jnp.sum(
        jnp.where(light_valid[..., None], attenuation * hr_i[..., None], 0.0), axis=-2
    )
    sum_m = jnp.sum(
        jnp.where(light_valid[..., None], attenuation * hm_i[..., None], 0.0), axis=-2
    )

    result = (sum_r * _BETA_R * phase_r[..., None] +
              sum_m * _BETA_M * phase_m[..., None]) * 20.0
    return jnp.where(valid[..., None], result, 0.0)


def calculate_environmental_light(
    position: jax.Array,
    ray_dir: jax.Array,
    env: EnvironmentState,
    lighting_type: EnvironmentalLightingType,
    num_samples: int = 16,
    num_samples_light: int = 8,
) -> jax.Array:
    """Miss-shader radiance. Ref Environment.cuh:147-175."""
    if lighting_type == EnvironmentalLightingType.SCENE:
        if env.cubemap is not None:
            color = sample_cubemap(env.cubemap, ray_dir)[..., :3]
        else:
            color = jnp.broadcast_to(env.color, ray_dir.shape)
        color = color * env.skylight_intensity
    elif lighting_type == EnvironmentalLightingType.SKYDOME:
        color = nishita_sky(position, ray_dir, env, num_samples, num_samples_light)
        color = color * env.skylight_intensity
    elif lighting_type == EnvironmentalLightingType.SINGLE_LIGHT_SOURCE:
        color = jnp.broadcast_to(env.color * env.skylight_intensity, ray_dir.shape)
    else:
        raise ValueError(f"unknown lighting type {lighting_type}")
    color = jnp.power(jnp.maximum(color, 0.0), 1.0 / env.gamma)
    return jnp.maximum(color, 0.0)


def sun_cone_intensity(env: EnvironmentState, sun_sample_dir: jax.Array) -> jax.Array:
    """Radiance returned by the SingleLightSource miss program
    (= flat color * skylight, inverse-gamma'd). Ref Environment.cuh:168-170."""
    color = jnp.broadcast_to(env.color * env.skylight_intensity, sun_sample_dir.shape)
    color = jnp.power(jnp.maximum(color, 0.0), 1.0 / env.gamma)
    return jnp.maximum(color, 0.0)
