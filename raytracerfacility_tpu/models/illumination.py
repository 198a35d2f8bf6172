"""Per-triangle illumination estimation (the __raygen__IE launch type).

Ports the reference's light-probe workload end to end:

* probe prep (one ``IlluminationSampler`` per world-space triangle with
  front/back flags and Heron's-formula area,
  ref TriangleIlluminationEstimator.cpp:94-140, RayTracer.hpp:187-211)
* the device estimator (per probe: uniform barycentric point + uniform
  hemisphere direction per sample, front then back face, full path trace,
  cosine-weighted energy mean + dominant direction,
  ref ptx/IlluminationEstimation.cu:30-129)
* flux aggregation + vertex-color bake
  (ref TriangleIlluminationEstimator.cpp:8-48, 84-92)

Wavefront mapping: the (probe, face, sample) triple is flattened into one
SoA ray pool traced through the shared segment loop, then energies reduce
back over the sample axis with one segment-sum — the TPU version of the
per-probe sequential sample loops. RNG deviation from the reference: each
(probe, face, sample) ray gets its own TEA-hashed stream instead of one
sequential stream per probe (a sequential stream cannot be replayed in a
wavefront engine because path length varies); the distributions match.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from raytracerfacility_tpu.models.pathtracer import RenderConfig, trace_radiance
from raytracerfacility_tpu.ops.environment import EnvironmentState
from raytracerfacility_tpu.ops.math3d import sample_hemisphere
from raytracerfacility_tpu.ops.rng import lcg_init, lcg_next
from raytracerfacility_tpu.scene.compiled import CompiledScene


@struct.dataclass
class LightProbes:
    """SoA ``IlluminationSampler`` array (ref RayTracer.hpp:187-211)."""

    a_position: jax.Array  # (P, 3)
    b_position: jax.Array
    c_position: jax.Array
    a_normal: jax.Array  # (P, 3)
    b_normal: jax.Array
    c_normal: jax.Array
    front_face: jax.Array  # (P,) bool
    back_face: jax.Array  # (P,) bool
    # outputs
    energy: jax.Array  # (P, 3)
    direction: jax.Array  # (P, 3)

    @property
    def num_probes(self) -> int:
        return self.a_position.shape[0]

    def areas(self) -> jax.Array:
        """Heron's formula (ref RayTracer.hpp:204-210)."""
        a = jnp.linalg.norm(self.a_position - self.b_position, axis=-1)
        b = jnp.linalg.norm(self.b_position - self.c_position, axis=-1)
        c = jnp.linalg.norm(self.c_position - self.a_position, axis=-1)
        p = (a + b + c) * 0.5
        return jnp.sqrt(jnp.maximum(p * (p - a) * (p - b) * (p - c), 0.0))


def probes_from_mesh(
    mesh, transform: np.ndarray, front_face: bool = True, back_face: bool = True
) -> LightProbes:
    """One probe per triangle of a mesh under a world transform
    (ref TriangleIlluminationEstimator.cpp:107-137). Front/back flags follow
    the material cull mode in the reference; callers pass them explicitly."""
    tm = np.asarray(transform, np.float32)
    pos = mesh.positions @ tm[:3, :3].T + tm[:3, 3]
    nrm = mesh.normals @ tm[:3, :3].T
    t = mesh.triangles
    p = t.shape[0]
    return LightProbes(
        a_position=jnp.asarray(pos[t[:, 0]]),
        b_position=jnp.asarray(pos[t[:, 1]]),
        c_position=jnp.asarray(pos[t[:, 2]]),
        a_normal=jnp.asarray(nrm[t[:, 0]]),
        b_normal=jnp.asarray(nrm[t[:, 1]]),
        c_normal=jnp.asarray(nrm[t[:, 2]]),
        front_face=jnp.full(p, front_face),
        back_face=jnp.full(p, back_face),
        energy=jnp.zeros((p, 3), jnp.float32),
        direction=jnp.zeros((p, 3), jnp.float32),
    )


def concat_probes(groups: list[LightProbes]) -> LightProbes:
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *groups)


def estimate_illumination(
    scene: CompiledScene,
    env: EnvironmentState,
    config: RenderConfig,
    probes: LightProbes,
    seed: int = 0,
    push_normal_distance: float = 0.001,
    probe_offset=0,
) -> LightProbes:
    """The __raygen__IE equivalent (ref ptx/IlluminationEstimation.cu:30-129).

    Returns probes with ``energy`` (mean of E * |N.L| over all traced
    samples) and ``direction`` (energy-magnitude-weighted mean ray
    direction, normalized) filled in. ``probe_offset`` biases the RNG
    stream index (the probe's GLOBAL index under probe-axis sharding, so
    a sharded estimate is bit-identical to the single-device one).
    """
    p = probes.num_probes
    s = config.samples
    # ray pool: (P, 2 faces, S samples)
    probe_idx = (jnp.arange(p, dtype=jnp.uint32)[:, None, None]
                 + jnp.asarray(probe_offset, jnp.uint32))
    face_idx = jnp.arange(2, dtype=jnp.uint32)[None, :, None]
    sample_idx = jnp.arange(s, dtype=jnp.uint32)[None, None, :]
    ray_id = probe_idx * (2 * s) + face_idx * s + sample_idx
    # seed is a DYNAMIC value: re-estimating with a new seed (the normal
    # usage pattern) must not recompile
    rng = lcg_init(ray_id, jnp.asarray(seed, jnp.uint32))

    # uniform barycentric coords — NOT folded into the triangle, exactly like
    # the reference (IlluminationEstimation.cu:56-60 draws two raw uniforms)
    rng, ca = lcg_next(rng)
    rng, cb = lcg_next(rng)
    w = (1.0 - ca - cb)[..., None]
    position = (
        w * probes.a_position[:, None, None]
        + ca[..., None] * probes.b_position[:, None, None]
        + cb[..., None] * probes.c_position[:, None, None]
    )
    normal = (
        w * probes.a_normal[:, None, None]
        + ca[..., None] * probes.b_normal[:, None, None]
        + cb[..., None] * probes.c_normal[:, None, None]
    )
    # face 0 = front (+normal), face 1 = back (-normal)
    sign = jnp.where(face_idx == 0, 1.0, -1.0)[..., None]
    normal = normal * sign

    rng, ray_dir = sample_hemisphere(rng, normal)  # uniform variant
    origin = position + normal * push_normal_distance

    from raytracerfacility_tpu.models.pathtracer import (
        fused_compatible,
        sorted_env_compatible,
    )

    env_xla = sorted_env_compatible(scene, env, config)
    if ((fused_compatible(scene, env, config) or env_xla)
            and scene.fused is not None):
        # probe rays ride the fused mega-kernel (ops/pallas_fused.py):
        # same per-ray RNG stream and segment semantics as the wavefront
        # engine, one kernel execution for the whole probe pool
        from raytracerfacility_tpu.enums import EnvironmentalLightingType
        from raytracerfacility_tpu.ops.pallas_fused import render_pool_fused

        n_rays = p * 2 * s
        flat_rgb = jnp.maximum(
            jnp.power(jnp.maximum(env.color * env.skylight_intensity, 0.0),
                      1.0 / env.gamma), 0.0).astype(jnp.float32)
        sls = (config.lighting_type
               == EnvironmentalLightingType.SINGLE_LIGHT_SOURCE)
        env_vec = jnp.zeros((16,), jnp.float32)
        env_vec = env_vec.at[0:3].set(flat_rgb)
        env_vec = env_vec.at[3:6].set(env.color * env.ambient_light_intensity)
        env_vec = env_vec.at[6:9].set(env.sun_direction)
        env_vec = env_vec.at[9].set(1.0 - env.light_size)
        env_vec = env_vec.at[10].set(1e-3)  # probe-ray tmin (matches XLA)
        from raytracerfacility_tpu.ops.pallas_seg import (
            render_pool_sorted,
            sorted_dispatch,
        )

        chunk = scene.fused_chunk or None
        if not sls and (env_xla
                        or sorted_dispatch(
                            scene.fused, incoherent=True,
                            **({"chunk": chunk} if chunk else {}))):
            # probe rays are incoherent from segment 0 (uniform hemisphere
            # directions off scattered triangles): the segmented engine
            # presorts them by (origin cell, octant) so the trace kernel's
            # tile culling works — measured 5.3x coherent-vs-random gap on
            # the 111k-tri canopy (PERF.md). Cubemap/Nishita environments
            # ride the same engine via its per-segment XLA miss hook.
            radiance, _, _, _, _ = render_pool_sorted(
                scene.fused,
                origin.reshape(n_rays, 3),
                ray_dir.reshape(n_rays, 3),
                rng.reshape(n_rays),
                jnp.ones((n_rays,), jnp.float32),
                env_vec,
                bounces=config.bounces,
                presort=True,
                env_state=env if env_xla else None,
                lighting_type=int(config.lighting_type),
                atmos_samples=config.atmosphere_samples,
                atmos_samples_light=config.atmosphere_samples_light,
                **({"chunk": chunk} if chunk else {}),
            )
        else:
            radiance, _, _, _, _ = render_pool_fused(
                scene.fused,
                origin.reshape(n_rays, 3),
                ray_dir.reshape(n_rays, 3),
                rng.reshape(n_rays),
                jnp.ones((n_rays,), jnp.float32),
                env_vec,
                bounces=config.bounces,
                lighting=1 if sls else 0,
                **({"chunk": chunk} if chunk else {}),
            )
        path_radiance = radiance.reshape(p, 2, s, 3)
    else:
        path = trace_radiance(
            scene, env, config, origin, ray_dir, rng, jnp.float32(1e-3)
        )
        path_radiance = path.radiance

    ndotl = jnp.abs(jnp.sum(normal * ray_dir, axis=-1, keepdims=True))
    sample_energy = path_radiance * ndotl  # (P, 2, S, 3)
    # face masking per probe flags
    face_on = jnp.stack([probes.front_face, probes.back_face], axis=1)  # (P, 2)
    sample_energy = jnp.where(face_on[..., None, None], sample_energy, 0.0)
    weighted_dir = ray_dir * jnp.linalg.norm(sample_energy, axis=-1, keepdims=True)
    weighted_dir = jnp.where(face_on[..., None, None], weighted_dir, 0.0)

    sample_count = jnp.sum(face_on, axis=1) * s  # (P,)
    total_energy = jnp.sum(sample_energy, axis=(1, 2))  # (P, 3)
    total_dir = jnp.sum(weighted_dir, axis=(1, 2))  # (P, 3)

    denom = jnp.maximum(sample_count, 1)[:, None].astype(jnp.float32)
    energy = jnp.where(
        (sample_count > 0)[:, None], total_energy / denom, probes.energy
    )
    norm = jnp.linalg.norm(total_dir, axis=-1, keepdims=True)
    direction = jnp.where(
        (sample_count > 0)[:, None] & (norm > 0),
        total_dir / jnp.maximum(norm, 1e-20),
        probes.direction,
    )
    return probes.replace(energy=energy, direction=direction)


# engine-selection env knobs are read at trace time, so they ride in the
# jit cache key (see pathtracer._knob_key for the vacuous-test bug this
# prevents)
_estimate_illumination_knobbed = jax.jit(
    lambda knobs, scene, env, config, probes, seed, push_normal_distance:
    estimate_illumination(scene, env, config, probes, seed,
                          push_normal_distance),
    static_argnums=(0, 3, 6))


def estimate_illumination_jit(scene, env, config, probes, seed,
                              push_normal_distance=1e-3):
    from raytracerfacility_tpu.models.pathtracer import _knob_key

    return _estimate_illumination_knobbed(_knob_key(), scene, env, config,
                                          probes, seed, push_normal_distance)

# one fused device reduction (eager per-op dispatch is ~1.5 ms on the
# benchmark runtime, and Heron's formula alone is ~8 ops)
_total_flux_jit = jax.jit(
    lambda probes: jnp.sum(probes.energy * probes.areas()[:, None], axis=0))


@dataclasses.dataclass
class LightProbeGroup:
    """Thin bridge from a probe buffer to the estimator launch
    (ref LightProbeGroup.cpp:8-15; binary list persistence helpers
    LightProbeGroup.hpp:16-32 map to numpy save/load here)."""

    light_probes: LightProbes | None = None

    def calculate_illumination(self, scene, env, config, seed=0,
                               push_normal_distance=0.001):
        assert self.light_probes is not None
        self.light_probes = estimate_illumination_jit(
            scene, env, config, self.light_probes, seed, push_normal_distance
        )
        return self.light_probes

    def save(self, path: str) -> None:
        import numpy as np

        assert self.light_probes is not None
        np.savez(path, **{
            k: np.asarray(getattr(self.light_probes, k))
            for k in ("a_position", "b_position", "c_position", "a_normal",
                      "b_normal", "c_normal", "front_face", "back_face",
                      "energy", "direction")
        })

    @classmethod
    def load(cls, path: str) -> "LightProbeGroup":
        import jax.numpy as jnp
        import numpy as np

        z = np.load(path)
        return cls(light_probes=LightProbes(
            **{k: jnp.asarray(z[k]) for k in z.files}
        ))


@dataclasses.dataclass
class TriangleIlluminationEstimator:
    """Host front-end mirroring the reference component
    (ref TriangleIlluminationEstimator.cpp): prepare probes over meshes,
    sample, aggregate flux, bake vertex colors."""

    total_area: float = 0.0
    total_flux: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3, np.float32)
    )
    average_flux: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3, np.float32)
    )
    probes: LightProbes | None = None
    _mesh_list: list = dataclasses.field(default_factory=list)

    def prepare_light_probe_group(
        self, meshes_with_transforms: list[tuple]
    ) -> LightProbes:
        """``meshes_with_transforms``: [(mesh, 4x4 transform)] or
        [(mesh, transform, front_face, back_face)].
        Ref TriangleIlluminationEstimator.cpp:94-140."""
        groups = []
        total_area = 0.0
        self._mesh_list = []
        for item in meshes_with_transforms:
            mesh, transform = item[0], item[1]
            front = item[2] if len(item) > 2 else True
            back = item[3] if len(item) > 3 else True
            g = probes_from_mesh(mesh, transform, front, back)
            area = float(jnp.sum(g.areas()))
            total_area += area * (int(front) + int(back))
            groups.append(g)
            self._mesh_list.append(mesh)
        self.total_area = total_area
        self.probes = concat_probes(groups)
        return self.probes

    def sample_light_probe_group(
        self,
        scene: CompiledScene,
        env: EnvironmentState,
        config: RenderConfig,
        seed: int = 0,
        push_normal_distance: float = 0.001,
    ) -> LightProbes:
        """Ref TriangleIlluminationEstimator.cpp:84-92."""
        assert self.probes is not None, "prepare_light_probe_group first"
        self.probes = estimate_illumination_jit(
            scene, env, config, self.probes, seed, push_normal_distance
        )
        from raytracerfacility_tpu.utils.validation import check_finite

        check_finite("EstimateIllumination", energy=self.probes.energy,
                     direction=self.probes.direction)
        # flux aggregation ON DEVICE (ref sums per-probe flux host-side,
        # TriangleIlluminationEstimator.cpp:84-92, where the buffer is
        # already local): pulling the (P,3) energy + (P,) area buffers
        # through the tunneled runtime cost ~150 ms of a 740 ms canopy
        # estimate; the reduced (3,) flux is a 12-byte transfer
        self.total_flux = np.asarray(_total_flux_jit(self.probes))
        self.average_flux = (
            self.total_flux / self.total_area if self.total_area > 0 else
            np.zeros(3, np.float32)
        )
        return self.probes

    def color_descendents_vertices(self) -> list[np.ndarray]:
        """Bake probe energies back into per-vertex colors by averaging the
        energies of each vertex's incident triangles
        (ref TriangleIlluminationEstimator.cpp:8-48). Returns one (N, 4)
        color array per prepared mesh and writes it into ``mesh.colors``."""
        assert self.probes is not None
        energies = np.asarray(self.probes.energy)
        out = []
        offset = 0
        for mesh in self._mesh_list:
            t = mesh.triangles
            count = np.zeros(mesh.num_vertices, np.int64)
            accum = np.zeros((mesh.num_vertices, 4), np.float32)
            probe_col = np.concatenate(
                [energies[offset : offset + t.shape[0]],
                 np.ones((t.shape[0], 1), np.float32)],
                axis=-1,
            )
            for corner in range(3):
                np.add.at(count, t[:, corner], 1)
                np.add.at(accum, t[:, corner], probe_col)
            colors = accum / np.maximum(count, 1)[:, None]
            mesh.colors = colors.astype(np.float32)
            out.append(mesh.colors)
            offset += t.shape[0]
        return out
