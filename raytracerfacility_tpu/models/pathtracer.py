"""Wavefront Monte-Carlo path tracer: the camera-render launch type.

TPU re-architecture of the reference's recursive OptiX pipeline
(ref ptx/CameraRendering.cu + RayFunctions.cuh): the per-ray *recursive*
``optixTrace`` chain (closest-hit calls optixTrace for the next bounce,
RayFunctions.cuh:136-151) becomes an *iterative* ``lax.scan`` over path
segments carrying SoA ray state. The bottom-up energy recurrence

    E_k = emission_k * albedo_k + weight_k * E_{k+1}
    weight_k = (1 - ssFactor) * albedo_k
               * clamp(|N.L| * roughness + (1-roughness) * f, 0, 1)

(ref RayFunctions.cuh:152-171) is carried top-down as
``radiance += throughput * emission_k * albedo_k; throughput *= weight_k``,
which is algebraically identical, so equal-spp images converge to the
reference's.

Mode semantics preserved:
* Scene/Skydome: BRDF continuation up to ``bounces`` accepted hits; a hit at
  depth ``bounces + 1`` contributes emission only (ref :93-95,168-171); a
  miss adds environment radiance (ref MissFunc :260-272).
* SingleLightSource: ambient + one sun-cone NEE shadow ray, no continuation
  (ref :61-92).
* Stochastic alpha cutout (ref AnyHitFunc :5-23) runs as shade-time
  rejection: a rejected hit re-traces the same ray with tmin just past the
  hit, consuming an extra path segment but no bounce.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
from flax import struct

from raytracerfacility_tpu.enums import (
    EnvironmentalLightingType,
    MaterialType,
    OutputType,
)
from raytracerfacility_tpu.ops.camera import CameraState, generate_camera_rays
from raytracerfacility_tpu.ops.environment import (
    EnvironmentState,
    calculate_environmental_light,
)
from raytracerfacility_tpu.ops.intersect import (
    TraceResult,
    trace_any_bruteforce,
    trace_closest_bruteforce,
)
from raytracerfacility_tpu.ops.math3d import dot
from raytracerfacility_tpu.ops.rng import lcg_init, lcg_next
from raytracerfacility_tpu.ops.shading import (
    brdf_weight,
    eval_material,
    interpolate_hit,
    sample_brdf,
)
from raytracerfacility_tpu.scene.compiled import CompiledScene

# plain Python floats: module-level jnp scalars are device constants that
# poison jitted closures (see ops/rng.py note)
_TMAX = 1e20
_BOUNCE_TMIN = 1e-3
_ALPHA_SKIP_EPS = 1e-4
# poisoned trace window for lanes whose result is masked out anyway
# (matches the fused kernels' dead-lane sentinel, ops/pallas_brute._DEAD)
_DEAD_TMAX = -3.0e38


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static (compile-time) render configuration.

    Mirrors ``RayProperties`` / launch statics (ref RayTracer.hpp:153-163):
    defaults bounces=4, samples=1.
    """

    width: int = 512
    height: int = 512
    bounces: int = 4
    samples: int = 1
    lighting_type: EnvironmentalLightingType = EnvironmentalLightingType.SCENE
    output_type: OutputType = OutputType.COLOR
    accumulate: bool = True
    alpha_test: bool = False
    alpha_segments: int = 0  # extra path segments for cutout continuation
    atmosphere_samples: int = 16
    atmosphere_samples_light: int = 8
    enable_btf: bool = False
    enable_subsurface: bool = False
    # static shading specialization (the SBT-program-specialization
    # equivalent): elide texture fetches / vertex-attr gathers for scenes
    # that bind none (renderer facade sets these from the material table)
    enable_textures: bool = True
    enable_vertex_color: bool = True
    # fold spp into the lane dimension instead of a sequential scan (one
    # big ray pool per frame; the throughput mode for per-op-bound
    # runtimes). Also the opt-in for multi-spp frames to use the fused
    # Pallas mega-kernel, which only supports this layout: per-sample RNG
    # streams are TEA-decorrelated rather than the reference's sequential
    # per-pixel stream (distributions match; see tests/test_spp_equivalence)
    samples_in_lanes: bool = False

    @property
    def max_segments(self) -> int:
        if self.lighting_type == EnvironmentalLightingType.SINGLE_LIGHT_SOURCE:
            return 1 + self.alpha_segments
        return self.bounces + 1 + self.alpha_segments


def trace_closest(scene: CompiledScene, origin, direction, tmin, tmax,
                  coherent: bool = False) -> TraceResult:
    """Traversal dispatch: Pallas mega-kernel when packed (one
    op-execution for the whole trace; ops/pallas_brute.py), else LBVH when
    built, else the brute-force oracle. ``coherent`` marks pools whose
    NATURAL order is already tile-coherent (LiDAR's rotated scan grid):
    the octant+Morton sort would scatter that order — measured 0.74 vs
    0.65 s on the 250k-beam config-5 sweep — so such pools skip it."""
    if scene.pallas_tris is not None:
        import math as _math

        from raytracerfacility_tpu.ops.pallas_brute import trace_closest_pallas
        from raytracerfacility_tpu.ops.pallas_seg import (
            sorted_trace_dispatch,
            trace_closest_sorted,
        )

        if not coherent and sorted_trace_dispatch(
                _math.prod(origin.shape[:-1])):
            return trace_closest_sorted(
                scene.pallas_tris, origin, direction, tmin, tmax)
        return trace_closest_pallas(scene.pallas_tris, origin, direction, tmin, tmax)
    if scene.bvh is not None:
        from raytracerfacility_tpu.ops.traverse import trace_closest_bvh

        return trace_closest_bvh(scene.bvh, scene.geometry, origin, direction, tmin, tmax)
    g = scene.geometry
    return trace_closest_bruteforce(
        g.v0, g.e1, g.e2, origin, direction, tmin, tmax,
        kind=g.kind if g.has_curves else None,
    )


def trace_any(scene: CompiledScene, origin, direction, tmin, tmax) -> jax.Array:
    if scene.pallas_tris is not None:
        from raytracerfacility_tpu.ops.pallas_brute import trace_any_pallas

        return trace_any_pallas(scene.pallas_tris, origin, direction, tmin, tmax)
    if scene.bvh is not None:
        from raytracerfacility_tpu.ops.traverse import trace_any_bvh

        return trace_any_bvh(scene.bvh, scene.geometry, origin, direction, tmin, tmax)
    g = scene.geometry
    return trace_any_bruteforce(g.v0, g.e1, g.e2, origin, direction, tmin, tmax)


@struct.dataclass
class PathState:
    """SoA carry for the segment loop (replaces PerRayData + the payload
    pointer packing, ref RayTracerUtilities.cuh:26-52)."""

    origin: jax.Array  # (R, 3)
    direction: jax.Array  # (R, 3)
    tmin: jax.Array  # (R,)
    rng: jax.Array  # (R,) uint32
    throughput: jax.Array  # (R, 3)
    radiance: jax.Array  # (R, 3)
    hit_count: jax.Array  # (R,) int32 accepted hits so far
    active: jax.Array  # (R,) bool
    first_normal: jax.Array  # (R, 3)
    first_albedo: jax.Array  # (R, 3)
    first_position: jax.Array  # (R, 3)


def init_path_state(origin, direction, rng, tmin) -> PathState:
    shape = origin.shape[:-1]
    return PathState(
        origin=origin,
        direction=direction,
        tmin=jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), shape),
        rng=rng,
        throughput=jnp.ones(shape + (3,), jnp.float32),
        radiance=jnp.zeros(shape + (3,), jnp.float32),
        hit_count=jnp.zeros(shape, jnp.int32),
        active=jnp.ones(shape, bool),
        first_normal=jnp.zeros(shape + (3,), jnp.float32),
        first_albedo=jnp.zeros(shape + (3,), jnp.float32),
        # ref CameraRendering.cu:48 sentinel for "no hit"
        first_position=jnp.full(shape + (3,), 999999.0, jnp.float32),
    )


# Bucketed BTF decode (RTF_BTF_BUCKET=0 restores the dense path): the
# MLVQ decode chain runs on EVERY lane when evaluated densely — on a
# miss the clamped hit record still points at a (possibly BTF) triangle,
# so even fully-missed segments pay the full PDF-chain gather cost
# (scripts/probe_btf_scan.py: the decode is 96 ms of a 252 ms 8-frame
# 256^2 scan, ~38%). Decode lanes are compacted to a prefix with one
# multi-operand lax.sort and the decode + tangent-space angle math run
# only on the smallest static bucket (R, R/2, ... R/16) covering the
# decode-lane count — the same liveness-bucket trick as the segmented
# engine's reorder (ops/pallas_seg.py).
_BTF_BUCKET = os.environ.get("RTF_BTF_BUCKET", "1") == "1"


def _btf_colors(scene, mask, btf_index, tex_coord, view_dir, illum_dir,
                normal, tangent):
    """Per-lane BTF color (ones on non-``mask`` lanes).

    Vectorizes the hit shader's BTF branch (ref RayFunctions.cuh:173-257
    via SurfaceCompressedBTF::GetValue, RayDataDefinations.hpp:326-351;
    the /256 post-scale at :347). ``mask`` is ``is_btf & accepted`` —
    every downstream consumer of the color is masked by ``accepted``, so
    skipping the decode on rejected/missed lanes is output-equivalent.
    The decode is lanewise, but XLA codegen (FMA contraction,
    vectorization) depends on the window's batch shape and layout, so
    decoded lanes match the dense path to ULP level — except rare lanes
    whose angle/texel sits within a ULP of a table-cell boundary, which
    land in the neighboring cell (<1%, tests/test_btf_bucketed.py).
    """
    from raytracerfacility_tpu.mlvq.btf import btf_get_value, compute_angles

    def decode(m, bidx, uv, vd, il, nrm, tan):
        view_theta, view_phi = compute_angles(vd, nrm, tan)
        illum_theta, illum_phi = compute_angles(il, nrm, tan)
        out = jnp.ones(uv.shape[:-1] + (3,), jnp.float32)
        for k, tbl in enumerate(scene.btf):
            sel = m & (bidx == k)
            val = btf_get_value(
                tbl, uv, illum_theta, illum_phi, view_theta, view_phi
            ) / 256.0
            out = jnp.where(sel[..., None], val, out)
        return out

    if mask.ndim > 1:
        # camera pools are (H, W) / (frames, H, W); the bucketed path is
        # lane-order based, so flatten, decode, un-flatten — compaction
        # semantics are shape-independent
        shape = mask.shape
        flat = _btf_colors(
            scene, mask.reshape(-1), btf_index.reshape(-1),
            tex_coord.reshape(-1, 2), view_dir.reshape(-1, 3),
            illum_dir.reshape(-1, 3), normal.reshape(-1, 3),
            tangent.reshape(-1, 3))
        return flat.reshape(*shape, 3)

    R = mask.shape[0]
    if not (_BTF_BUCKET and R >= 4096 and R % 16 == 0):
        return decode(mask, btf_index, tex_coord, view_dir, illum_dir,
                      normal, tangent)

    key = jnp.where(mask, jnp.int32(0), jnp.int32(1))
    idx = jnp.arange(R, dtype=jnp.int32)
    planes = (key, idx, btf_index.astype(jnp.int32),
              tex_coord[:, 0], tex_coord[:, 1],
              view_dir[:, 0], view_dir[:, 1], view_dir[:, 2],
              illum_dir[:, 0], illum_dir[:, 1], illum_dir[:, 2],
              normal[:, 0], normal[:, 1], normal[:, 2],
              tangent[:, 0], tangent[:, 1], tangent[:, 2])
    srt = jax.lax.sort(planes, num_keys=1)
    key_s, idx_s, bidx_s = srt[0], srt[1], srt[2]
    uv_s = jnp.stack(srt[3:5], axis=-1)
    vd_s = jnp.stack(srt[5:8], axis=-1)
    il_s = jnp.stack(srt[8:11], axis=-1)
    n_s = jnp.stack(srt[11:14], axis=-1)
    t_s = jnp.stack(srt[14:17], axis=-1)
    n_decode = jnp.sum(mask.astype(jnp.int32))

    def window(w):
        def f(_):
            val = decode(key_s[:w] == 0, bidx_s[:w], uv_s[:w], vd_s[:w],
                         il_s[:w], n_s[:w], t_s[:w])
            if w == R:
                return val
            return jnp.concatenate(
                [val, jnp.ones((R - w, 3), jnp.float32)])
        return f

    val_s = jax.lax.cond(
        n_decode <= R // 16, window(R // 16),
        lambda o: jax.lax.cond(
            n_decode <= R // 8, window(R // 8),
            lambda o2: jax.lax.cond(
                n_decode <= R // 4, window(R // 4),
                lambda o3: jax.lax.cond(
                    n_decode <= R // 2, window(R // 2),
                    window(R), o3),
                o2),
            o),
        0)

    # unsort via a second sort keyed on the original lane index (the
    # scatter alternative measured ~4x a multi-operand sort's cost in the
    # segment-reorder work, PERF.md); idx is a permutation, so this
    # restores original order exactly regardless of sort stability
    _, r, g, b = jax.lax.sort(
        (idx_s, val_s[:, 0], val_s[:, 1], val_s[:, 2]), num_keys=1)
    return jnp.stack([r, g, b], axis=-1)


def _segment(
    scene: CompiledScene,
    env: EnvironmentState,
    config: RenderConfig,
    s: PathState,
    res: TraceResult | None = None,
) -> PathState:
    """One path segment: trace + shade + continue/terminate. ``res``
    supplies a precomputed closest-hit result (the sorted-state engine
    traces its own liveness window and shades through this same code so
    feature shading — textures, vertex color, alpha, BTF, curves — stays
    one implementation)."""
    if res is None:
        # terminated lanes trace with a poisoned window (tmax = -3e38):
        # every slab test culls them, they drop out of the per-tile
        # chunk-cull bundles (ops/chunk_order.py), and tiles whose lanes
        # all terminated skip every chunk window outright —
        # compaction-lite without moving any ray state
        res = trace_closest(scene, s.origin, s.direction, s.tmin,
                            jnp.where(s.active, _TMAX, _DEAD_TMAX))
    where = jnp.where

    # ---- miss: environment radiance (ref MissFunc, RayFunctions.cuh:260-272)
    env_light = calculate_environmental_light(
        s.origin,
        s.direction,
        env,
        config.lighting_type,
        config.atmosphere_samples,
        config.atmosphere_samples_light,
    )
    miss = s.active & ~res.hit
    radiance = where(miss[..., None], s.radiance + s.throughput * env_light, s.radiance)
    # primary-miss albedo AOV (ref MissFunc writes m_albedo; never overwritten
    # when there was no first hit)
    primary_miss = miss & (s.hit_count == 0)
    first_albedo = where(primary_miss[..., None], env_light, s.first_albedo)

    # ---- hit: interpolate + evaluate material
    hit_mask = s.active & res.hit
    hit = interpolate_hit(
        scene, res.prim, res.u, res.v, s.direction,
        origin=s.origin, t_hit=res.t,
        with_tangent=config.enable_textures or config.enable_btf,
        with_vertex_attrs=config.enable_vertex_color,
    )
    surf = eval_material(scene, hit, enable_textures=config.enable_textures)

    # ---- stochastic alpha cutout (ref AnyHitFunc, RayFunctions.cuh:5-23):
    # only MaterialType::Default is tested.
    rng = s.rng
    if config.alpha_test:
        rng_a, u_alpha = lcg_next(rng)
        testable = hit_mask & (surf.material_type == MaterialType.DEFAULT)
        rng = where(testable, rng_a, rng)
        rejected = testable & (surf.alpha <= u_alpha)
    else:
        rejected = jnp.zeros_like(hit_mask)
    accepted = hit_mask & ~rejected

    new_hit_count = where(accepted, s.hit_count + 1, s.hit_count)

    # ---- BTF material detection (ref RayFunctions.cuh:173-257 branch)
    use_btf = config.enable_btf and scene.btf
    if use_btf:
        is_btf = surf.material_type == MaterialType.COMPRESSED_BTF
    else:
        is_btf = jnp.zeros_like(accepted)

    sls = config.lighting_type == EnvironmentalLightingType.SINGLE_LIGHT_SOURCE
    if sls:
        # ---- ambient + sun-cone NEE, no continuation (ref :61-92)
        from raytracerfacility_tpu.ops.math3d import sample_hemisphere

        rng_s, sun_dir = sample_hemisphere(
            rng, jnp.broadcast_to(env.sun_direction, s.direction.shape),
            1.0 - env.light_size,
        )
        rng = where(accepted, rng_s, rng)
        illum_dir = sun_dir
    else:
        # ---- BRDF importance sample (ref BSDF.cuh:6-13); BTF materials
        # sample the full hemisphere around the reflection (alpha = 0,
        # ref RayFunctions.cuh:221)
        cone = where(is_btf, 0.0, surf.metallic)
        rng_b, new_dir = sample_brdf(
            rng, s.direction, surf.shading_normal, cone
        )
        illum_dir = new_dir

    # ---- BTF color lookup (ref SurfaceCompressedBTF::GetValue,
    # RayDataDefinations.hpp:326-351; out /= 256 at :347). Uses the
    # geometric normal/tangent (BTF materials skip normal mapping).
    if use_btf:
        btf_color = _btf_colors(
            scene, is_btf & accepted, surf.btf_index, hit.tex_coord,
            -s.direction, illum_dir, hit.normal, hit.tangent)
    else:
        btf_color = jnp.ones_like(surf.albedo)

    # ---- first-hit AOVs (ref RayFunctions.cuh:163-167, 251-255: written
    # when hitCount == 1; albedo = btfColor for BTF materials)
    first = accepted & (s.hit_count == 0)
    fm = first[..., None]
    aov_albedo = where(is_btf[..., None], btf_color, surf.albedo)
    first_normal = where(fm, surf.shading_normal, s.first_normal)
    first_albedo = where(fm, aov_albedo, first_albedo)
    first_position = where(fm, hit.position, s.first_position)

    # ---- emission (ref RayFunctions.cuh:168-171; the BTF branch adds no
    # emission term, ref :256)
    radiance = where(
        (accepted & ~is_btf)[..., None],
        radiance + s.throughput * surf.emission[..., None] * surf.albedo,
        radiance,
    )

    if sls:
        base_color = where(is_btf[..., None], btf_color, surf.albedo)
        ambient = env.color * env.ambient_light_intensity * base_color
        radiance = where(
            accepted[..., None], radiance + s.throughput * ambient, radiance
        )
        ndotl = dot(surf.shading_normal, sun_dir, keepdims=False)
        do_nee = accepted & (ndotl > 0.0)
        # lanes with no NEE to resolve trace with a poisoned window (see
        # trace_closest above): occlusion-query tiles cull to the lanes
        # that actually need the shadow ray
        occluded = trace_any(scene, hit.position, sun_dir, _BOUNCE_TMIN,
                             where(do_nee, _TMAX, _DEAD_TMAX))
        sun_radiance = calculate_environmental_light(
            hit.position, sun_dir, env, config.lighting_type
        )
        contrib = s.throughput * sun_radiance * ndotl[..., None] * base_color
        radiance = where(
            (do_nee & ~occluded)[..., None], radiance + contrib, radiance
        )
        # SingleLightSource paths terminate at the first accepted hit
        cont = jnp.zeros_like(accepted)
        new_origin = s.origin
        new_direction = s.direction
        new_throughput = s.throughput
        new_tmin = s.tmin
    else:
        # ---- continuation (ref :134-161); a hit past the bounce budget
        # keeps only its emission (ref :93-95 guard). BTF lanes weight by
        # the BTF lookup alone (ref :247) and push the origin off the
        # surface (ref :227-228).
        cont = accepted & (new_hit_count <= config.bounces)
        rng = where(cont, rng_b, rng)
        weight = brdf_weight(
            surf.shading_normal, new_dir, surf.roughness, surf.metallic
        )
        # ---- BSSRDF (ref BSSDF.cuh:45-89 + RayFunctions.cuh:96-133).
        # The reference splits the first hit deterministically into a
        # subsurface child (weight ssFactor) AND a BRDF child (weight
        # 1 - ssFactor). A wavefront engine cannot fork lanes, so the split
        # is sampled stochastically with probability ssFactor — an unbiased
        # estimator of the same sum (both branch weights drop their
        # selection factors).
        ss_factor_term = 1.0 - surf.subsurface_factor[..., None]
        ss_chosen = jnp.zeros_like(accepted)
        ss_valid = jnp.zeros_like(accepted)
        if config.enable_subsurface:
            from raytracerfacility_tpu.ops.math3d import rotate_about_axis
            from raytracerfacility_tpu.ops.traverse import (
                trace_collect_same_instance,
            )

            assert scene.bvh is not None, "subsurface requires a built BVH"
            eligible = (
                accepted
                & (s.hit_count == 0)
                & (surf.subsurface_factor > 0.0)
                & (surf.subsurface_radius[..., 0] > 0.0)
                & ~is_btf
            )
            rng_ss, u_sel = lcg_next(rng)
            ss_chosen = eligible & (u_sel < surf.subsurface_factor)
            # both branches drop their selection weight
            ss_factor_term = where(eligible[..., None], 1.0, ss_factor_term)

            # disk sample above the entry point (ref BSSDF.cuh:49-56)
            radius = surf.subsurface_radius[..., 0]
            disk_normal = surf.shading_normal
            rng_ss, u_r = lcg_next(rng_ss)
            rng_ss, u_a = lcg_next(rng_ss)
            disk_radius = radius * jnp.sqrt(u_r)
            dist = jnp.sqrt(jnp.maximum(radius * radius - disk_radius * disk_radius, 0.0))
            swizzled = jnp.stack(
                [disk_normal[..., 1], disk_normal[..., 2], disk_normal[..., 0]],
                axis=-1,
            )
            rim = rotate_about_axis(
                swizzled, disk_normal, 2.0 * jnp.pi * u_a
            )
            disk_center = hit.position + radius[..., None] * disk_normal / 2.0
            sample_pos = disk_center + disk_radius[..., None] * rim

            # probe: collect <=4 same-instance hits (ref BSSDF.cuh:63-76)
            count, rec_t, rec_prim, rec_u, rec_v = trace_collect_same_instance(
                scene.bvh,
                sample_pos,
                -disk_normal,
                dist,
                radius + dist,
                hit.instance,
            )
            rng_ss, u_pick = lcg_next(rng_ss)
            pick = jnp.clip(
                (u_pick * count.astype(jnp.float32)).astype(jnp.int32),
                0,
                jnp.maximum(count - 1, 0),
            )
            take = lambda a: jnp.take_along_axis(a, pick[..., None], axis=-1)[..., 0]
            rec_hit = interpolate_hit(
                scene, take(rec_prim), take(rec_u), take(rec_v),
                -disk_normal, check_normal=False,
                origin=sample_pos, t_hit=take(rec_t),
                with_tangent=config.enable_textures,
                with_vertex_attrs=config.enable_vertex_color,
            )
            rec_surf = eval_material(  # normal mapping only
                scene, rec_hit, enable_textures=config.enable_textures)
            out_normal = rec_surf.shading_normal
            close_enough = (
                jnp.linalg.norm(rec_hit.position - hit.position, axis=-1)
                <= radius
            )
            ss_valid = ss_chosen & (count > 0) & close_enough

            # exit direction: BRDF(-outNormal, outNormal) reflects to the
            # outNormal hemisphere (ref BSSDF.cuh:84)
            rng_ss, ss_dir = sample_brdf(
                rng_ss, -out_normal, out_normal, surf.metallic
            )
            ss_weight = brdf_weight(
                out_normal, ss_dir, surf.roughness, surf.metallic
            )
            ss_throughput = surf.subsurface_color * ss_weight[..., None]
            ss_origin = rec_hit.position + out_normal * 0.01
            rng = where(ss_chosen, rng_ss, rng)

        default_throughput = ss_factor_term * surf.albedo * weight[..., None]
        seg_throughput = where(is_btf[..., None], btf_color, default_throughput)
        bounce_origin = where(
            is_btf[..., None],
            hit.position + hit.normal * 1e-3,
            hit.position,
        )
        bounce_dir = new_dir
        if config.enable_subsurface:
            seg_throughput = where(ss_valid[..., None], ss_throughput, seg_throughput)
            bounce_origin = where(ss_valid[..., None], ss_origin, bounce_origin)
            bounce_dir = where(ss_valid[..., None], ss_dir, bounce_dir)
            # a chosen-but-failed subsurface sample contributes nothing
            cont = cont & ~(ss_chosen & ~ss_valid)

        new_throughput = where(
            cont[..., None], s.throughput * seg_throughput, s.throughput
        )
        new_origin = where(cont[..., None], bounce_origin, s.origin)
        new_direction = where(cont[..., None], bounce_dir, s.direction)
        new_tmin = where(cont, _BOUNCE_TMIN, s.tmin)

    # ---- alpha-rejected lanes continue the same ray past the hit;
    # missed / cut-off / SLS-shaded lanes terminate
    new_tmin = where(rejected, res.t + _ALPHA_SKIP_EPS, new_tmin)
    active = s.active & (rejected | cont)

    return PathState(
        origin=new_origin,
        direction=new_direction,
        tmin=new_tmin,
        rng=rng,
        throughput=new_throughput,
        radiance=radiance,
        hit_count=new_hit_count,
        active=active,
        first_normal=first_normal,
        first_albedo=first_albedo,
        first_position=first_position,
    )


def trace_radiance(
    scene: CompiledScene,
    env: EnvironmentState,
    config: RenderConfig,
    origin: jax.Array,
    direction: jax.Array,
    rng: jax.Array,
    tmin,
) -> PathState:
    """Run the full segment loop for a ray pool; returns the final state
    (radiance = path energy, first_* = AOVs)."""
    state, _ = trace_radiance_counted(
        scene, env, config, origin, direction, rng, tmin
    )
    return state


def sorted_state_dispatch(rays: int, scene: CompiledScene) -> bool:
    """Should the wavefront segment loop keep its PathState SORTED across
    segments (one reorder per segment, windowed trace + shade) instead of
    per-call sort/unsort inside trace_closest? RTF_TPU_SORTED_STATE=1/0
    forces; unset -> auto for pools big enough that the reorder amortizes
    (same threshold as the per-trace sort it replaces)."""
    flag = os.environ.get("RTF_TPU_SORTED_STATE")
    if flag is not None:
        return flag == "1"
    return scene.pallas_tris is not None and rays >= (1 << 15)


def _sorted_state_loop(
    scene: CompiledScene,
    env: EnvironmentState,
    config: RenderConfig,
    state: PathState,
) -> tuple[PathState, jax.Array]:
    """The feature-complete segmented engine: the wavefront PathState stays
    coherence-SORTED and dead-compacted ACROSS segments (one multi-operand
    ``lax.sort`` per segment instead of trace_closest_sorted's sort+unsort
    per trace), each segment traces only the smallest static liveness
    window of the compacted prefix with the streaming Pallas kernel
    (curve-kind dispatch included, ops/pallas_brute.py), and the full XLA
    hit shade — textures, vertex color, alpha cutout, BTF decode, BSSRDF,
    curve normals — runs through :func:`_segment` on that same window.

    This is the per-segment hit-shade hook generalizing the segmented
    Default-material engine (ops/pallas_seg.py) to the reference's whole
    in-pipeline feature set (ref RayFunctions.cuh:5-258): in-kernel trace,
    vectorized XLA shading per segment, windowed to live lanes. Results
    are BIT-IDENTICAL to the unsorted loop: permutations never change a
    ray's own arithmetic, the best-hit record is visit-order independent,
    and the window slices off only lanes whose state cannot change
    (tests/test_fused.py::test_sorted_state_* ).
    """
    import math as _math

    from raytracerfacility_tpu.ops.pallas_brute import _trace
    from raytracerfacility_tpu.ops.pallas_seg import _morton_key

    shape = state.active.shape
    r = _math.prod(shape)
    # flat lane order; pad to a 1024 multiple so the /2 /4 /8 liveness
    # windows stay block-aligned (the trace kernel re-pads internally)
    pad = (-r) % 1024
    rp = r + pad

    def flat(a):
        a = a.reshape((r,) + a.shape[len(shape):])
        if pad:
            a = jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
        return a

    state = jax.tree.map(flat, state)
    state = state.replace(
        direction=state.direction.at[r:, 2].set(1.0) if pad
        else state.direction)
    orig_idx = jnp.arange(rp, dtype=jnp.int32)

    table, sub_aabbs, chunk_aabbs = scene.pallas_tris
    cvalid = chunk_aabbs[:, 0] < 1e37
    big = 3.4e38
    lo = jnp.min(jnp.where(cvalid[:, None], chunk_aabbs[:, 0:3], big), axis=0)
    hi = jnp.max(jnp.where(cvalid[:, None], chunk_aabbs[:, 3:6], -big), axis=0)
    inv_extent = 1.0 / jnp.maximum(hi - lo, 1e-6)
    interpret = jax.default_backend() != "tpu"

    def sort_state(s, idx):
        # ONE multi-operand sort carrying the whole PathState (the cheap
        # reorder of PERF.md round 3: the sort network moves payload rows,
        # a gather does not vectorize); dead lanes key to INT32_MAX and
        # compact to the tail, active recomputes from the sorted key
        key = _morton_key(
            s.origin[:, 0], s.origin[:, 1], s.origin[:, 2],
            s.direction[:, 0], s.direction[:, 1], s.direction[:, 2],
            s.active.astype(jnp.float32), lo, inv_extent)
        f32s = (
            s.origin[:, 0], s.origin[:, 1], s.origin[:, 2],
            s.direction[:, 0], s.direction[:, 1], s.direction[:, 2],
            s.tmin,
            s.throughput[:, 0], s.throughput[:, 1], s.throughput[:, 2],
            s.radiance[:, 0], s.radiance[:, 1], s.radiance[:, 2],
            s.first_normal[:, 0], s.first_normal[:, 1], s.first_normal[:, 2],
            s.first_albedo[:, 0], s.first_albedo[:, 1], s.first_albedo[:, 2],
            s.first_position[:, 0], s.first_position[:, 1],
            s.first_position[:, 2],
        )
        i32s = (jax.lax.bitcast_convert_type(s.rng, jnp.int32),
                s.hit_count, idx)
        outs = jax.lax.sort((key,) + f32s + i32s, num_keys=1)
        k = outs[0]
        v = outs[1:]

        def v3(i):
            return jnp.stack(v[i:i + 3], axis=-1)

        new = PathState(
            origin=v3(0), direction=v3(3), tmin=v[6],
            rng=jax.lax.bitcast_convert_type(v[22], jnp.uint32),
            throughput=v3(7), radiance=v3(10),
            hit_count=v[23],
            active=k != jnp.int32(2147483647),
            first_normal=v3(13), first_albedo=v3(16), first_position=v3(19),
        )
        return new, v[24]

    def seg_window(w):
        """Trace + shade segment on the first ``w`` lanes; identity on the
        dead tail (their state cannot change)."""

        def f(st):
            sub = jax.tree.map(lambda a: a[:w], st)
            t, prim, u, v = _trace(
                table, sub_aabbs, chunk_aabbs, sub.origin, sub.direction,
                sub.tmin,
                jnp.where(sub.active, _TMAX, _DEAD_TMAX),
                interpret=interpret)
            prim_i = prim.astype(jnp.int32)
            res = TraceResult(t=t, prim=prim_i, u=u, v=v, hit=prim_i >= 0)
            out = _segment(scene, env, config, sub, res=res)
            if w == rp:
                return out
            return jax.tree.map(
                lambda a, b: jnp.concatenate([a, b[w:]], axis=0), out, st)
        return f

    def q(x):  # window sizes quantized to the 1024-lane block
        return -(-x // 1024) * 1024

    wts = [rp, min(q(rp // 2), rp), min(q(rp // 4), rp),
           min(q(rp // 8), rp)]

    def run_segment(st, live):
        if rp < 8 * 1024:
            return seg_window(rp)(st)
        return jax.lax.cond(
            live <= float(wts[3]), seg_window(wts[3]),
            lambda o: jax.lax.cond(
                live <= float(wts[2]), seg_window(wts[2]),
                lambda o2: jax.lax.cond(
                    live <= float(wts[1]), seg_window(wts[1]),
                    seg_window(wts[0]), o2),
                o),
            st)

    def cond(carry):
        seg, st, idx, rays = carry
        return (seg < config.max_segments) & jnp.any(st.active)

    def body(carry):
        seg, st, idx, rays = carry
        st, idx = sort_state(st, idx)
        live = jnp.sum(st.active.astype(jnp.float32))
        st = run_segment(st, live)
        return seg + 1, st, idx, rays + live

    _, state, orig_idx, rays = jax.lax.while_loop(
        cond, body, (jnp.int32(0), state, orig_idx, jnp.float32(0.0)))

    # restore original lane order (sort by the carried index IS the
    # inverse permutation; ~4x cheaper than an XLA scatter, PERF.md)
    state, _ = sort_state_by_index(state, orig_idx)
    state = jax.tree.map(
        lambda a: a[:r].reshape(shape + a.shape[1:]), state)
    return state, rays


def sort_state_by_index(s: PathState, idx) -> tuple[PathState, jax.Array]:
    """Permute a flat PathState back to ascending ``idx`` order via one
    multi-operand sort (the unsort step of the sorted-state engine)."""
    f32s = (
        s.origin[:, 0], s.origin[:, 1], s.origin[:, 2],
        s.direction[:, 0], s.direction[:, 1], s.direction[:, 2],
        s.tmin,
        s.throughput[:, 0], s.throughput[:, 1], s.throughput[:, 2],
        s.radiance[:, 0], s.radiance[:, 1], s.radiance[:, 2],
        s.first_normal[:, 0], s.first_normal[:, 1], s.first_normal[:, 2],
        s.first_albedo[:, 0], s.first_albedo[:, 1], s.first_albedo[:, 2],
        s.first_position[:, 0], s.first_position[:, 1],
        s.first_position[:, 2],
    )
    i32s = (jax.lax.bitcast_convert_type(s.rng, jnp.int32), s.hit_count,
            s.active.astype(jnp.int32))
    outs = jax.lax.sort((idx,) + f32s + i32s, num_keys=1)
    v = outs[1:]

    def v3(i):
        return jnp.stack(v[i:i + 3], axis=-1)

    return PathState(
        origin=v3(0), direction=v3(3), tmin=v[6],
        rng=jax.lax.bitcast_convert_type(v[22], jnp.uint32),
        throughput=v3(7), radiance=v3(10),
        hit_count=v[23], active=v[24] > 0,
        first_normal=v3(13), first_albedo=v3(16), first_position=v3(19),
    ), outs[0]


def trace_radiance_counted(
    scene: CompiledScene,
    env: EnvironmentState,
    config: RenderConfig,
    origin: jax.Array,
    direction: jax.Array,
    rng: jax.Array,
    tmin,
) -> tuple[PathState, jax.Array]:
    """Like :func:`trace_radiance` but also returns the number of live rays
    actually traced across all segments (the honest Mrays/s numerator).

    The segment loop is a ``lax.while_loop`` with an any-lane-alive exit:
    unused segments cost nothing, which is what makes the generous alpha
    cutout budget (RenderConfig.alpha_segments = 32 by default from the
    renderer) effectively free — the reference's anyhit can reject
    unboundedly many cutout hits in-traversal (ref RayFunctions.cuh:5-23),
    and a wavefront engine can only match that by having segments to
    spare. Large pools keep their state sorted across segments instead
    (:func:`_sorted_state_loop`)."""
    import math as _math

    state = init_path_state(origin, direction, rng, tmin)
    if sorted_state_dispatch(_math.prod(state.active.shape), scene):
        return _sorted_state_loop(scene, env, config, state)

    def cond(carry):
        seg, state, rays = carry
        return (seg < config.max_segments) & jnp.any(state.active)

    def body(carry):
        seg, state, rays = carry
        rays = rays + jnp.sum(state.active.astype(jnp.float32))
        return seg + 1, _segment(scene, env, config, state), rays

    _, state, rays = jax.lax.while_loop(
        cond, body, (jnp.int32(0), state, jnp.float32(0.0))
    )
    return state, rays


# --------------------------------------------------------------------------
# Fused mega-kernel dispatch (ops/pallas_fused.py)
# --------------------------------------------------------------------------


def fused_compatible(scene: CompiledScene, env: EnvironmentState,
                     config: RenderConfig) -> bool:
    """True when a ray pool can run as the fused Pallas mega-kernel:
    the scene packed fused tables (triangle-only, Default materials, no
    textures/BTF/subsurface) and the render config requests the statically
    specializable feature set. Pool workloads whose RNG streams are
    per-ray by construction (illumination probes, LiDAR) use this check
    directly; camera rendering additionally gates on the spp layout (see
    fused_camera_compatible)."""
    scene_mode = (config.lighting_type == EnvironmentalLightingType.SCENE
                  and env.cubemap is None)
    # SingleLightSource ignores the cubemap entirely (Environment.cuh:168)
    sls_mode = (config.lighting_type
                == EnvironmentalLightingType.SINGLE_LIGHT_SOURCE)
    return (
        scene.fused is not None
        and (scene_mode or sls_mode)
        and not config.alpha_test
        and not config.enable_btf
        and not config.enable_subsurface
    )


def fused_camera_compatible(scene: CompiledScene, env: EnvironmentState,
                            config: RenderConfig) -> bool:
    """fused_compatible plus the camera-path RNG-layout gate: the fused
    kernel always folds spp into lanes (TEA-decorrelated per-sample
    streams), so multi-spp camera renders that did not opt into
    ``samples_in_lanes`` keep the reference's sequential per-pixel stream
    on the wavefront engine."""
    return fused_compatible(scene, env, config) and (
        config.samples == 1 or config.samples_in_lanes
    )


def sorted_env_compatible(scene: CompiledScene, env: EnvironmentState,
                          config: RenderConfig) -> bool:
    """True when the pool can run the SEGMENTED fast path with its
    per-segment XLA miss-environment hook: cubemap Scene or Nishita
    Skydome lighting (which the monolithic fused kernel cannot shade —
    no gather lowering in Mosaic) over the same statically specializable
    hit-shading envelope. The reference runs these environments inside
    its one hot pipeline (Environment.cuh:75-162); this is the TPU-native
    split of the same work: trace + hit shading in-kernel, miss radiance
    as one vectorized XLA step per segment."""
    env_xla = (
        config.lighting_type == EnvironmentalLightingType.SKYDOME
        or (config.lighting_type == EnvironmentalLightingType.SCENE
            and env.cubemap is not None)
    )
    return (
        scene.fused is not None
        and env_xla
        and not config.alpha_test
        and not config.enable_btf
        and not config.enable_subsurface
        and (config.samples == 1 or config.samples_in_lanes)
    )


def _tiled_pixel_coords(height: int, width: int, tile_rays: int):
    """Flat pixel coordinates in TILED order: consecutive ``tile_rays``-ray
    runs cover a square-ish (th, tw) pixel block instead of a raster strip.

    A segmented-engine kernel tile holds ``block_rows * 128`` consecutive
    pool rays; its chunk culling builds a frustum from the tile's origin
    AND direction ranges (ops/chunk_order.py). In raster order a 4096-ray
    tile is ~2 scanlines — its direction x-range spans the full horizontal
    FOV, so segment-0 frusta are nearly the whole view frustum (measured
    6.9/11 chunks visited per tile at 1080p). A 64x64-pixel block's
    direction cone is ~(64/W x 64/H) of the FOV instead. Pure index
    arithmetic on arange — no gather; out-of-image coordinates (from
    rounding H, W up to whole blocks) return valid=0 (dead lanes the
    engine compacts away at the first reorder). The raster layout is
    restored by a reshape/transpose (an XLA tiled copy, not a gather).
    """
    th = 1
    while th * th < tile_rays:
        th *= 2
    tw = tile_rays // th  # 4096 -> 64x64, 2048 -> 64x32
    n_tx = -(-width // tw)
    n_ty = -(-height // th)
    j = jnp.arange(n_ty * n_tx * th * tw, dtype=jnp.int32)
    tile, w_in = j // (th * tw), j % (th * tw)
    ty, tx = tile // n_tx, tile % n_tx
    u, v = w_in // tw, w_in % tw
    py = ty * th + u
    px = tx * tw + v
    valid = ((px < width) & (py < height)).astype(jnp.float32)
    # clamp the dead coordinates so pixel ids / NDC math stay in-range
    pxc = jnp.minimum(px, width - 1)
    pyc = jnp.minimum(py, height - 1)
    pixel_index = (pxc + width * pyc).astype(jnp.uint32)
    return (pxc.astype(jnp.float32), pyc.astype(jnp.float32), pixel_index,
            valid, (n_ty, n_tx, th, tw))


def _untile(a, slots, height, width, tiling):
    """Inverse of the tiled flat order: (slots*N, 3) -> (slots, H, W, 3)."""
    n_ty, n_tx, th, tw = tiling
    a = a.reshape(slots, n_ty, n_tx, th, tw, 3)
    a = jnp.transpose(a, (0, 1, 3, 2, 4, 5))
    return a.reshape(slots, n_ty * th, n_tx * tw, 3)[:, :height, :width]


def tiled_raygen_enabled() -> bool:
    """RTF_TPU_TILED_RAYGEN=1 groups each kernel tile's primaries into a
    square pixel block instead of raster strips. DEFAULT OFF: a same-
    session 2x2 A/B at the 1080p headline measured tiled raygen at -1.2
    Mrays/s (30.2 vs 31.4) despite the tighter primary-segment frusta —
    segment-0 culling already skips most chunks on raster strips, and the
    tiled pool's s>=1 reorders start from a worse permutation (PERF.md
    round-4 ledger). Kept as a knob for non-camera-like pools."""
    return os.environ.get("RTF_TPU_TILED_RAYGEN", "0") == "1"


def _pool_fused_slots(
    scene, camera, env, config, ix, iy_global, pixel_index, seed,
    height, width, slot_count,
):
    """Trace ``slot_count`` x ``height`` x ``width`` camera rays as ONE
    fused/segmented Pallas pool and return the *per-slot* linear
    accumulators (slot, H, W, 3) plus the live-ray count. ``seed`` is the
    (slot, 1, 1) uint32 per-slot RNG seed word — callers decide whether
    slots are spp (decorrelated streams) or progressive frames (the
    reference's per-frame ``Init(pixel, frameId)`` seeds,
    ref ptx/CameraRendering.cu:42-44)."""
    from raytracerfacility_tpu.ops.pallas_fused import render_pool_fused

    sample_count = slot_count
    rng = lcg_init(
        jnp.broadcast_to(pixel_index, (sample_count, height, width)),
        jnp.broadcast_to(seed, (sample_count, height, width)),
    )
    rng, origin, direction = generate_camera_rays(
        camera, rng, ix[None], iy_global[None], width, config.height
    )
    # environment scalar vector: [0:3] pre-gamma'd flat radiance (miss +
    # sun, ref Environment.cuh:158-173), [3:6] raw ambient radiance
    # (ref RayFunctions.cuh:64), [6:9] sun direction, [9] cone alpha
    flat_rgb = jnp.maximum(
        jnp.power(
            jnp.maximum(env.color * env.skylight_intensity, 0.0),
            1.0 / env.gamma,
        ),
        0.0,
    ).astype(jnp.float32)
    sls = config.lighting_type == EnvironmentalLightingType.SINGLE_LIGHT_SOURCE
    env_vec = jnp.zeros((16,), jnp.float32)
    env_vec = env_vec.at[0:3].set(flat_rgb)
    env_vec = env_vec.at[3:6].set(env.color * env.ambient_light_intensity)
    env_vec = env_vec.at[6:9].set(env.sun_direction)
    env_vec = env_vec.at[9].set(1.0 - env.light_size)

    n_rays = sample_count * height * width
    from raytracerfacility_tpu.ops.pallas_seg import (
        render_pool_sorted,
        sorted_dispatch,
    )

    env_xla = (
        config.lighting_type == EnvironmentalLightingType.SKYDOME
        or (config.lighting_type == EnvironmentalLightingType.SCENE
            and env.cubemap is not None)
    )
    chunk = scene.fused_chunk or None
    if not sls and (env_xla
                    or sorted_dispatch(scene.fused, incoherent=False,
                                       rays=n_rays,
                                       **({"chunk": chunk} if chunk else {}))):
        # segmented engine: either the environment needs the XLA miss
        # hook (cubemap/Nishita — the fused kernel cannot shade them)
        # or the scene is large enough that inter-segment compaction +
        # coherence grouping buys back more culling than the reorder
        pool_fn, tables = render_pool_sorted, scene.fused
        env_arg = env_vec
        kwargs = (
            {"env_state": env,
             "lighting_type": int(config.lighting_type),
             "atmos_samples": config.atmosphere_samples,
             "atmos_samples_light": config.atmosphere_samples_light}
            if env_xla else {}
        )
    else:
        pool_fn, tables = render_pool_fused, scene.fused
        env_arg = env_vec
        kwargs = {"lighting": 1 if sls else 0}
    if chunk:
        kwargs["chunk"] = chunk

    tiling = None
    if (pool_fn is render_pool_sorted and tiled_raygen_enabled()
            and height == config.height and width == config.width):
        # tiled-order pool (see _tiled_pixel_coords): same rays, same
        # per-pixel RNG streams — bit-identical pixels, tighter segment-0
        # tile frusta. Skipped for sharded slabs (height != full image).
        from raytracerfacility_tpu.ops.pallas_seg import _pick_block_rows

        rows_est = -(-n_rays // 128)
        tile_rays = _pick_block_rows(rows_est) * 128
        ix_t, iy_t, pix_t, valid_t, tiling = _tiled_pixel_coords(
            height, width, tile_rays)
        np_t = ix_t.shape[0]
        rng = lcg_init(
            jnp.broadcast_to(pix_t, (sample_count, np_t)),
            jnp.broadcast_to(seed.reshape(sample_count, 1),
                             (sample_count, np_t)),
        )
        rng, origin, direction = generate_camera_rays(
            camera, rng, ix_t[None], iy_t[None], width, config.height
        )
        n_rays = sample_count * np_t
        valid = jnp.broadcast_to(valid_t[None],
                                 (sample_count, np_t)).reshape(n_rays)
    else:
        valid = jnp.ones((n_rays,), jnp.float32)

    radiance, normal, albedo, position, rays = pool_fn(
        tables,
        origin.reshape(n_rays, 3),
        direction.reshape(n_rays, 3),
        rng.reshape(n_rays),
        valid,
        env_arg,
        bounces=config.bounces,
        **kwargs,
    )

    if tiling is not None:
        def unflatten(a):
            return _untile(a, sample_count, height, width, tiling)
    else:
        def unflatten(a):
            return a.reshape(sample_count, height, width, 3)

    return (
        unflatten(radiance),
        unflatten(normal),
        unflatten(albedo),
        unflatten(position),
        rays,
    )


def _render_samples_fused(
    scene, camera, env, config, ix, iy_global, pixel_index, base_seed,
    height, width, sample_count,
):
    """Fused-path body of :func:`render_samples`: all spp fold into one ray
    pool (the ``samples_in_lanes`` seeding: per-sample RNG streams are
    decorrelated rather than sequential — distributions match the
    reference, see render_samples notes)."""
    s_idx = jnp.arange(sample_count, dtype=jnp.uint32)[:, None, None]
    seed = base_seed + jnp.uint32(0x85EBCA6B) * s_idx
    radiance, normal, albedo, position, rays = _pool_fused_slots(
        scene, camera, env, config, ix, iy_global, pixel_index, seed,
        height, width, sample_count,
    )
    inv_n = 1.0 / config.samples
    return (
        jnp.sum(radiance, axis=0) * inv_n,
        jnp.sum(normal, axis=0) * inv_n,
        jnp.sum(albedo, axis=0) * inv_n,
        jnp.sum(position, axis=0) * inv_n,
        rays,
    )


# --------------------------------------------------------------------------
# Camera rendering (the __raygen__CR equivalent)
# --------------------------------------------------------------------------


@struct.dataclass
class FrameBuffers:
    """Progressive frame state (ref CameraProperties frame buffers,
    RayTracer.hpp:30-70)."""

    color: jax.Array  # (H, W, 4) gamma-encoded
    normal: jax.Array  # (H, W, 4)
    albedo: jax.Array  # (H, W, 4)
    frame_id: jax.Array  # () int32 — frames accumulated so far


def init_frame(width: int, height: int) -> FrameBuffers:
    return FrameBuffers(
        color=jnp.zeros((height, width, 4), jnp.float32),
        normal=jnp.zeros((height, width, 4), jnp.float32),
        albedo=jnp.zeros((height, width, 4), jnp.float32),
        frame_id=jnp.int32(0),
    )


def render_samples(
    scene: CompiledScene,
    camera: CameraState,
    env: EnvironmentState,
    config: RenderConfig,
    frame_id: jax.Array,
    row_offset: jax.Array | int = 0,
    local_height: int | None = None,
    sample_count: int | None = None,
    sample_stream: jax.Array | int = 0,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Trace ``sample_count`` jittered samples for a band of pixel rows and
    return *linear* per-pixel mean accumulators (color, normal, albedo,
    position) plus the live-ray count.

    This is the shardable core of ``__raygen__CR``
    (ref ptx/CameraRendering.cu:32-110): ``row_offset``/``local_height``
    carve the image across devices, ``sample_stream`` decorrelates RNG
    streams when samples are sharded. Per-pixel RNG seeding matches the
    reference: Init(pixel index, frame id) (ref :42-44), with the stream id
    mixed into the seed word for sharded spp.
    """
    height = local_height if local_height is not None else config.height
    width = config.width
    sample_count = config.samples if sample_count is None else sample_count
    iy, ix = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32),
        jnp.arange(width, dtype=jnp.float32),
        indexing="ij",
    )
    iy_global = iy + jnp.asarray(row_offset, jnp.float32)
    pixel_index = (ix + width * iy_global).astype(jnp.uint32)
    base_seed = frame_id.astype(jnp.uint32) + jnp.uint32(0x9E3779B1) * jnp.asarray(
        sample_stream, jnp.uint32
    )

    if (fused_camera_compatible(scene, env, config)
            or sorted_env_compatible(scene, env, config)):
        return _render_samples_fused(
            scene, camera, env, config, ix, iy_global, pixel_index,
            base_seed, height, width, sample_count,
        )

    if config.samples_in_lanes and sample_count > 1:
        # spp folded into the lane dimension: one ray pool of shape
        # (S, H, W) traced in a single pass. On the target runtime each
        # executed op has a large fixed overhead, so rays-per-op is the
        # throughput lever; RNG streams are decorrelated per sample slot
        # (deviation from the reference's sequential per-pixel stream;
        # distributions match).
        s_idx = jnp.arange(sample_count, dtype=jnp.uint32)[:, None, None]
        seed = base_seed + jnp.uint32(0x85EBCA6B) * s_idx
        rng = lcg_init(
            jnp.broadcast_to(pixel_index, (sample_count, height, width)),
            jnp.broadcast_to(seed, (sample_count, height, width)),
        )
        rng, origin, direction = generate_camera_rays(
            camera, rng, ix[None], iy_global[None], width, config.height
        )
        path, rays = trace_radiance_counted(
            scene, env, config, origin, direction, rng, jnp.float32(0.0)
        )
        inv_n = 1.0 / config.samples
        return (
            jnp.sum(path.radiance, axis=0) * inv_n,
            jnp.sum(path.first_normal, axis=0) * inv_n,
            jnp.sum(path.first_albedo, axis=0) * inv_n,
            jnp.sum(path.first_position, axis=0) * inv_n,
            rays,
        )

    rng = lcg_init(pixel_index, jnp.broadcast_to(base_seed, pixel_index.shape))

    def sample_body(carry, _):
        rng, acc_color, acc_normal, acc_albedo, acc_position, rays = carry
        rng, origin, direction = generate_camera_rays(
            camera, rng, ix, iy_global, width, config.height
        )
        path, traced = trace_radiance_counted(
            scene, env, config, origin, direction, rng, jnp.float32(0.0)
        )
        inv_n = 1.0 / config.samples
        return (
            path.rng,
            acc_color + path.radiance * inv_n,
            acc_normal + path.first_normal * inv_n,
            acc_albedo + path.first_albedo * inv_n,
            acc_position + path.first_position * inv_n,
            rays + traced,
        ), None

    zeros = jnp.zeros((height, width, 3), jnp.float32)
    carry = (rng, zeros, zeros, zeros, zeros, jnp.float32(0.0))
    carry, _ = jax.lax.scan(sample_body, carry, None, length=sample_count)
    _, pixel_color, pixel_normal, pixel_albedo, pixel_position, rays = carry
    return pixel_color, pixel_normal, pixel_albedo, pixel_position, rays


def finalize_frame(
    camera: CameraState,
    config: RenderConfig,
    frame: FrameBuffers,
    pixel_color: jax.Array,
    pixel_normal: jax.Array,
    pixel_albedo: jax.Array,
    pixel_position: jax.Array,
) -> FrameBuffers:
    """Progressive accumulation + gamma encode + AOV packing
    (ref ptx/CameraRendering.cu:112-147)."""
    height, width = pixel_color.shape[0], config.width
    # ---- progressive accumulation (ref CameraRendering.cu:113-134).
    # Reproduced exactly, including the reference's weighting quirk: history
    # is weighted by frame_id even though it holds frame_id - 1 samples.
    fid = frame.frame_id.astype(jnp.float32)
    if config.accumulate:
        prev = jnp.power(jnp.maximum(frame.color[..., :3], 0.0), camera.gamma)
        accumulated = (pixel_color + fid * prev) / (fid + 1.0)
        pixel_color = jnp.where(fid > 1.0, accumulated, pixel_color)

    gamma_corrected = jnp.power(
        jnp.maximum(pixel_color, 0.0), 1.0 / camera.gamma
    )
    color = jnp.concatenate(
        [gamma_corrected, jnp.ones((height, width, 1), jnp.float32)], axis=-1
    )
    normal = jnp.concatenate(
        [pixel_normal, jnp.ones((height, width, 1), jnp.float32)], axis=-1
    )
    if config.output_type == OutputType.DEPTH:
        # ref CameraRendering.cu:135-140: albedo buffer repurposed for depth
        distance = jnp.linalg.norm(
            pixel_position - camera.position, axis=-1, keepdims=True
        )
        depth = jnp.clip(distance / camera.max_distance, 0.0, 1.0)
        albedo_rgb = jnp.broadcast_to(depth, (height, width, 3))
    else:
        albedo_rgb = pixel_albedo
    albedo = jnp.concatenate(
        [albedo_rgb, jnp.ones((height, width, 1), jnp.float32)], axis=-1
    )
    return FrameBuffers(
        color=color,
        normal=normal,
        albedo=albedo,
        frame_id=frame.frame_id + 1,
    )


def render_frame(
    scene: CompiledScene,
    camera: CameraState,
    env: EnvironmentState,
    config: RenderConfig,
    frame: FrameBuffers,
) -> FrameBuffers:
    """One progressive frame: sample pass + finalize (single device)."""
    color, normal, albedo, position, _ = render_samples(
        scene, camera, env, config, frame.frame_id
    )
    return finalize_frame(camera, config, frame, color, normal, albedo, position)


def render_frame_counted(
    scene: CompiledScene,
    camera: CameraState,
    env: EnvironmentState,
    config: RenderConfig,
    frame: FrameBuffers,
) -> tuple[FrameBuffers, jax.Array]:
    """render_frame that also reports live rays traced (for benchmarks)."""
    color, normal, albedo, position, rays = render_samples(
        scene, camera, env, config, frame.frame_id
    )
    out = finalize_frame(camera, config, frame, color, normal, albedo, position)
    return out, rays


def render_samples_frames_pooled(
    scene: CompiledScene,
    camera: CameraState,
    env: EnvironmentState,
    config: RenderConfig,
    frame_id: jax.Array,
    num_frames: int,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Trace ``num_frames`` progressive frames' camera rays as ONE ray
    pool; returns *per-frame* linear accumulators (F, H, W, 3) and the
    total live-ray count.

    Progressive frames are RNG-independent by construction — each frame
    reseeds from scratch with ``Init(pixel index, frame id)``
    (ref ptx/CameraRendering.cu:42-44; :func:`render_samples` base_seed
    with sample_stream 0) — so frame f's per-ray arithmetic here is
    BIT-IDENTICAL to a sequential ``render_samples(frame_id + f)`` call:
    pooling only changes which lanes ride in the same kernel tiles, and
    every engine's per-ray result is pool-composition independent (the
    reorder engines are tested bit-identical to the unsorted paths).
    What pooling buys is amortization of the per-dispatch floor: a
    256x256 wavefront frame is ~33 ms of which most is small-pool fixed
    cost, paid 8x by the sequential scan and once here.

    Requires ``config.samples == 1`` (spp pooling is a separate axis,
    see ``samples_in_lanes``).
    """
    assert config.samples == 1, "frame pooling requires samples == 1"
    height, width = config.height, config.width
    iy, ix = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32),
        jnp.arange(width, dtype=jnp.float32),
        indexing="ij",
    )
    pixel_index = (ix + width * iy).astype(jnp.uint32)
    f_idx = jnp.arange(num_frames, dtype=jnp.uint32)[:, None, None]
    # per-frame seed word == render_samples' base_seed at frame_id + f
    seed = frame_id.astype(jnp.uint32) + f_idx

    if (fused_camera_compatible(scene, env, config)
            or sorted_env_compatible(scene, env, config)):
        return _pool_fused_slots(
            scene, camera, env, config, ix, iy, pixel_index, seed,
            height, width, num_frames,
        )

    rng = lcg_init(
        jnp.broadcast_to(pixel_index, (num_frames, height, width)),
        jnp.broadcast_to(seed, (num_frames, height, width)),
    )
    rng, origin, direction = generate_camera_rays(
        camera, rng, ix[None], iy[None], width, config.height
    )
    path, rays = trace_radiance_counted(
        scene, env, config, origin, direction, rng, jnp.float32(0.0)
    )
    return (
        path.radiance,
        path.first_normal,
        path.first_albedo,
        path.first_position,
        rays,
    )


def _frame_pool_group(config: RenderConfig, num_frames: int) -> int:
    """Static group size for pooled progressive frames: the largest
    divisor of ``num_frames`` whose pooled ray count stays under the
    RTF_TPU_FRAME_POOL_RAYS cap (default 2M rays — the largest pool the
    axon remote Mosaic compiler reliably builds: a 4.15M-ray pooled
    1080p program failed its compile with an opaque HTTP 500 on 6/6
    attempts on 2026-08-18, while every pool <= 2.1M compiles and runs).
    1 disables pooling (multi-spp configs keep the sequential scan: spp
    already pools into lanes on the fast path)."""
    if num_frames <= 1 or config.samples != 1:
        return 1
    cap = int(os.environ.get("RTF_TPU_FRAME_POOL_RAYS", str(2 * 1024 * 1024)))
    per_frame = config.height * config.width
    best = 1
    for d in range(1, num_frames + 1):
        if num_frames % d == 0 and d * per_frame <= cap:
            best = d
    return best


def render_frames_counted(
    scene: CompiledScene,
    camera: CameraState,
    env: EnvironmentState,
    config: RenderConfig,
    frame: FrameBuffers,
    num_frames: int,
) -> tuple[FrameBuffers, jax.Array]:
    """``num_frames`` progressive frames in ONE compiled dispatch.

    The reference's render loop never syncs to the host between frames —
    the frame buffer blits straight to a GL texture on-GPU
    (ref RayTracer.cu:2232-2256) and accumulation feeds forward on
    device. This is the TPU equivalent: a ``lax.scan`` over progressive
    frames with a single host fence at the end. Per-frame arithmetic is
    identical to calling :func:`render_frame_counted` in a host loop
    (the scan carry IS the frame state); what changes is dispatch/fence
    count — measured ~28 ms of tunnel round-trip per frame on the
    benchmark runtime, which dominates small frames (a 256x256 BTF
    frame is ~16 ms of compute). Returns the final frame and the TOTAL
    live-ray count across all frames.

    When ``config.samples == 1``, frames additionally POOL into groups
    (see :func:`render_samples_frames_pooled`): each scan step traces a
    whole group as one ray pool, then replays the progressive
    accumulation fold sequentially over the group's per-frame slices —
    the fold is the exact :func:`finalize_frame` recurrence, so the
    result is bit-identical to the unpooled scan while small frames stop
    paying the per-dispatch floor once per frame."""
    group = _frame_pool_group(config, num_frames)

    if group <= 1:
        def body(f, _):
            out, rays = render_frame_counted(scene, camera, env, config, f)
            return out, rays

        out, rays = jax.lax.scan(body, frame, None, length=num_frames)
        return out, jnp.sum(rays)

    def group_body(f, _):
        color, normal, albedo, position, rays = render_samples_frames_pooled(
            scene, camera, env, config, f.frame_id, group
        )

        def fold(fr, slot):
            c, n, a, p = slot
            return finalize_frame(camera, config, fr, c, n, a, p), None

        f, _ = jax.lax.scan(fold, f, (color, normal, albedo, position))
        return f, rays

    out, rays = jax.lax.scan(
        group_body, frame, None, length=num_frames // group
    )
    return out, jnp.sum(rays)


# ---------------------------------------------------------------------------
# jitted entry points. The engine-selection knobs (RTF_TPU_* env vars) are
# read INSIDE the traced region (render_pool_sorted etc. read os.environ at
# trace time), so they must participate in the jit cache key — otherwise a
# later call with a flipped knob silently reuses the earlier engine's trace
# (this exact bug made the in-process engine-equivalence tests vacuous:
# both "engines" ran whichever was traced first). Each public *_jit wrapper
# reads the knob fingerprint and passes it as a static argument.
# ---------------------------------------------------------------------------

_KNOB_NAMES = (
    "RTF_TPU_FUSED", "RTF_TPU_SORTED", "RTF_TPU_SORTED_TRACE",
    "RTF_TPU_SORTED_STATE",
    "RTF_TPU_SORT_BLOCK", "RTF_TPU_TRACE_WINDOW",
    "RTF_TPU_SEG_EVERY", "RTF_TPU_SEG_MBITS", "RTF_TPU_SEG_DBITS",
    "RTF_TPU_SEG_GROUP", "RTF_TPU_SEG_BPERM", "RTF_TPU_SEG_BPERM_FROM",
    "RTF_TPU_SEG_BPERM_EXACT", "RTF_TPU_TILED_RAYGEN",
    "RTF_TPU_SEG_WDEPTH", "RTF_TPU_SEG_SUBBITS", "RTF_TPU_SEG_SUBIV",
    "RTF_TPU_SEG_SPLIT", "RTF_TPU_SEG_VDEPTH",
    "RTF_TPU_SEG_ROWS", "RTF_TPU_FUSED_ROWS", "RTF_TPU_FUSED_CHUNK",
    "RTF_TPU_FUSED_SUB", "RTF_TPU_UNROLL", "RTF_TPU_FRAME_POOL_RAYS",
    "RTF_BTF_BUCKET",
)


def _knob_key() -> tuple:
    import raytracerfacility_tpu.ops.pallas_seg as _seg

    # BLOCK_ROWS_ENV is monkeypatched directly by tests (module attribute,
    # not just the env var), so it rides along explicitly
    return tuple(os.environ.get(k) for k in _KNOB_NAMES) + (
        _seg.BLOCK_ROWS_ENV,)


_render_frame_knobbed = jax.jit(
    lambda knobs, scene, camera, env, config, frame: render_frame(
        scene, camera, env, config, frame),
    static_argnums=(0, 4))
_render_frame_counted_knobbed = jax.jit(
    lambda knobs, scene, camera, env, config, frame: render_frame_counted(
        scene, camera, env, config, frame),
    static_argnums=(0, 4))
_render_frames_counted_knobbed = jax.jit(
    lambda knobs, scene, camera, env, config, frame, num_frames:
    render_frames_counted(scene, camera, env, config, frame, num_frames),
    static_argnums=(0, 4, 6))


def render_frame_jit(scene, camera, env, config, frame):
    return _render_frame_knobbed(_knob_key(), scene, camera, env, config,
                                 frame)


def render_frame_counted_jit(scene, camera, env, config, frame):
    return _render_frame_counted_knobbed(_knob_key(), scene, camera, env,
                                         config, frame)


def render_frames_counted_jit(scene, camera, env, config, frame, num_frames):
    return _render_frames_counted_knobbed(_knob_key(), scene, camera, env,
                                          config, frame, num_frames)
