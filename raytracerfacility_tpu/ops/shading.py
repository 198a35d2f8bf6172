"""Vectorized hit-info interpolation and material evaluation.

Replaces the reference's SBT-dispatched hit shaders with gather-based SoA
passes:

* :func:`interpolate_hit` ports ``TriangularMesh::GetHitInfo`` +
  ``SBT::GetHitInfo`` (ref RayDataDefinations.hpp:127-164, 364-382):
  barycentric interpolation of texcoord/position/normal/tangent,
  nearest-vertex color/data, normal flip toward the incoming ray.
  (World transforms are pre-baked into the buffers by the scene builder, so
  no per-hit matrix multiply is needed — interpolation commutes with the
  linear transform.)
* :func:`eval_material` ports ``SurfaceMaterial`` (ref
  RayDataDefinations.hpp:240-284): texture-or-constant albedo (alpha =
  1 - transmission), roughness/metallic fetches, TBN normal mapping.
* :func:`brdf_weight` / :func:`sample_brdf` port ``BSDF.cuh:6-13`` and the
  energy weighting at RayFunctions.cuh:57-60, 152-161.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from raytracerfacility_tpu.enums import MaterialType
from raytracerfacility_tpu.ops.math3d import (
    cross,
    dot,
    normalize,
    reflect,
    safe_normalize,
    sample_hemisphere,
)
from raytracerfacility_tpu.ops.texture import sample_stack_bilinear
from raytracerfacility_tpu.scene.compiled import CompiledScene


@struct.dataclass
class HitInfo:
    """Ref HitInfo.hpp:4-11 (SoA)."""

    position: jax.Array  # (..., 3)
    normal: jax.Array  # (..., 3) unit, flipped toward -ray
    tangent: jax.Array  # (..., 3) unit
    color: jax.Array  # (..., 4) nearest-vertex color
    tex_coord: jax.Array  # (..., 2)
    data: jax.Array  # (..., 4)
    instance: jax.Array  # (...,) int32
    material: jax.Array  # (...,) int32 material slot


def interpolate_hit(
    scene: CompiledScene,
    prim: jax.Array,  # (...,) int32 (clamped to valid range by caller masks)
    u: jax.Array,
    v: jax.Array,
    ray_direction: jax.Array,
    check_normal: bool = True,
    origin: jax.Array | None = None,
    t_hit: jax.Array | None = None,
    with_tangent: bool = True,
    with_vertex_attrs: bool = True,
) -> HitInfo:
    """``with_tangent`` / ``with_vertex_attrs`` statically elide the
    tangent and nearest-vertex color/data fetches when no material in the
    compiled scene consumes them (the equivalent of the reference's
    per-material SBT program specialization) — each elision removes
    gathers from every path segment."""
    geom = scene.geometry
    prim = jnp.clip(prim, 0, geom.num_triangles - 1)
    w = (1.0 - u - v)[..., None]
    uu = u[..., None]
    vv = v[..., None]

    base = geom.v0[prim]
    position = base + uu * geom.e1[prim] + vv * geom.e2[prim]

    n = geom.normal[prim]  # (..., 3 corners, 3)
    normal = w * n[..., 0, :] + uu * n[..., 1, :] + vv * n[..., 2, :]
    if with_tangent:
        t = geom.tangent[prim]
        tangent = w * t[..., 0, :] + uu * t[..., 1, :] + vv * t[..., 2, :]
    else:
        tangent = jnp.zeros_like(normal)
    tc = geom.tex_coord[prim]
    tex_coord = w * tc[..., 0, :] + uu * tc[..., 1, :] + vv * tc[..., 2, :]

    if with_vertex_attrs:
        # nearest-vertex color/data (ref RayDataDefinations.hpp:152-162)
        z = 1.0 - u - v
        pick_x = (u > z) & (u > v)
        pick_y = (~pick_x) & (v > z)
        corner = jnp.where(pick_x, 1, jnp.where(pick_y, 2, 0))
        color = jnp.take_along_axis(
            geom.color[prim], corner[..., None, None], axis=-2
        )[..., 0, :]
        data = jnp.take_along_axis(
            geom.data[prim], corner[..., None, None], axis=-2
        )[..., 0, :]
    else:
        color = jnp.zeros(normal.shape[:-1] + (4,), normal.dtype)
        data = jnp.zeros(normal.shape[:-1] + (4,), normal.dtype)

    if geom.has_curves and origin is not None and t_hit is not None:
        # curve prims: analytic offset-surface normal + attributes lerped
        # along the segment (ref Curves::GetHitInfo,
        # RayDataDefinations.hpp:32-72)
        from raytracerfacility_tpu.ops.curve import (
            linear_curve_normal,
            refine_swept_hit,
        )

        is_curve = (geom.kind[prim] == 1)[..., None]
        x = origin + ray_direction * t_hit[..., None]
        p0 = base
        axis = geom.e1[prim]
        r0 = geom.e2[prim][..., 0]
        dr = geom.e2[prim][..., 1]
        c_normal, c_pos = linear_curve_normal(x, p0, axis, r0, dr, u)

        # exact swept-spline surface for quadratic/cubic strands: Newton
        # refinement against the parent spline (payload packed by the
        # scene bake, see builder._bake_analytic_curves) replaces the
        # subdivided-linear approximation's position/normal with the true
        # canal-surface point (ref exact spline evaluation,
        # CurveSplineDefinations.hpp:119-313)
        pdata = geom.data[prim]
        pn = geom.normal[prim]
        order = pdata[..., 1, 3]
        higher = (geom.kind[prim] == 1) & (order >= 2.0)
        ctrl = jnp.concatenate([pn, pdata[..., 0:1, :3]], axis=-2)
        radii = jnp.concatenate(
            [pdata[..., 1, :3], pdata[..., 0, 3:4]], axis=-1)
        s0_rng = pdata[..., 2, 0]
        s1_rng = pdata[..., 2, 1]
        s_seed = s0_rng + u * (s1_rng - s0_rng)
        ord_i = jnp.where(higher, order, 2.0).astype(jnp.int32)
        _, s_ref, r_pos, r_normal, r_ok = refine_swept_hit(
            origin, ray_direction, t_hit, s_seed, ctrl, radii, ord_i)
        higher = higher & r_ok  # grazing-ray tail keeps the bounded
        hm = higher[..., None]  # subdivision hit
        c_pos = jnp.where(hm, r_pos, c_pos)
        c_normal = jnp.where(hm, r_normal, c_normal)
        # attribute parameter: refined s mapped back into this
        # sub-segment's [u0, u1] range
        span = jnp.maximum(s1_rng - s0_rng, 1e-8)
        u_attr = jnp.where(
            higher, jnp.clip((s_ref - s0_rng) / span, 0.0, 1.0), u)
        ua = u_attr[..., None]

        # tangent = cross(normal, normal.yzx) (ref :69-70)
        swiz = jnp.stack(
            [c_normal[..., 1], c_normal[..., 2], c_normal[..., 0]], axis=-1
        )
        c_tangent = cross(c_normal, swiz)
        c0 = geom.color[prim][..., 0, :]
        c1 = geom.color[prim][..., 1, :]
        c_color = (1.0 - ua) * c0 + ua * c1
        t0 = tc[..., 0, :]
        t1 = tc[..., 1, :]
        c_tex = (1.0 - ua) * t0 + ua * t1
        position = jnp.where(is_curve, c_pos, position)
        normal = jnp.where(is_curve, c_normal, normal)
        tangent = jnp.where(is_curve, c_tangent, tangent)
        color = jnp.where(is_curve, c_color, color)
        tex_coord = jnp.where(is_curve, c_tex, tex_coord)
        data = jnp.where(is_curve, 0.0, data)

    normal = safe_normalize(normal)
    if check_normal:
        # flip toward the incoming ray (ref RayDataDefinations.hpp:376-378)
        flip = dot(ray_direction, normal) > 0.0
        normal = jnp.where(flip, -normal, normal)
    if with_tangent:
        tangent = safe_normalize(tangent)

    instance = geom.instance[prim]
    material = scene.instance_material[instance]
    return HitInfo(
        position=position,
        normal=normal,
        tangent=tangent,
        color=color,
        tex_coord=tex_coord,
        data=data,
        instance=instance,
        material=material,
    )


@struct.dataclass
class SurfaceSample:
    """Evaluated material at a hit (SoA)."""

    albedo: jax.Array  # (..., 3)
    alpha: jax.Array  # (...,) opacity for the cutout test
    roughness: jax.Array  # (...,)
    metallic: jax.Array  # (...,)
    emission: jax.Array  # (...,)
    subsurface_factor: jax.Array  # (...,)
    subsurface_color: jax.Array  # (..., 3)
    subsurface_radius: jax.Array  # (..., 3)
    shading_normal: jax.Array  # (..., 3) after normal mapping
    material_type: jax.Array  # (...,) int32
    btf_index: jax.Array  # (...,) int32, -1 when not a BTF material


def eval_material(scene: CompiledScene, hit: HitInfo,
                  enable_textures: bool = True) -> SurfaceSample:
    """``enable_textures=False`` statically elides the four bilinear
    texture fetches + TBN normal mapping for scenes whose material table
    binds no textures (each fetch is a gather chain executed per path
    segment)."""
    mats = scene.materials
    mid = hit.material
    mtype = mats.material_type[mid]

    albedo_const = mats.albedo[mid]
    alpha_const = 1.0 - mats.transmission[mid]

    if enable_textures:
        tex_id = mats.albedo_tex[mid]
        has_tex = tex_id >= 0
        tex_rgba = sample_stack_bilinear(
            mats.texels, mats.tex_sizes, tex_id, hit.tex_coord
        )
        albedo = jnp.where(has_tex[..., None], tex_rgba[..., :3], albedo_const)
        alpha = jnp.where(has_tex, tex_rgba[..., 3], alpha_const)
    else:
        albedo = albedo_const
        alpha = alpha_const

    # VertexColor material: albedo from nearest-vertex color
    # (ref RayFunctions.cuh:52-56)
    is_vertex_color = mtype == MaterialType.VERTEX_COLOR
    albedo = jnp.where(is_vertex_color[..., None], hit.color[..., :3], albedo)

    if enable_textures:
        rough_id = mats.roughness_tex[mid]
        rough_tex = sample_stack_bilinear(
            mats.texels, mats.tex_sizes, rough_id, hit.tex_coord
        )[..., 0]
        roughness = jnp.where(rough_id >= 0, rough_tex, mats.roughness[mid])

        metal_id = mats.metallic_tex[mid]
        metal_tex = sample_stack_bilinear(
            mats.texels, mats.tex_sizes, metal_id, hit.tex_coord
        )[..., 0]
        metallic = jnp.where(metal_id >= 0, metal_tex, mats.metallic[mid])

        # TBN normal mapping (ref RayDataDefinations.hpp:268-281)
        normal_id = mats.normal_tex[mid]
        has_normal_map = normal_id >= 0
        nm = sample_stack_bilinear(
            mats.texels, mats.tex_sizes, normal_id, hit.tex_coord
        )
        binormal = cross(hit.normal, hit.tangent)
        local = nm[..., :3] * 2.0 - 1.0
        mapped = normalize(
            hit.tangent * local[..., 0:1]
            + binormal * local[..., 1:2]
            + hit.normal * local[..., 2:3]
        )
        shading_normal = jnp.where(has_normal_map[..., None], mapped,
                                   hit.normal)
    else:
        roughness = mats.roughness[mid]
        metallic = mats.metallic[mid]
        shading_normal = hit.normal

    return SurfaceSample(
        albedo=albedo,
        alpha=alpha,
        roughness=roughness,
        metallic=metallic,
        emission=mats.emission[mid],
        subsurface_factor=mats.subsurface_factor[mid],
        subsurface_color=mats.subsurface_color[mid],
        subsurface_radius=mats.subsurface_radius[mid],
        shading_normal=shading_normal,
        material_type=mtype,
        btf_index=mats.btf_index[mid],
    )


def metallic_f(metallic: jax.Array) -> jax.Array:
    """f = (metallic + 2) / (metallic + 1) for metallic >= 0, else 1
    (ref RayFunctions.cuh:57-60)."""
    return jnp.where(metallic >= 0.0, (metallic + 2.0) / (metallic + 1.0), 1.0)


def brdf_weight(
    normal: jax.Array,
    new_direction: jax.Array,
    roughness: jax.Array,
    metallic: jax.Array,
) -> jax.Array:
    """clamp(|N.L| * roughness + (1 - roughness) * f, 0, 1)
    (ref RayFunctions.cuh:152-161)."""
    f = metallic_f(metallic)
    ndotl = jnp.abs(dot(normal, new_direction, keepdims=False))
    return jnp.clip(ndotl * roughness + (1.0 - roughness) * f, 0.0, 1.0)


def sample_brdf(
    state: jax.Array,
    ray_direction: jax.Array,
    normal: jax.Array,
    metallic: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Importance sample: hemisphere cone around the reflected direction with
    concentration = metallic (ref BSDF.cuh:6-13)."""
    reflected = reflect(ray_direction, normal)
    return sample_hemisphere(state, reflected, metallic)
