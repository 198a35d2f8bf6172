"""Device-side compiled scene: flattened SoA buffers (a pytree).

This is the TPU replacement for the reference's two-level OptiX structure
(per-geometry GAS + instance IAS + per-instance SBT records,
ref RayTracer.cu:1251-1715, 1835-2055): all instances are baked to a single
world-space triangle soup with per-triangle corner attributes, and material /
instance dispatch becomes integer gathers into flat tables. Rationale: TPU
has no hardware traversal or function-pointer dispatch; one flat soup makes
traversal a dense data-parallel kernel and shading a single vectorized pass.

Per-triangle corner attributes (instead of vertex pool + index indirection)
cost ~3x vertex memory but turn shading's attribute fetch into one gather by
primitive id — the right trade on HBM-bandwidth-bound hardware.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class GeometryBuffers:
    """World-space primitive soup. T = padded primitive count.

    ``kind`` 0 = triangle (v0/e1/e2 = vertex + edge basis), 1 = linear
    sphere-swept curve segment (v0 = p0, e1 = p1 - p0, e2 = (r0, r1-r0, 0);
    see ops/curve.py). ``has_curves`` is a static flag so triangle-only
    scenes compile without the dual-primitive dispatch.
    """

    v0: jax.Array  # (T, 3)
    e1: jax.Array  # (T, 3)
    e2: jax.Array  # (T, 3)
    normal: jax.Array  # (T, 3, 3) per-corner world normals (unnormalized)
    tangent: jax.Array  # (T, 3, 3)
    tex_coord: jax.Array  # (T, 3, 2)
    color: jax.Array  # (T, 3, 4) per-corner vertex colors
    data: jax.Array  # (T, 3, 4) aux channel (ref vertex padding fields)
    instance: jax.Array  # (T,) int32 instance slot
    kind: jax.Array  # (T,) int32 primitive kind
    has_curves: bool = struct.field(pytree_node=False, default=False)

    @property
    def num_triangles(self) -> int:
        return self.v0.shape[0]


@struct.dataclass
class MaterialTable:
    """Flat material table + texture stack (replaces SBT material records +
    cudaTextureObjects, ref RayTracer.cu:2058-2256)."""

    material_type: jax.Array  # (M,) int32 (enums.MaterialType)
    albedo: jax.Array  # (M, 3)
    transmission: jax.Array  # (M,)
    roughness: jax.Array  # (M,)
    metallic: jax.Array  # (M,)
    emission: jax.Array  # (M,)
    subsurface_factor: jax.Array  # (M,)
    subsurface_color: jax.Array  # (M, 3)
    subsurface_radius: jax.Array  # (M, 3)
    albedo_tex: jax.Array  # (M,) int32, -1 = none
    normal_tex: jax.Array  # (M,)
    metallic_tex: jax.Array  # (M,)
    roughness_tex: jax.Array  # (M,)
    btf_index: jax.Array  # (M,) int32, -1 = none (MLVQ table slot)
    texels: jax.Array  # (K, H, W, 4)
    tex_sizes: jax.Array  # (K, 2)


@struct.dataclass
class CompiledScene:
    geometry: GeometryBuffers
    materials: MaterialTable
    instance_material: jax.Array  # (I,) int32 material slot per instance
    instance_handle: jax.Array  # (I, 2) uint32 (lo, hi) of the 64-bit handle
    btf: object | None = None  # mlvq.BTFTable when the scene has BTF materials
    bvh: object | None = None  # ops.bvh.BVH when built
    # (N, 9) f32 SMEM triangle table for the Pallas brute-trace mega-kernel
    # (ops/pallas_brute.py); None when disabled or when the scene has curves
    pallas_tris: object | None = None
    # (table, sub_aabbs, mat_table) for the fused whole-path mega-kernel
    # (ops/pallas_fused.py); None when the scene uses features the fused
    # path cannot specialize (curves, textures, BTF, subsurface, non-Default
    # materials)
    fused: object | None = None
    # SMEM window size the fused tables were packed with (per-scene,
    # ops/pallas_fused.auto_chunk); static — it selects kernel grids.
    # 0 = unset (legacy TRI_CHUNK default).
    fused_chunk: int = struct.field(pytree_node=False, default=0)
    # UNPADDED primitive count (geometry.v0 carries up to
    # pad_to_multiple-1 zero rows so kernel windows tile evenly); 0 =
    # unknown (legacy callers). Roofline numerators must use this, not
    # v0.shape[0] (a ~2.8k-row scene pads up to +255 rows ≈ 9%).
    num_tris: int = struct.field(pytree_node=False, default=0)

    @property
    def num_instances(self) -> int:
        return self.instance_material.shape[0]


def handle_words(handle: int) -> tuple[int, int]:
    return handle & 0xFFFFFFFF, (handle >> 32) & 0xFFFFFFFF


def combine_handle_words(lo, hi) -> int:
    return int(lo) | (int(hi) << 32)
