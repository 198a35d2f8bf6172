"""The scene store: handle/version-keyed geometry, material and instance maps.

Mirrors the reference's ``RayTracer`` storage maps and the sync protocol that
``RayTracerLayer::UpdateMeshesStorage`` drives over them
(ref RayTracer.hpp:358-363; RayTracerLayer.cpp:18-346):

* three maps keyed by 64-bit handles,
* per-object ``version`` dirty tracking (an upsert with an unchanged version
  is a no-op),
* mark-sweep removal: ``begin_sync`` flags everything, upserts un-flag,
  ``end_sync`` sweeps what is still flagged,
* a rebuild (here: :meth:`build`) only when something actually changed
  (ref RayTracerLayer.cpp:383-390 gating BuildIAS).

``build()`` compiles the store into a :class:`CompiledScene` device pytree:
instance transforms, LBS skinning and instancing are baked with batched jnp
matmuls (the TPU version of the vertex-prep CUDA kernels,
ref RayTracer.cu:1148-1249).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from raytracerfacility_tpu.enums import GeometryType, MaterialType, RendererType
from raytracerfacility_tpu.scene.materials import MaterialProperties, RayTracedMaterial
from raytracerfacility_tpu.scene.mesh import Mesh


@dataclasses.dataclass
class RayTracedGeometry:
    """Ref RayTracer.hpp:277-314."""

    renderer_type: RendererType = RendererType.DEFAULT
    geometry_type: GeometryType = GeometryType.TRIANGLE
    mesh: Mesh | None = None
    # Skinned (ref CopySkinnedVerticesKernel, RayTracer.cu:1194-1249)
    bone_ids: np.ndarray | None = None  # (N, 8) int32
    bone_weights: np.ndarray | None = None  # (N, 8) f32
    bone_matrices: np.ndarray | None = None  # (B, 4, 4)
    # Instanced (ref CopyVerticesInstancedKernel, RayTracer.cu:1148-1175)
    instance_matrices: np.ndarray | None = None  # (P, 4, 4)
    instance_colors: np.ndarray | None = None  # (P, 4)
    # Curves (ref Curves struct, RayDataDefinations.hpp:21-120)
    strand_points: np.ndarray | None = None  # (S, >=8): pos3, thickness, color4
    strand_tex_coords: np.ndarray | None = None  # (S,)
    curve_segments: np.ndarray | None = None  # (C,) int32 start point index
    curve_mode: str = "analytic"  # "analytic" (sphere-swept) | "tessellate"

    version: int = -1
    handle: int = 0
    remove_flag: bool = True


@dataclasses.dataclass
class RayTracedInstance:
    """Ref RayTracer.hpp:317-328."""

    entity_handle: int = 0
    geometry_key: int = 0
    material_key: int = 0
    global_transform: np.ndarray = dataclasses.field(
        default_factory=lambda: np.eye(4, dtype=np.float32)
    )
    version: int = -1
    remove_flag: bool = True


class RayTracerScene:
    """Handle-keyed scene store with version-diffed rebuilds."""

    def __init__(self) -> None:
        self.geometries: dict[int, RayTracedGeometry] = {}
        self.materials: dict[int, RayTracedMaterial] = {}
        self.instances: dict[int, RayTracedInstance] = {}
        self._dirty = True
        self._compiled = None
        # incremental-rebuild cache (per-instance bakes + geometry
        # ensemble); owned here, consumed by scene/builder.py
        self._build_cache: dict = {}

    # ------------------------------------------------------------------ sync
    def begin_sync(self) -> None:
        """Mark phase: flag everything for removal
        (ref RayTracerLayer.cpp:22-24)."""
        for store in (self.geometries, self.materials, self.instances):
            for item in store.values():
                item.remove_flag = True

    def end_sync(self) -> None:
        """Sweep phase: drop whatever was not re-upserted
        (ref RayTracer.cu:1618-1636 removal handling inside BuildIAS)."""
        for store in (self.geometries, self.materials, self.instances):
            doomed = [k for k, v in store.items() if v.remove_flag]
            for k in doomed:
                del store[k]
                self._dirty = True

    # --------------------------------------------------------------- upserts
    def upsert_geometry(
        self,
        handle: int,
        *,
        version: int,
        mesh: Mesh | None = None,
        renderer_type: RendererType = RendererType.DEFAULT,
        geometry_type: GeometryType = GeometryType.TRIANGLE,
        **extras,
    ) -> RayTracedGeometry:
        geom = self.geometries.get(handle)
        if geom is None:
            geom = RayTracedGeometry(handle=handle)
            self.geometries[handle] = geom
            self._dirty = True
        geom.remove_flag = False
        if geom.version != version:
            geom.version = version
            geom.renderer_type = RendererType(renderer_type)
            geom.geometry_type = GeometryType(geometry_type)
            geom.mesh = mesh
            for key, value in extras.items():
                setattr(geom, key, value)
            self._dirty = True
        return geom

    def upsert_material(
        self,
        handle: int,
        *,
        version: int,
        properties: MaterialProperties | None = None,
        material_type: MaterialType = MaterialType.DEFAULT,
        **extras,
    ) -> RayTracedMaterial:
        mat = self.materials.get(handle)
        if mat is None:
            mat = RayTracedMaterial(handle=handle)
            self.materials[handle] = mat
            self._dirty = True
        mat.remove_flag = False
        if mat.version != version:
            mat.version = version
            mat.material_type = MaterialType(material_type)
            if properties is not None:
                mat.properties = properties
            for key, value in extras.items():
                setattr(mat, key, value)
            self._dirty = True
        return mat

    def upsert_instance(
        self,
        handle: int,
        *,
        version: int,
        geometry: int,
        material: int,
        transform: np.ndarray | None = None,
        entity_handle: int | None = None,
    ) -> RayTracedInstance:
        inst = self.instances.get(handle)
        if inst is None:
            inst = RayTracedInstance()
            self.instances[handle] = inst
            self._dirty = True
        inst.remove_flag = False
        transform = (
            np.eye(4, dtype=np.float32)
            if transform is None
            else np.asarray(transform, np.float32)
        )
        changed = (
            inst.version != version
            or inst.geometry_key != geometry
            or inst.material_key != material
            or not np.array_equal(inst.global_transform, transform)
        )
        if changed:
            inst.version = version
            inst.geometry_key = geometry
            inst.material_key = material
            inst.global_transform = transform
            inst.entity_handle = (
                handle if entity_handle is None else entity_handle
            )
            self._dirty = True
        return inst

    # ----------------------------------------------------------------- build
    @property
    def dirty(self) -> bool:
        return self._dirty

    def mark_dirty(self) -> None:
        self._dirty = True
        self._compiled = None

    def build(
        self,
        pad_to_multiple: int = 256,
        build_bvh: bool = True,
        leaf_size: int = 4,
    ):
        """Compile to a CompiledScene, rebuilding only when dirty
        (ref RayTracerLayer.cpp:383-390)."""
        if self._compiled is not None and not self._dirty:
            return self._compiled
        from raytracerfacility_tpu.scene.builder import build_compiled_scene

        self._compiled = build_compiled_scene(
            self,
            pad_to_multiple=pad_to_multiple,
            build_bvh=build_bvh,
            leaf_size=leaf_size,
            cache=self._build_cache,
        )
        self._dirty = False
        return self._compiled
