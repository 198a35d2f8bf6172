from raytracerfacility_tpu.scene.materials import MaterialProperties, RayTracedMaterial
from raytracerfacility_tpu.scene.mesh import (
    Mesh,
    make_cornell_box,
    make_cube,
    make_plane,
    make_sphere,
)
from raytracerfacility_tpu.scene.scene import (
    RayTracedGeometry,
    RayTracedInstance,
    RayTracerScene,
)
from raytracerfacility_tpu.scene.compiled import (
    CompiledScene,
    GeometryBuffers,
    MaterialTable,
)

__all__ = [
    "CompiledScene",
    "GeometryBuffers",
    "MaterialProperties",
    "MaterialTable",
    "Mesh",
    "RayTracedGeometry",
    "RayTracedInstance",
    "RayTracedMaterial",
    "RayTracerScene",
    "make_cornell_box",
    "make_cube",
    "make_plane",
    "make_sphere",
]
