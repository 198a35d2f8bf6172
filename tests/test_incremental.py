"""Incremental rebuilds: editing one object must not re-bake the scene.

The reference rebuilds only dirty GAS and reuses the rest
(ref RayTracer.cu:1638-1643; version checks RayTracerLayer.cpp:60,131,
193-197). These tests pin the equivalents: material-value edits re-bake
zero triangles and keep the BVH/Pallas tables; a transform edit re-bakes
exactly one part; a skinned animation loop re-bakes only the animated
geometry each frame.
"""

import numpy as np
import pytest

from raytracerfacility_tpu.enums import RendererType
from raytracerfacility_tpu.scene import (
    MaterialProperties,
    RayTracerScene,
    make_cube,
    make_sphere,
)
import raytracerfacility_tpu.scene.builder as builder_mod


@pytest.fixture
def bake_counter(monkeypatch):
    calls = []
    real = builder_mod._geometry_world_mesh

    def counting(geom, transform):
        calls.append(geom.handle)
        return real(geom, transform)

    monkeypatch.setattr(builder_mod, "_geometry_world_mesh", counting)
    return calls


def _two_object_scene():
    scene = RayTracerScene()
    scene.upsert_geometry(1, version=0, mesh=make_sphere(0.5))
    scene.upsert_geometry(2, version=0, mesh=make_cube(0.4))
    scene.upsert_material(10, version=0, properties=MaterialProperties(
        albedo_color=(0.8, 0.2, 0.2), roughness=0.5, metallic=0.1))
    scene.upsert_material(11, version=0, properties=MaterialProperties(
        albedo_color=(0.2, 0.8, 0.2), roughness=0.9, metallic=0.0))
    t = np.eye(4, dtype=np.float32)
    t[0, 3] = 1.0
    scene.upsert_instance(20, version=0, geometry=1, material=10)
    scene.upsert_instance(21, version=0, geometry=2, material=11, transform=t)
    return scene


def test_material_edit_rebakes_nothing(bake_counter):
    scene = _two_object_scene()
    first = scene.build()
    assert len(bake_counter) == 2
    bake_counter.clear()

    scene.upsert_material(10, version=1, properties=MaterialProperties(
        albedo_color=(0.1, 0.1, 0.9), roughness=0.2, metallic=0.8))
    assert scene.dirty
    second = scene.build()

    assert bake_counter == []  # zero triangle re-bakes
    # geometry buffers, BVH and trace tables are reused object-identically
    assert second.geometry is first.geometry
    assert second.bvh is first.bvh
    assert second.pallas_tris is first.pallas_tris
    # the material table did change
    assert not np.allclose(np.asarray(second.materials.albedo),
                           np.asarray(first.materials.albedo))


def test_transform_edit_rebakes_one_part(bake_counter):
    scene = _two_object_scene()
    scene.build()
    bake_counter.clear()

    t = np.eye(4, dtype=np.float32)
    t[1, 3] = 0.5
    scene.upsert_instance(20, version=1, geometry=1, material=10, transform=t)
    second = scene.build()
    assert bake_counter == [1]  # only the moved instance's geometry
    # the moved sphere's triangles actually moved
    assert float(np.asarray(second.geometry.v0[:, 1]).max()) > 0.4


def test_skinned_animation_rebakes_only_animated(bake_counter):
    scene = _two_object_scene()
    mesh = make_cube(0.3)
    nv = mesh.num_vertices
    bone_ids = np.zeros((nv, 8), np.int32)
    bone_ids[:, 1:] = -1
    bone_weights = np.zeros((nv, 8), np.float32)
    bone_weights[:, 0] = 1.0
    scene.upsert_geometry(
        3, version=0, mesh=mesh, renderer_type=RendererType.SKINNED,
        bone_ids=bone_ids, bone_weights=bone_weights,
        bone_matrices=np.eye(4, dtype=np.float32)[None],
    )
    scene.upsert_instance(22, version=0, geometry=3, material=10)
    scene.build()
    bake_counter.clear()

    for frame in range(1, 4):
        m = np.eye(4, dtype=np.float32)
        m[1, 3] = 0.1 * frame  # animate upward
        scene.upsert_geometry(
            3, version=frame, mesh=mesh, renderer_type=RendererType.SKINNED,
            bone_ids=bone_ids, bone_weights=bone_weights,
            bone_matrices=m[None],
        )
        compiled = scene.build()
        # only the skinned geometry re-baked this frame
        assert bake_counter == [3], bake_counter
        bake_counter.clear()
    ys = np.asarray(compiled.geometry.v0[:, 1])
    assert ys.max() > 0.35  # the animation actually moved the cube


def test_removal_prunes_cache(bake_counter):
    scene = _two_object_scene()
    scene.build()
    scene.begin_sync()
    scene.upsert_geometry(1, version=0, mesh=None)  # keep (version match)
    scene.upsert_material(10, version=0)
    scene.upsert_instance(20, version=0, geometry=1, material=10)
    scene.end_sync()  # drops geometry 2 / material 11 / instance 21
    compiled = scene.build()
    assert ("part", 21) not in scene._build_cache
    assert compiled.num_instances == 1
