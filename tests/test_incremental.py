"""Incremental rebuilds: editing one object must not re-bake the scene.

The reference rebuilds only dirty GAS and reuses the rest
(ref RayTracer.cu:1638-1643; version checks RayTracerLayer.cpp:60,131,
193-197), and shares one compacted BLAS across instances
(ref RayTracer.cu:1618-1715). These tests pin the equivalents:

* material-value edits re-bake zero triangles and keep the BVH/Pallas
  tables object-identically;
* a transform edit re-runs ONE group's batched device transform and
  zero host corner bakes (the object-space bake is shared per geometry
  version, the TLAS-lite analog);
* N instances of one mesh cost ONE host corner bake + one batched
  device transform — host bake work is sublinear (O(1) bakes) in
  instance count;
* a skinned animation loop re-bakes only the animated geometry.
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
    """Counts host corner bakes (per-part and shared-object) and batched
    device transforms: {"part": [...], "obj": [...], "xform": [...]}"""
    calls = {"part": [], "obj": [], "xform": []}
    real_part = builder_mod._geometry_world_mesh
    real_obj = builder_mod._geometry_object_bake
    real_xform = builder_mod._transform_part_batched

    def counting_part(geom, transform):
        calls["part"].append(geom.handle)
        return real_part(geom, transform)

    def counting_obj(geom):
        calls["obj"].append(geom.handle)
        return real_obj(geom)

    def counting_xform(obj, matrices, instance_colors=None):
        calls["xform"].append(np.asarray(matrices).reshape(-1, 4, 4).shape[0])
        return real_xform(obj, matrices, instance_colors)

    monkeypatch.setattr(builder_mod, "_geometry_world_mesh", counting_part)
    monkeypatch.setattr(builder_mod, "_geometry_object_bake", counting_obj)
    monkeypatch.setattr(builder_mod, "_transform_part_batched", counting_xform)
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
    assert len(bake_counter["obj"]) == 2
    assert len(bake_counter["xform"]) == 2
    for k in bake_counter:
        bake_counter[k].clear()

    scene.upsert_material(10, version=1, properties=MaterialProperties(
        albedo_color=(0.1, 0.1, 0.9), roughness=0.2, metallic=0.8))
    assert scene.dirty
    second = scene.build()

    # zero host bakes AND zero device transforms
    assert bake_counter == {"part": [], "obj": [], "xform": []}
    # geometry buffers, BVH and trace tables are reused object-identically
    assert second.geometry is first.geometry
    assert second.bvh is first.bvh
    assert second.pallas_tris is first.pallas_tris
    # the material table did change
    assert not np.allclose(np.asarray(second.materials.albedo),
                           np.asarray(first.materials.albedo))


def test_transform_edit_retransforms_one_group(bake_counter):
    scene = _two_object_scene()
    scene.build()
    for k in bake_counter:
        bake_counter[k].clear()

    t = np.eye(4, dtype=np.float32)
    t[1, 3] = 0.5
    scene.upsert_instance(20, version=1, geometry=1, material=10, transform=t)
    second = scene.build()
    # the shared object bake is reused; only the moved instance's group
    # re-runs its (single-matrix) device transform
    assert bake_counter["obj"] == []
    assert bake_counter["part"] == []
    assert bake_counter["xform"] == [1]
    # the moved sphere's triangles actually moved
    assert float(np.asarray(second.geometry.v0[:, 1]).max()) > 0.4


def test_thousand_instances_share_one_bake(bake_counter):
    """TLAS-lite: N instances of one mesh cost one host corner bake and
    one batched device transform; moving one instance re-transforms only
    that group with zero host bakes."""
    scene = RayTracerScene()
    mesh = make_sphere(0.1, rings=4, sectors=6)
    scene.upsert_geometry(1, version=0, mesh=mesh)
    scene.upsert_material(10, version=0, properties=MaterialProperties(
        albedo_color=(0.5, 0.5, 0.5)))
    rng = np.random.default_rng(0)
    n = 1000
    for i in range(n):
        t = np.eye(4, dtype=np.float32)
        t[:3, 3] = rng.uniform(-5, 5, 3).astype(np.float32)
        scene.upsert_instance(100 + i, version=0, geometry=1, material=10,
                              transform=t)
    compiled = scene.build()
    assert bake_counter["obj"] == [1]  # ONE object bake for 1000 instances
    assert bake_counter["xform"] == [n]  # one batched transform
    assert bake_counter["part"] == []
    assert compiled.num_instances == n
    assert compiled.geometry.v0.shape[0] >= n * mesh.num_triangles
    for k in bake_counter:
        bake_counter[k].clear()

    # move one instance: zero host bakes, one group re-transform
    t = np.eye(4, dtype=np.float32)
    t[:3, 3] = (9.0, 9.0, 9.0)
    scene.upsert_instance(100, version=1, geometry=1, material=10,
                          transform=t)
    second = scene.build()
    assert bake_counter["obj"] == []
    assert bake_counter["part"] == []
    assert bake_counter["xform"] == [n]
    assert float(np.asarray(second.geometry.v0[:, 0]).max()) > 8.0


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
    for k in bake_counter:
        bake_counter[k].clear()

    for frame in range(1, 4):
        m = np.eye(4, dtype=np.float32)
        m[1, 3] = 0.1 * frame  # animate upward
        scene.upsert_geometry(
            3, version=frame, mesh=mesh, renderer_type=RendererType.SKINNED,
            bone_ids=bone_ids, bone_weights=bone_weights,
            bone_matrices=m[None],
        )
        compiled = scene.build()
        # only the skinned geometry re-baked this frame; the shared
        # static groups were not touched
        assert bake_counter["part"] == [3], bake_counter
        assert bake_counter["obj"] == []
        assert bake_counter["xform"] == []
        bake_counter["part"].clear()
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
    assert ("objbake", 2) not in scene._build_cache
    assert ("gworld", 2) not in scene._build_cache
    assert compiled.num_instances == 1


def test_refit_updates_rows_in_place_o_group(monkeypatch):
    """IAS-refit analog (ref RayTracer.cu:1618-1715): when ONLY shared-
    group transforms change, the ensemble updates IN PLACE — O(changed
    group) host bake + device row update, no host re-concat and no
    full-ensemble re-upload — and the derived tables re-pack on device
    from the updated buffers, so the compiled scene is value-identical
    to a from-scratch build. Exercised at canopy scale (>=1M triangles,
    the streaming-design claim) with a 4-plant group move."""
    # monkeypatch, NOT os.environ: a leaked knob here once flipped the
    # LBVH-skip decision inside a LATER test's scene build
    monkeypatch.setenv("RTF_TPU_PALLAS_BRUTE", "1")
    from raytracerfacility_tpu.scene.procedural import build_canopy_scene

    rows = cols = 52  # ~1.04M triangles
    scene = build_canopy_scene(rows=rows, cols=cols)
    first = scene.build()
    total = int(first.geometry.num_triangles)
    assert total >= 1_000_000

    # move ONE variant group (one scene instance holding ~650 plants);
    # geometry version unchanged => transforms-only edit
    t = np.eye(4, dtype=np.float32)
    t[0, 3] = 0.25
    inst = scene.instances[100]
    scene.upsert_instance(100, version=1, geometry=inst.geometry_key,
                          material=inst.material_key, transform=t)
    second = scene.build()
    stats = scene._build_cache.get("refit_stats")
    assert stats is not None and stats["refit"], stats
    # device pack work is O(group): only the moved group's rows updated
    assert 0 < stats["rows_updated"] < total
    assert stats["parts_changed"] == 1

    # value-identical to a from-scratch build of the same store
    fresh_scene = build_canopy_scene(rows=rows, cols=cols)
    fresh_scene.upsert_instance(100, version=1, geometry=inst.geometry_key,
                                material=inst.material_key, transform=t)
    fresh = fresh_scene.build()
    np.testing.assert_array_equal(np.asarray(second.geometry.v0),
                                  np.asarray(fresh.geometry.v0))
    np.testing.assert_array_equal(np.asarray(second.pallas_tris[0]),
                                  np.asarray(fresh.pallas_tris[0]))
    if second.fused is not None:
        np.testing.assert_array_equal(np.asarray(second.fused[0]),
                                      np.asarray(fresh.fused[0]))


def test_bvh_skipped_when_pallas_serves_all_consumers(monkeypatch):
    """On the Pallas-table path the LBVH's only consumer is the BSSRDF
    disk probe (models/pathtracer.py trace dispatch order), so scenes
    with no subsurface material skip the LBVH build entirely — its
    jitted build program costs several large remote compiles that would
    gate first-render latency for nothing. Subsurface materials must
    still force the build (renderer.py gates enable_subsurface on
    compiled.bvh)."""
    monkeypatch.setenv("RTF_TPU_PALLAS_BRUTE", "1")
    scene = _two_object_scene()
    compiled = scene.build()
    assert compiled.pallas_tris is not None
    assert compiled.bvh is None  # skipped: no subsurface consumer

    # flipping one material to subsurface must rebuild WITH the BVH
    # (the effective build_bvh rides the ensemble cache key)
    scene.begin_sync()
    scene.upsert_geometry(1, version=0, mesh=None)
    scene.upsert_geometry(2, version=0, mesh=None)
    scene.upsert_material(10, version=1, properties=MaterialProperties(
        albedo_color=(0.8, 0.2, 0.2), subsurface_factor=0.5,
        subsurface_radius=(0.1, 0.1, 0.1)))
    scene.upsert_material(11, version=0)
    scene.upsert_instance(20, version=0, geometry=1, material=10)
    scene.upsert_instance(21, version=0, geometry=2, material=11)
    scene.end_sync()
    compiled2 = scene.build()
    assert compiled2.bvh is not None

    # with the Pallas table disabled the walker is a live consumer:
    # never skip
    monkeypatch.setenv("RTF_TPU_PALLAS_BRUTE", "0")
    scene2 = _two_object_scene()
    compiled3 = scene2.build()
    assert compiled3.pallas_tris is None
    assert compiled3.bvh is not None


def test_denormalized_bake_ceiling_error():
    """Past the denormalized-bake HBM ceiling the builder must fail fast
    (BEFORE any host bake) with the shared-instancing remedy, not an OOM
    mid-build (the reference's shared-BLAS design has no such ceiling,
    ref RayTracer.cu:1618-1715; ours trades it for SMEM-friendly flat
    tables and offers compile_shared_instanced instead)."""
    import numpy as np
    import pytest

    from raytracerfacility_tpu.enums import RendererType
    from raytracerfacility_tpu.scene import RayTracerScene
    from raytracerfacility_tpu.scene.mesh import make_sphere

    scene = RayTracerScene()
    mesh = make_sphere(0.5, rings=32, sectors=64)
    ntri = int(mesh.triangles.shape[0])
    n_inst = 128_000_000 // ntri + 2
    mats = np.tile(np.eye(4, dtype=np.float32), (n_inst, 1, 1))
    scene.upsert_geometry(1, version=0, mesh=mesh,
                          renderer_type=RendererType.INSTANCED,
                          instance_matrices=mats)
    scene.upsert_material(2, version=0)
    scene.upsert_instance(3, version=0, geometry=1, material=2)
    with pytest.raises(ValueError, match="compile_shared_instanced"):
        scene.build(build_bvh=False)
