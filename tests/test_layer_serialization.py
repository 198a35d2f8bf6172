"""RayTracerLayer sync semantics + YAML persistence round-trips."""

import numpy as np

from raytracerfacility_tpu.layer import (
    MaterialDesc,
    MeshRendererDesc,
    ParticlesDesc,
    RayTracerLayer,
)
from raytracerfacility_tpu.models.lidar import PointCloudScanner
from raytracerfacility_tpu.ops.camera import CameraProperties
from raytracerfacility_tpu.scene import MaterialProperties, make_cube, make_plane
from raytracerfacility_tpu.utils.serialization import (
    load_camera,
    load_cbtf,
    load_scanner,
    save_camera,
    save_cbtf,
    save_scanner,
)
from tests.test_mlvq import synthetic_btf


def make_components():
    mat = MaterialDesc(
        handle=100,
        properties=MaterialProperties(albedo_color=(0.8, 0.2, 0.2)),
    )
    mats = np.stack([np.eye(4, dtype=np.float32)] * 3)
    mats[1][:3, 3] = (1, 0, 0)
    mats[2][:3, 3] = (2, 0, 0)
    return [
        MeshRendererDesc(handle=1, mesh_handle=10, mesh=make_plane(2.0), material=mat),
        ParticlesDesc(
            handle=2, mesh_handle=11, mesh=make_cube(0.2),
            instance_matrices=mats, material=MaterialDesc(handle=101),
        ),
    ]


def test_layer_sync_versioning():
    layer = RayTracerLayer()
    comps = make_components()
    assert layer.sync(comps)  # first sync dirty
    compiled1 = layer.scene.build(build_bvh=False)
    assert not layer.scene.dirty

    # re-sync with unchanged versions: no dirt, same compiled object
    layer.sync(comps)
    assert not layer.scene.dirty
    assert layer.scene.build(build_bvh=False) is compiled1

    # bump one mesh version -> dirty rebuild
    comps[0].mesh_version = 1
    layer.sync(comps)
    assert layer.scene.dirty
    compiled2 = layer.scene.build(build_bvh=False)
    assert compiled2 is not compiled1

    # drop a component -> mark-sweep removes it
    layer.sync(comps[:1])
    assert layer.scene.dirty
    assert 2 not in layer.scene.instances
    assert 1 in layer.scene.instances


def test_layer_render():
    layer = RayTracerLayer()
    layer.sync(make_components())
    layer.scene_camera.camera.resize((16, 16))
    layer.scene_camera.camera.look_at_target((0, 2, 3), (0, 0, 0))
    cam2 = layer.register_camera(7)
    cam2.camera.resize((8, 8))
    cam2.camera.look_at_target((2, 1, 2), (0, 0, 0))
    images = layer.late_update()
    assert images[0].shape == (16, 16, 4)
    assert images[7].shape == (8, 8, 4)
    assert np.isfinite(images[0]).all() and np.isfinite(images[7]).all()


def test_camera_yaml_roundtrip(tmp_path):
    cam = CameraProperties(fov=42.0, aperture=0.02, focal_length=2.5,
                           gamma=1.8, max_distance=77.0, accumulate=False,
                           denoiser_strength=0.4, size=(320, 200))
    cam.set_pose((1, 2, 3), (0.9, 0.1, 0.0, 0.1))
    p = tmp_path / "camera.yml"
    save_camera(cam, str(p))
    loaded = load_camera(str(p))
    assert loaded.fov == cam.fov
    assert loaded.size == cam.size
    assert loaded.accumulate == cam.accumulate
    np.testing.assert_allclose(loaded.position, cam.position)
    np.testing.assert_allclose(loaded.rotation, cam.rotation)


def test_scanner_yaml_roundtrip(tmp_path):
    sc = PointCloudScanner(size=(3.0, 2.0), distance=(0.05, 0.1),
                           rotate_angle=15.0)
    p = tmp_path / "scanner.yml"
    save_scanner(sc, str(p))
    loaded = load_scanner(str(p))
    assert loaded.size == (3.0, 2.0)
    assert loaded.distance == (0.05, 0.1)
    assert loaded.rotate_angle == 15.0


def test_cbtf_roundtrip(tmp_path):
    data = synthetic_btf(seed=11)
    p = tmp_path / "mat.cbtf"
    save_cbtf(data, str(p))
    loaded = load_cbtf(str(p))
    assert loaded.num_of_beta == data.num_of_beta
    assert loaded.use_cos_beta == data.use_cos_beta
    assert loaded.hdr == data.hdr
    np.testing.assert_array_equal(loaded.pdf6_slices, data.pdf6_slices)
    np.testing.assert_allclose(loaded.pdf1_basis, data.pdf1_basis)
    np.testing.assert_allclose(loaded.beta_angles, data.beta_angles)

    # decode parity through the restored database
    import jax.numpy as jnp

    from raytracerfacility_tpu.mlvq.btf import btf_get_value, table_from_data

    uv = jnp.array([[0.3, 0.7]])
    args = (jnp.array([30.0]), jnp.array([120.0]), jnp.array([45.0]),
            jnp.array([200.0]))
    np.testing.assert_allclose(
        np.asarray(btf_get_value(table_from_data(data), uv, *args)),
        np.asarray(btf_get_value(table_from_data(loaded), uv, *args)),
        rtol=1e-6,
    )
