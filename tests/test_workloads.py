"""Illumination estimator + LiDAR workloads (launch types 2 and 3)."""

import numpy as np

from raytracerfacility_tpu.enums import EnvironmentalLightingType
from raytracerfacility_tpu.models.illumination import TriangleIlluminationEstimator
from raytracerfacility_tpu.models.lidar import PointCloudScanner
from raytracerfacility_tpu.models.pathtracer import RenderConfig
from raytracerfacility_tpu.models.renderer import EnvironmentProperties
from raytracerfacility_tpu.scene import (
    MaterialProperties,
    RayTracerScene,
    make_plane,
)


def simple_scene():
    """A ground plane under a uniform white sky."""
    scene = RayTracerScene()
    plane = make_plane(4.0)
    scene.upsert_geometry(1, version=0, mesh=plane)
    scene.upsert_material(
        2, version=0,
        properties=MaterialProperties(albedo_color=(0.5, 0.5, 0.5),
                                      roughness=1.0, metallic=0.0),
    )
    scene.upsert_instance(3, version=0, geometry=1, material=2,
                          entity_handle=0xDEADBEEF12345)
    return scene, plane


def test_illumination_estimator():
    # a small probe plane floating at y=1 above a large *black* ground plane:
    # the front face sees the white sky, the back face sees only the dark
    # ground, so energy and dominant direction are directional.
    scene = RayTracerScene()
    ground = make_plane(40.0)
    scene.upsert_geometry(1, version=0, mesh=ground)
    scene.upsert_material(
        2, version=0,
        properties=MaterialProperties(albedo_color=(0.0, 0.0, 0.0),
                                      roughness=1.0, metallic=0.0),
    )
    scene.upsert_instance(3, version=0, geometry=1, material=2)
    probe_plane = make_plane(1.0)
    lift = np.eye(4, dtype=np.float32)
    lift[:3, 3] = (0.0, 1.0, 0.0)
    scene.upsert_geometry(4, version=0, mesh=probe_plane)
    scene.upsert_material(5, version=0, properties=MaterialProperties())
    scene.upsert_instance(6, version=0, geometry=4, material=5, transform=lift)
    compiled = scene.build()

    env = EnvironmentProperties(skylight_intensity=1.0).state()
    cfg = RenderConfig(bounces=2, samples=32)

    est = TriangleIlluminationEstimator()
    probes = est.prepare_light_probe_group([(probe_plane, lift)])
    assert probes.num_probes == probe_plane.num_triangles
    # area: plane 1x1 = 1, front+back counted => 2
    np.testing.assert_allclose(est.total_area, 2.0, rtol=1e-5)

    est.sample_light_probe_group(compiled, env, cfg, seed=1)
    energy = np.asarray(est.probes.energy)
    assert np.all(np.isfinite(energy))
    # front face: env=1 with |N.L| weighting (mean 0.5 over uniform dirs),
    # back face ~0 (black ground) => probe mean over both faces ~0.25
    assert 0.1 < energy.mean() < 0.45
    dirs = np.asarray(est.probes.direction)
    # dominant direction points up (light comes from the sky)
    assert dirs[:, 1].mean() > 0.5

    # vertex bake writes colors
    colors = est.color_descendents_vertices()
    assert colors[0].shape == (probe_plane.num_vertices, 4)
    assert np.all(np.isfinite(colors[0]))


def test_lidar_scan():
    scene, _ = simple_scene()
    compiled = scene.build()
    scanner = PointCloudScanner(size=(2.0, 2.0), distance=(0.1, 0.1))
    # scanner above the plane, looking straight down (front = -Z rotated to -Y):
    # quaternion for rotating -Z to -Y is a -90 deg rotation about X
    angle = -np.pi / 2
    q = np.array([np.cos(angle / 2), np.sin(angle / 2), 0.0, 0.0], np.float32)
    hits = scanner.scan(compiled, position=(0.0, 1.5, 0.0), rotation=q)
    assert hits > 300  # 20x20 grid over a 2x2 window above a 4x4 plane
    pts = scanner.points
    # all hits on the plane y=0, scanner-relative y = -1.5
    np.testing.assert_allclose(pts[:, 1], -1.5, atol=1e-3)
    assert np.all(scanner.handles == np.uint64(0xDEADBEEF12345))
    # misses are filtered out; colors carried through
    assert scanner.point_colors.shape == (hits, 4)


def test_lidar_rotated_beam():
    scene, _ = simple_scene()
    compiled = scene.build()
    scanner = PointCloudScanner(size=(1.0, 1.0), distance=(0.25, 0.25),
                                rotate_angle=30.0)
    angle = -np.pi / 2
    q = np.array([np.cos(angle / 2), np.sin(angle / 2), 0.0, 0.0], np.float32)
    hits = scanner.scan(compiled, position=(0.0, 1.0, 0.0), rotation=q)
    assert hits > 0
    # tilted beams land offset from the grid x positions
    assert np.abs(scanner.points[:, 0]).max() > 0.5
