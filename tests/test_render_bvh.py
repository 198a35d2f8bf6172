"""Renders through the BVH path must match the brute-force oracle path
bit-for-bit (same RNG streams, same shading — only traversal differs)."""

import numpy as np

from raytracerfacility_tpu.models.renderer import (
    EnvironmentProperties,
    RayProperties,
    RayTracerCamera,
)
from tests.test_smoke import build_test_scene


def test_bvh_render_matches_bruteforce():
    env = EnvironmentProperties()
    ray = RayProperties(bounces=3, samples=2)

    imgs = {}
    for use_bvh in (False, True):
        scene = build_test_scene()
        cam = RayTracerCamera(scene)
        cam.camera.resize((48, 48))
        cam.camera.fov = 90.0
        cam.camera.look_at_target((0.0, 1.0, 2.4), (0.0, 0.9, 0.0))
        imgs[use_bvh] = cam.render(env, ray, build_bvh=use_bvh)

    np.testing.assert_allclose(imgs[True], imgs[False], atol=2e-5)
