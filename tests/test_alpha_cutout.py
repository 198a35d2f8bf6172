"""Alpha cutout continuation is effectively unbounded.

The reference's anyhit rejects any number of transparent hits along one
ray (ref RayFunctions.cuh:5-23 — optixIgnoreIntersection in-traversal).
Round 1 capped the wavefront equivalent at 2 extra segments, so a ray
crossing >= 3 cutout surfaces died early; the segment loop is now a
while-loop with a 32-segment cutout budget. Dense foliage is the
motivating domain: this test stacks 6 fully transparent quads in front of
an emissive backstop and requires every camera ray to reach it.
"""

import numpy as np

from raytracerfacility_tpu.models.renderer import (
    EnvironmentProperties,
    RayProperties,
    RayTracerCamera,
)
from raytracerfacility_tpu.scene import (
    MaterialProperties,
    RayTracerScene,
    make_plane,
)


def _stacked_cutout_scene(num_layers: int):
    scene = RayTracerScene()
    # fully transparent 2x2 texture (alpha = 0 everywhere)
    clear = np.zeros((2, 2, 4), np.float32)
    clear[..., :3] = 0.5
    scene.upsert_material(
        1, version=0,
        properties=MaterialProperties(albedo_color=(0.5, 0.5, 0.5),
                                      roughness=1.0, metallic=0.0),
        albedo_texture=clear,
    )
    # opaque emissive red backstop
    scene.upsert_material(
        2, version=0,
        properties=MaterialProperties(albedo_color=(1.0, 0.1, 0.1),
                                      roughness=1.0, metallic=0.0,
                                      emission=2.0),
    )
    plane = make_plane(4.0)
    for k in range(num_layers):
        t = np.eye(4, dtype=np.float32)
        t[1, 3] = 1.0 + 0.2 * k  # stacked layers facing +Y
        scene.upsert_geometry(10 + k, version=0, mesh=plane)
        scene.upsert_instance(100 + k, version=0, geometry=10 + k,
                              material=1, transform=t)
    scene.upsert_geometry(50, version=0, mesh=plane)  # backstop at y=0
    scene.upsert_instance(150, version=0, geometry=50, material=2)
    return scene


def test_ray_crosses_six_cutout_layers():
    scene = _stacked_cutout_scene(6)
    cam = RayTracerCamera(scene)
    cam.camera.resize((8, 8))
    cam.camera.fov = 40.0
    cam.camera.look_at_target((0.0, 4.0, 0.01), (0.0, 0.0, 0.0))
    img = cam.render(EnvironmentProperties(skylight_intensity=0.0),
                     RayProperties(bounces=1, samples=1))
    albedo = np.asarray(cam.buffers()["albedo"])[..., :3]
    # every pixel's first *accepted* hit is the red backstop: all six
    # transparent layers were rejected and re-traced past
    assert (albedo[..., 0] > 0.9).all(), albedo[..., 0]
    assert (albedo[..., 1] < 0.2).all()
    # and the emissive backstop actually lights the image
    assert float(np.asarray(img)[..., 0].mean()) > 0.5
