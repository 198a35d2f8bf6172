"""End-to-end smoke: a Cornell-style scene renders without NaNs."""

import numpy as np

from raytracerfacility_tpu.models.renderer import (
    EnvironmentProperties,
    RayProperties,
    RayTracerCamera,
)
from raytracerfacility_tpu.scene import (
    MaterialProperties,
    RayTracerScene,
    make_cornell_box,
    make_cube,
)


def build_test_scene() -> RayTracerScene:
    scene = RayTracerScene()
    handle = 1
    for mesh, transform, color in make_cornell_box(2.0):
        scene.upsert_geometry(handle, version=0, mesh=mesh)
        scene.upsert_material(
            handle + 100,
            version=0,
            properties=MaterialProperties(albedo_color=color, roughness=1.0,
                                          metallic=0.0),
        )
        scene.upsert_instance(
            handle + 200, version=0, geometry=handle, material=handle + 100,
            transform=transform,
        )
        handle += 1
    cube = make_cube(0.6)
    t = np.eye(4, dtype=np.float32)
    t[:3, 3] = (0.0, 0.3, 0.0)
    scene.upsert_geometry(50, version=0, mesh=cube)
    scene.upsert_material(
        51, version=0,
        properties=MaterialProperties(albedo_color=(0.8, 0.7, 0.2),
                                      roughness=0.4, metallic=0.6),
    )
    scene.upsert_instance(52, version=0, geometry=50, material=51, transform=t)
    return scene


def test_render_smoke():
    scene = build_test_scene()
    cam = RayTracerCamera(scene)
    cam.camera.resize((64, 64))
    cam.camera.fov = 60.0
    cam.camera.look_at_target((0.0, 1.0, 2.6), (0.0, 0.8, 0.0))
    env = EnvironmentProperties(skylight_intensity=1.0)
    img = cam.render(env, RayProperties(bounces=2, samples=1), build_bvh=False)
    assert img.shape == (64, 64, 4)
    assert np.all(np.isfinite(img))
    assert img[..., :3].max() > 0.05  # something lit
    assert img[..., 3].min() == 1.0

    # progressive accumulation advances the frame id and keeps values finite
    img2 = cam.render(env, RayProperties(bounces=2, samples=1), build_bvh=False)
    assert int(cam.frame.frame_id) == 2
    assert np.all(np.isfinite(img2))


def test_aov_buffers():
    scene = build_test_scene()
    cam = RayTracerCamera(scene)
    cam.camera.resize((32, 32))
    cam.camera.fov = 60.0
    cam.camera.look_at_target((0.0, 1.0, 2.6), (0.0, 0.8, 0.0))
    env = EnvironmentProperties()
    cam.render(env, RayProperties(bounces=1, samples=1), build_bvh=False)
    bufs = cam.buffers()
    # normals are unit-ish where geometry was hit
    lengths = np.linalg.norm(bufs["normal"][..., :3], axis=-1)
    hit = lengths > 0.5
    assert hit.any()
    np.testing.assert_allclose(lengths[hit], 1.0, atol=1e-3)


def test_samples_in_lanes_matches_statistics():
    """Lane-folded spp (one big ray pool) converges to the same image as the
    sequential spp scan."""
    import dataclasses

    import jax.numpy as jnp

    from raytracerfacility_tpu.models.pathtracer import (
        RenderConfig,
        init_frame,
        render_frame_jit,
    )

    scene = build_test_scene()
    compiled = scene.build(build_bvh=False)
    from raytracerfacility_tpu.ops.camera import CameraProperties

    cam = CameraProperties(fov=90.0, size=(32, 32))
    cam.look_at_target((0.0, 1.0, 2.4), (0.0, 0.9, 0.0))
    env = EnvironmentProperties().state()
    cfg = RenderConfig(width=32, height=32, bounces=2, samples=4)
    seq = render_frame_jit(compiled, cam.state(), env, cfg, init_frame(32, 32))
    lane_cfg = dataclasses.replace(cfg, samples_in_lanes=True)
    lane = render_frame_jit(compiled, cam.state(), env, lane_cfg, init_frame(32, 32))
    a = np.asarray(seq.color[..., :3])
    b = np.asarray(lane.color[..., :3])
    assert np.isfinite(b).all()
    assert abs(a.mean() - b.mean()) < 0.05


def test_static_shading_specialization_matches():
    """Disabling texture/vertex-color fetches for a scene that binds none
    must not change the image (same semantics, fewer executed ops)."""
    import dataclasses

    from raytracerfacility_tpu.models.pathtracer import (
        RenderConfig,
        init_frame,
        render_frame_jit,
    )
    from raytracerfacility_tpu.ops.camera import CameraProperties

    scene = build_test_scene()
    compiled = scene.build(build_bvh=False)
    cam = CameraProperties(fov=60.0, size=(16, 16))
    cam.look_at_target((0.0, 1.0, 2.6), (0.0, 0.8, 0.0))
    env = EnvironmentProperties().state()
    cfg = RenderConfig(width=16, height=16, bounces=2, samples=1)
    full = render_frame_jit(compiled, cam.state(), env, cfg, init_frame(16, 16))
    lean_cfg = dataclasses.replace(
        cfg, enable_textures=False, enable_vertex_color=False
    )
    lean = render_frame_jit(
        compiled, cam.state(), env, lean_cfg, init_frame(16, 16)
    )
    np.testing.assert_array_equal(
        np.asarray(full.color), np.asarray(lean.color)
    )
    np.testing.assert_array_equal(
        np.asarray(full.normal), np.asarray(lean.normal)
    )
