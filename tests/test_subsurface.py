"""BSSRDF: same-instance collect traversal + end-to-end subsurface render."""

import jax.numpy as jnp
import numpy as np

from raytracerfacility_tpu.models.renderer import (
    EnvironmentProperties,
    RayProperties,
    RayTracerCamera,
)
from raytracerfacility_tpu.ops.bvh import build_bvh
from raytracerfacility_tpu.ops.intersect import moller_trumbore
from raytracerfacility_tpu.ops.traverse import trace_collect_same_instance
from raytracerfacility_tpu.scene import (
    MaterialProperties,
    RayTracerScene,
    make_sphere,
)


def test_collect_same_instance_matches_oracle():
    rng = np.random.default_rng(0)
    n = 200
    v0 = jnp.asarray(rng.uniform(-2, 2, (n, 3)), jnp.float32)
    e1 = jnp.asarray(rng.normal(0, 0.5, (n, 3)), jnp.float32)
    e2 = jnp.asarray(rng.normal(0, 0.5, (n, 3)), jnp.float32)
    instance = jnp.asarray(rng.integers(0, 3, n), jnp.int32)
    bvh = build_bvh(v0, e1, e2, leaf_size=4, instance=instance)

    r = 64
    o = jnp.asarray(rng.uniform(-3, 3, (r, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(0, 1, (r, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    want_inst = jnp.asarray(rng.integers(0, 3, r), jnp.int32)
    tmin, tmax = jnp.float32(1e-3), jnp.float32(10.0)

    count, _, prim, _, _ = trace_collect_same_instance(
        bvh, o, d, tmin, tmax, want_inst, max_hits=4
    )

    valid, t, _, _ = moller_trumbore(o, d, v0, e1, e2, tmin, tmax)
    inst_np = np.asarray(instance)
    for i in range(r):
        hits = np.nonzero(
            np.asarray(valid[i]) & (inst_np == int(want_inst[i]))
        )[0]
        expect = min(len(hits), 4)
        assert int(count[i]) == expect, (i, int(count[i]), expect)
        got = set(int(p) for p in np.asarray(prim[i])[: int(count[i])])
        assert got.issubset(set(hits.tolist()))


def test_subsurface_render():
    scene = RayTracerScene()
    sphere = make_sphere(0.5, rings=12, sectors=24)
    scene.upsert_geometry(1, version=0, mesh=sphere)
    scene.upsert_material(
        2, version=0,
        properties=MaterialProperties(
            albedo_color=(0.9, 0.4, 0.3),
            roughness=0.8,
            metallic=0.1,
            subsurface_factor=0.7,
            subsurface_radius=(0.3, 0.3, 0.3),
            subsurface_color=(1.0, 0.6, 0.5),
        ),
    )
    scene.upsert_instance(3, version=0, geometry=1, material=2)

    cam = RayTracerCamera(scene)
    cam.camera.resize((32, 32))
    cam.camera.fov = 60.0
    cam.camera.look_at_target((0.0, 0.3, 1.6), (0.0, 0.0, 0.0))
    env = EnvironmentProperties()
    img = cam.render(env, RayProperties(bounces=3, samples=2))
    assert np.isfinite(img).all()
    assert img[..., :3].std() > 0.01

    # same scene without subsurface gives a different image (the SS path
    # actually executes)
    scene2 = RayTracerScene()
    scene2.upsert_geometry(1, version=0, mesh=sphere)
    scene2.upsert_material(
        2, version=0,
        properties=MaterialProperties(
            albedo_color=(0.9, 0.4, 0.3), roughness=0.8, metallic=0.1,
        ),
    )
    scene2.upsert_instance(3, version=0, geometry=1, material=2)
    cam2 = RayTracerCamera(scene2)
    cam2.camera.resize((32, 32))
    cam2.camera.fov = 60.0
    cam2.camera.look_at_target((0.0, 0.3, 1.6), (0.0, 0.0, 0.0))
    img2 = cam2.render(env, RayProperties(bounces=3, samples=2))
    assert np.abs(img[..., :3] - img2[..., :3]).max() > 0.01


def test_zero_factor_split_is_inactive():
    """The stochastic subsurface split (documented deviation: the
    reference forks each first hit deterministically into both branches,
    RayFunctions.cuh:96-133; the wavefront engine samples the branch) is
    provably inactive at subsurface_factor == 0: the image must equal the
    subsurface-disabled render bit for bit — the selection draw exists
    but no lane commits it."""
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from raytracerfacility_tpu.models.pathtracer import (
        RenderConfig, init_frame, render_frame_jit)
    from raytracerfacility_tpu.models.renderer import EnvironmentProperties
    from raytracerfacility_tpu.ops.camera import CameraProperties
    from raytracerfacility_tpu.scene import (
        MaterialProperties, RayTracerScene, make_sphere)

    scene = RayTracerScene()
    scene.upsert_geometry(1, version=0, mesh=make_sphere(0.5, rings=8,
                                                         sectors=12))
    scene.upsert_material(2, version=0, properties=MaterialProperties(
        albedo_color=(0.8, 0.5, 0.4), roughness=0.7, metallic=0.0,
        subsurface_factor=0.0, subsurface_radius=(0.2, 0.2, 0.2)))
    scene.upsert_instance(3, version=0, geometry=1, material=2)
    compiled = scene.build(build_bvh=True)
    cam = CameraProperties(fov=70.0, size=(24, 24))
    cam.look_at_target((0.0, 0.3, 1.6), (0.0, 0.0, 0.0))
    env = EnvironmentProperties().state()
    base = RenderConfig(width=24, height=24, bounces=2, samples=1,
                        enable_textures=False, enable_vertex_color=False)
    f = dataclasses.replace(init_frame(24, 24), frame_id=jnp.int32(3))
    on = render_frame_jit(compiled, cam.state(), env,
                          dataclasses.replace(base, enable_subsurface=True),
                          f)
    off = render_frame_jit(compiled, cam.state(), env, base, f)
    # the two configs compile to different programs, so XLA fusion may
    # reassociate a float op here and there — float noise only
    np.testing.assert_allclose(np.asarray(on.color), np.asarray(off.color),
                               atol=1e-6)
