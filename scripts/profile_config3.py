"""Decompose BENCH config 3 (BTF sphere, 256x256, 2 bounces) frame time
on the real chip: whole frame vs trace-only vs BTF decode-only, each
fenced by a dependent device scalar (PERF.md measurement rule).

Run: python scripts/profile_config3.py
"""

import time

import jax
import jax.numpy as jnp


def fence(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].reshape(-1)[:1]))


def tm(fn, *args, n=5):
    fence(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        fence(fn(*args))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    from raytracerfacility_tpu.enums import MaterialType
    from raytracerfacility_tpu.models.pathtracer import (
        RenderConfig, init_frame, render_frame_counted_jit)
    from raytracerfacility_tpu.models.renderer import EnvironmentProperties
    from raytracerfacility_tpu.ops.camera import CameraProperties
    from raytracerfacility_tpu.scene import (
        MaterialProperties, RayTracerScene, make_sphere)
    from raytracerfacility_tpu.mlvq.synthetic import synthetic_btf

    scene = RayTracerScene()
    scene.upsert_geometry(1, version=0, mesh=make_sphere(0.6, rings=24,
                                                         sectors=48))
    scene.upsert_material(2, version=0,
                          material_type=MaterialType.COMPRESSED_BTF,
                          btf=synthetic_btf(seed=2))
    scene.upsert_instance(3, version=0, geometry=1, material=2)
    cam = CameraProperties(fov=60.0, size=(256, 256))
    cam.look_at_target((0.0, 0.4, 2.2), (0.0, 0.0, 0.0))
    compiled = scene.build()
    cam_state = cam.state()
    env_state = EnvironmentProperties().state()
    config = RenderConfig(width=256, height=256, bounces=2, samples=1,
                          enable_btf=True)
    frame = init_frame(256, 256)

    def whole(frame):
        f, rays = render_frame_counted_jit(compiled, cam_state, env_state,
                                           config, frame)
        return f.color

    print("frame (btf, 2 bounces):", tm(whole, frame), "ms", flush=True)

    # same frame without BTF (Default material) — isolates the decode
    scene2 = RayTracerScene()
    scene2.upsert_geometry(1, version=0, mesh=make_sphere(0.6, rings=24,
                                                          sectors=48))
    scene2.upsert_material(2, version=0, properties=MaterialProperties(
        albedo_color=(0.7, 0.7, 0.7), roughness=1.0, metallic=0.0))
    scene2.upsert_instance(3, version=0, geometry=1, material=2)
    compiled2 = scene2.build()
    cfg2 = RenderConfig(width=256, height=256, bounces=2, samples=1,
                        enable_textures=False, enable_vertex_color=False)

    def whole2(frame):
        f, rays = render_frame_counted_jit(compiled2, cam_state, env_state,
                                           cfg2, frame)
        return f.color

    print("frame (default mat, fast path eligible):", tm(whole2, frame),
          "ms", flush=True)

    # wavefront engine forced on the default-material scene (config toggles
    # kill fused eligibility) — isolates engine difference from decode
    cfg3 = RenderConfig(width=256, height=256, bounces=2, samples=1,
                        enable_textures=True, enable_vertex_color=False)

    def whole3(frame):
        f, rays = render_frame_counted_jit(compiled2, cam_state, env_state,
                                           cfg3, frame)
        return f.color

    print("frame (default mat, wavefront engine):", tm(whole3, frame),
          "ms", flush=True)

    # raw pallas trace on a 65k pool, 4.4k-tri sphere (one segment)
    from raytracerfacility_tpu.ops.pallas_brute import trace_closest_pallas

    r = 256 * 256
    key = jax.random.PRNGKey(0)
    o = jnp.zeros((r, 3), jnp.float32) + jnp.asarray([0.0, 0.4, 2.2])
    d = jax.random.normal(key, (r, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    tmin = jnp.zeros((r,), jnp.float32)
    tmax = jnp.full((r,), 1e20, jnp.float32)

    def trace(o, d):
        return trace_closest_pallas(compiled2.pallas_tris, o, d, tmin, tmax).t

    print("pallas trace, 65k random rays:", tm(trace, o, d), "ms", flush=True)

    # BTF decode alone on 65k queries
    from raytracerfacility_tpu.mlvq.btf import btf_get_value

    tbl = compiled.btf[0]
    uv = jax.random.uniform(key, (r, 2))
    ang = jax.random.uniform(jax.random.fold_in(key, 1), (r, 4))

    @jax.jit
    def decode(uv, ang):
        return btf_get_value(tbl, uv, ang[:, 0], ang[:, 1] * 6.28,
                             ang[:, 2], ang[:, 3] * 6.28)

    print("btf decode, 65k queries:", tm(decode, uv, ang), "ms", flush=True)


if __name__ == "__main__":
    main()
