"""Isolate the MLVQ decode cost inside the real batched 8-frame scan
(bench config 3's exact shape): full BTF config vs decode stubbed to
ones vs default-material wavefront. Fenced per PERF.md rules.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_btf_scan.py
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_rtf")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp


def fence(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].reshape(-1)[:1]))


def tm(fn, *args, n=3):
    fence(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        fence(fn(*args))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    from raytracerfacility_tpu.enums import MaterialType
    from raytracerfacility_tpu.models.pathtracer import (
        RenderConfig, init_frame, render_frames_counted_jit)
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
                          enable_btf=True, enable_textures=False,
                          enable_vertex_color=False)
    frame = init_frame(256, 256)

    def scan8(frame):
        f, rays = render_frames_counted_jit(compiled, cam_state, env_state,
                                            config, frame, 8)
        return f.color, rays

    out = scan8(frame)
    rays = float(out[1])
    ms = tm(scan8, frame)
    print(f"8-frame scan, BTF: {ms:.1f} ms  live rays {rays:.0f} "
          f"-> {rays / ms / 1e3:.2f} Mrays/s", flush=True)

    # stub the decode: same graph shape minus the PDF-chain gathers
    import raytracerfacility_tpu.mlvq.btf as btfmod
    real = btfmod.btf_get_value
    btfmod.btf_get_value = (
        lambda t, uv, it, ip, vt, vp: jnp.ones(uv.shape[:-1] + (3,),
                                               jnp.float32) * 128.0)
    try:
        jax.clear_caches()
        ms2 = tm(scan8, frame)
        print(f"8-frame scan, decode stubbed: {ms2:.1f} ms", flush=True)
    finally:
        btfmod.btf_get_value = real
        jax.clear_caches()

    # default-material wavefront (no BTF anywhere in the graph)
    scene2 = RayTracerScene()
    scene2.upsert_geometry(1, version=0, mesh=make_sphere(0.6, rings=24,
                                                          sectors=48))
    scene2.upsert_material(2, version=0, properties=MaterialProperties(
        albedo_color=(0.7, 0.7, 0.7), roughness=1.0, metallic=0.0))
    scene2.upsert_instance(3, version=0, geometry=1, material=2)
    compiled2 = scene2.build()
    cfg3 = RenderConfig(width=256, height=256, bounces=2, samples=1,
                        enable_textures=True, enable_vertex_color=False)

    def scan8d(frame):
        f, rays = render_frames_counted_jit(compiled2, cam_state, env_state,
                                            cfg3, frame, 8)
        return f.color, rays

    ms3 = tm(scan8d, frame)
    print(f"8-frame scan, default-mat wavefront: {ms3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
