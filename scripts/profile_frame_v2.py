"""Marginal per-segment cost of the REAL segmented engine (windowed
sorts + windowed trace grid) at 1080p/8-bounce: time the fully-jitted
``render_pool_sorted`` at bounces = 0..8 and difference consecutive
readings. diff(k) = one windowed reorder + one windowed bounce segment
+ (flat) env shade — everything the engine actually runs, in the same
XLA program it actually runs in (the older profile_seg_frame.py times
UNWINDOWED parts piecewise, overstating the reorder).

Each timing is fenced by a device->host scalar readback of a dependent
value (PERF.md measurement rules).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_frame_v2.py
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_rtf")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp


def main():
    from __graft_entry__ import _bench_scene
    from raytracerfacility_tpu.models.pathtracer import (
        generate_camera_rays, lcg_init)
    from raytracerfacility_tpu.ops import pallas_seg as seg

    W, H, MAXB = 1920, 1080, 8
    scene, camprops, envprops = _bench_scene(W, H)
    compiled = scene.build()
    cam = camprops.state()
    table, sub_aabbs, chunk_aabbs, mat_table = compiled.fused
    chunk = compiled.fused_chunk or seg.TRI_CHUNK

    iy, ix = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    pixel_index = (ix + W * iy).astype(jnp.uint32)
    rng0 = lcg_init(pixel_index[None],
                    jnp.broadcast_to(jnp.uint32(0), (1, H, W)))
    rng0, origin, direction = generate_camera_rays(
        cam, rng0, ix[None], iy[None], W, H)
    r = W * H
    origin = origin.reshape(r, 3)
    direction = direction.reshape(r, 3)
    rng = rng0.reshape(r)
    valid = jnp.ones((r,), jnp.float32)
    env_rgb = jnp.zeros((16,), jnp.float32).at[0:3].set(0.3)
    # primary tmin rides in env_vec[10]; 0 for camera rays (already 0)

    def run(bounces, n=3):
        def once():
            rad, nrm, alb, pos, live = seg.render_pool_sorted(
                (table, sub_aabbs, chunk_aabbs, mat_table), origin,
                direction, rng, valid, env_rgb, bounces=bounces,
                chunk=chunk)
            return rad, live
        rad, live = once()  # compile + warm
        _ = float(rad[0, 0])
        t0 = time.perf_counter()
        for _ in range(n):
            rad, live = once()
            _ = float(rad[0, 0])
        dt = (time.perf_counter() - t0) / n * 1e3
        return dt, float(live)

    base = jnp.zeros((4,), jnp.float32)
    _ = float((base + 1.0)[0])
    t0 = time.perf_counter()
    for _ in range(5):
        _ = float((base + 1.0)[0])
    fence_ms = (time.perf_counter() - t0) / 5 * 1e3
    print(f"fence overhead: {fence_ms:.1f} ms", flush=True)

    prev = None
    prev_live = 0.0
    for b in range(0, MAXB + 1):
        dt, live = run(b)
        seg_live = live - prev_live
        line = (f"bounces={b}: total {dt - fence_ms:7.1f} ms | "
                f"live rays {live / 1e6:6.2f} M")
        if prev is not None:
            line += (f" | marginal seg {b}: {dt - prev:6.1f} ms, "
                     f"{seg_live / 1e6:5.2f} M live "
                     f"({seg_live / r * 100:4.1f}%)")
        print(line, flush=True)
        prev = dt
        prev_live = live


if __name__ == "__main__":
    main()
