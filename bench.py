"""Headline benchmark: Mrays/s for the flagship path-trace config.

BASELINE.md config 2: 1080p, 8 bounces, glossy/metallic materials,
progressive accumulation, on the real TPU chip (default backend).
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The ray count is honest: only lanes that were alive at the start of a path
segment count toward the numerator (masked-out lanes do occupy VPU slots,
but Mrays/s conventionally counts useful rays). Target: 100 Mrays/s/chip
(BASELINE.md rebuild target).
"""

from __future__ import annotations

import json
import sys
import time

TARGET_MRAYS = 100.0


def main() -> None:
    quick = "--quick" in sys.argv
    width, height = (640, 360) if quick else (1920, 1080)
    frames = 3 if quick else 5

    import jax

    from __graft_entry__ import _bench_scene
    from raytracerfacility_tpu.models.pathtracer import (
        RenderConfig,
        init_frame,
        render_frame_counted_jit,
    )

    scene, cam, env = _bench_scene(width, height)
    compiled = scene.build()
    config = RenderConfig(width=width, height=height, bounces=8, samples=1)
    cam_state = cam.state()
    env_state = env.state()
    frame = init_frame(width, height)

    # Warmup + compile-quality check. The remote TPU compile service
    # occasionally returns a pathologically unoptimized executable (same
    # program, 1000x slower); detect it by timing one frame and re-roll the
    # compile (clear_caches) until sane or out of attempts.
    budget_ms = (width * height) / 1000.0  # ~1 us per pixel is "sane"
    for attempt in range(4):
        frame_try, rays = render_frame_counted_jit(
            compiled, cam_state, env_state, config, frame
        )
        jax.block_until_ready(frame_try.color)
        t0 = time.perf_counter()
        frame_try, rays = render_frame_counted_jit(
            compiled, cam_state, env_state, config, frame_try
        )
        jax.block_until_ready(frame_try.color)
        frame_ms = (time.perf_counter() - t0) * 1e3
        if frame_ms < budget_ms or attempt == 3:
            frame = frame_try
            break
        print(
            f"# slow executable ({frame_ms:.0f} ms/frame > {budget_ms:.0f}), "
            f"re-rolling compile (attempt {attempt + 1})",
            file=sys.stderr,
        )
        jax.clear_caches()

    total_rays = 0.0
    t0 = time.perf_counter()
    for _ in range(frames):
        frame, rays = render_frame_counted_jit(
            compiled, cam_state, env_state, config, frame
        )
        total_rays += float(rays)
    jax.block_until_ready(frame.color)
    elapsed = time.perf_counter() - t0

    mrays = total_rays / elapsed / 1e6
    print(
        json.dumps(
            {
                "metric": "mrays_per_sec_1080p_8bounce"
                if not quick
                else "mrays_per_sec_360p_8bounce",
                "value": round(mrays, 3),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / TARGET_MRAYS, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
