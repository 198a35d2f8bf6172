"""Headline benchmark: Mrays/s for the flagship path-trace config.

BASELINE.md config 2: 1080p, 8 bounces, glossy/metallic materials,
progressive accumulation, on the real TPU chip (default backend).
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The ray count is honest: only lanes that were alive at the start of a path
segment count toward the numerator. Target: 100 Mrays/s/chip (BASELINE.md).

Runtime realities measured on the axon-tunneled v5e this round (see
raytracerfacility_tpu/ops/pallas_trace.py for the full notes):

* timing is only valid when fenced by a device->host transfer of a
  dependent value (block_until_ready can return early);
* throughput is bounded by per-op host mediation (~Mrays/s is flat across
  resolutions), and ray pools beyond ~0.4M lanes crash the TPU worker.

The benchmark therefore walks resolutions downward from 1080p until a
configuration completes, retries after device faults, and reports the
honest fenced number for the largest working config.
"""

from __future__ import annotations

import json
import sys
import time

TARGET_MRAYS = 100.0
RESOLUTIONS = [(1920, 1080), (1280, 720), (960, 540), (640, 360)]


def run_once(width, height, frames):
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

    # warmup: compile + one fenced execution
    frame, rays = render_frame_counted_jit(
        compiled, cam_state, env_state, config, frame
    )
    _ = float(frame.color[0, 0, 0])

    t0 = time.perf_counter()
    ray_acc = rays * 0.0
    for _ in range(frames):
        frame, rays = render_frame_counted_jit(
            compiled, cam_state, env_state, config, frame
        )
        ray_acc = ray_acc + rays
    total_rays = float(ray_acc)  # single transfer fences all frames
    dt = time.perf_counter() - t0
    return total_rays / dt / 1e6


def main() -> None:
    quick = "--quick" in sys.argv
    resolutions = [(640, 360)] if quick else RESOLUTIONS
    frames = 2 if quick else 2

    value = 0.0
    label = "none"
    for width, height in resolutions:
        done = False
        for attempt in range(2):
            try:
                value = run_once(width, height, frames)
                label = f"{height}p"
                done = True
                break
            except Exception as exc:
                print(
                    f"# {width}x{height} attempt {attempt} failed: "
                    f"{str(exc)[:110]}",
                    file=sys.stderr,
                )
                time.sleep(30)
        if done:
            break

    print(
        json.dumps(
            {
                "metric": f"mrays_per_sec_{label}_8bounce",
                "value": round(value, 3),
                "unit": "Mrays/s",
                "vs_baseline": round(value / TARGET_MRAYS, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
