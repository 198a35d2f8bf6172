"""Render the pinned converged clean targets for the denoiser quality
gate (exact gate poses from tests/test_denoiser_quality.py).

Usage: python scripts/render_denoiser_golden.py [scene ...]
scenes: cornell (2048 spp), strands, canopy (1024 spp each — both are
sun-lit outdoor scenes whose variance converges faster than the
emissive-box interior). Default: all three.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from raytracerfacility_tpu.models.pathtracer import (
    RenderConfig, init_frame, render_frame_jit)
from raytracerfacility_tpu.models.renderer import EnvironmentProperties
from raytracerfacility_tpu.ops.camera import CameraProperties

GOLDENS = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")


def _render(compiled, cam, spp_frames: int, out_name: str) -> None:
    env = EnvironmentProperties().state()
    cfg = RenderConfig(width=96, height=96, bounces=3, samples=256,
                       accumulate=True, enable_textures=False,
                       enable_vertex_color=False)
    frame = init_frame(96, 96)
    t0 = time.time()
    for k in range(spp_frames):  # spp_frames x 256 spp accumulated
        frame = render_frame_jit(compiled, cam.state(), env, cfg, frame)
        print("frame", k, float(frame.color[0, 0, 0]),
              f"{time.time()-t0:.0f}s", flush=True)
    img = np.asarray(frame.color[..., :3])
    path = os.path.join(GOLDENS, out_name)
    np.save(path, img.astype(np.float32))
    print("saved", path, img.shape, img.mean(), flush=True)


def cornell() -> None:
    from tests.test_smoke import build_test_scene

    cam = CameraProperties(fov=75.0, size=(96, 96))
    cam.look_at_target((-1.3, 1.7, 1.9), (0.2, 0.6, 0.0))  # THE GATE POSE
    _render(build_test_scene().build(), cam, 8, "denoiser_clean_96.npy")


def strands() -> None:
    from raytracerfacility_tpu.scene.procedural import build_strands_scene

    cam = CameraProperties(fov=55.0, size=(96, 96))
    cam.look_at_target((-1.2, 1.1, 1.8), (0.0, 0.5, 0.0))  # held-out pose
    _render(build_strands_scene(n_strands=600, seed=11).build(), cam, 4,
            "denoiser_clean_strands_96.npy")


def canopy() -> None:
    from raytracerfacility_tpu.scene.procedural import build_canopy_scene

    cam = CameraProperties(fov=60.0, size=(96, 96))
    cam.look_at_target((-1.3, 2.0, 1.8), (0.0, 0.4, 0.0))  # held-out pose
    _render(build_canopy_scene(rows=5, cols=5).build(), cam, 4,
            "denoiser_clean_canopy_96.npy")


if __name__ == "__main__":
    which = sys.argv[1:] or ["cornell", "strands", "canopy"]
    for name in which:
        {"cornell": cornell, "strands": strands, "canopy": canopy}[name]()
