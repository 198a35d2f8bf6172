"""Render the pinned 2048-spp converged clean target for the denoiser
quality gate (exact gate pose from tests/test_denoiser_quality.py)."""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

from raytracerfacility_tpu.models.pathtracer import (
    RenderConfig, init_frame, render_frame_jit)
from raytracerfacility_tpu.models.renderer import EnvironmentProperties
from raytracerfacility_tpu.ops.camera import CameraProperties
from tests.test_smoke import build_test_scene

compiled = build_test_scene().build()
cam = CameraProperties(fov=75.0, size=(96, 96))
cam.look_at_target((-1.3, 1.7, 1.9), (0.2, 0.6, 0.0))  # THE GATE POSE
env = EnvironmentProperties().state()
cfg = RenderConfig(width=96, height=96, bounces=3, samples=256,
                   accumulate=True, enable_textures=False,
                   enable_vertex_color=False)
frame = init_frame(96, 96)
t0 = time.time()
for k in range(8):  # 8 frames x 256 spp accumulated = 2048 spp
    frame = render_frame_jit(compiled, cam.state(), env, cfg, frame)
    print("frame", k, float(frame.color[0, 0, 0]),
          f"{time.time()-t0:.0f}s", flush=True)
img = np.asarray(frame.color[..., :3])
np.save("/root/repo/tests/goldens/denoiser_clean_96.npy",
        img.astype(np.float32))
print("saved", img.shape, img.mean())
