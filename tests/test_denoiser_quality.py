"""Shipped denoiser checkpoint quality gate.

The reference ships a working denoiser (OptiX, ref RayTracer.cu:508-556);
this framework ships scripts/train_denoiser.py's checkpoint. The gate:
denoising a 1-spp frame must land meaningfully closer (SSIM) to a
high-spp clean render than the noisy input does, on a camera pose that
was NOT in the training set.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from raytracerfacility_tpu.models.denoiser import default_denoiser
from raytracerfacility_tpu.models.pathtracer import (
    RenderConfig,
    init_frame,
    render_frame_jit,
)
from raytracerfacility_tpu.models.renderer import EnvironmentProperties
from raytracerfacility_tpu.ops.camera import CameraProperties
from raytracerfacility_tpu.utils.image import ssim
from tests.test_smoke import build_test_scene


def test_packaged_denoiser_beats_noisy_input():
    den = default_denoiser()
    if den is None:
        pytest.fail("no packaged denoiser checkpoint "
                    "(run scripts/train_denoiser.py)")

    compiled = build_test_scene().build()
    cam = CameraProperties(fov=75.0, size=(96, 96))
    # held-out pose (training used (0,1,2.4)/(1.5,1.2,1.8)-style poses)
    cam.look_at_target((-1.3, 1.7, 1.9), (0.2, 0.6, 0.0))
    env = EnvironmentProperties().state()
    base = RenderConfig(width=96, height=96, bounces=3, samples=1,
                        accumulate=False, enable_textures=False,
                        enable_vertex_color=False)

    noisy = render_frame_jit(
        compiled, cam.state(), env, base,
        dataclasses.replace(init_frame(96, 96), frame_id=jnp.int32(31)))
    clean_cfg = dataclasses.replace(base, samples=32)
    clean = render_frame_jit(
        compiled, cam.state(), env, clean_cfg,
        dataclasses.replace(init_frame(96, 96), frame_id=jnp.int32(31)))

    denoised = np.asarray(den.denoise(
        noisy.color[..., :3], noisy.albedo[..., :3], noisy.normal[..., :3]))
    c = np.asarray(clean.color[..., :3])
    n = np.asarray(noisy.color[..., :3])

    s_noisy = ssim(n, c)
    s_den = ssim(denoised, c)
    assert np.isfinite(denoised).all()
    # must beat the noisy input by a clear margin
    assert s_den > s_noisy + 0.15, (s_noisy, s_den)
    assert s_den > 0.35, s_den
