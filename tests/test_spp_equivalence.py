"""Statistical equivalence of the two spp layouts.

The reference draws every sample of a pixel from ONE sequential RNG
stream (ptx/CameraRendering.cu:42-110). The wavefront engine offers two
layouts: the sequential scan (bit-faithful to the reference) and
``samples_in_lanes`` (each sample gets its own TEA-decorrelated stream —
the throughput layout used by the fused kernel). The deviation is
documented in models/pathtracer.py; this test supplies the equivalence
evidence: both layouts are unbiased estimators of the same integral, so
their many-frame means must agree within Monte-Carlo noise.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

from raytracerfacility_tpu.models.pathtracer import (
    RenderConfig,
    init_frame,
    render_frame_jit,
)
from raytracerfacility_tpu.models.renderer import EnvironmentProperties
from raytracerfacility_tpu.ops.camera import CameraProperties
from tests.test_smoke import build_test_scene


def _mean_image(compiled, cam, env, config, frames, base_id):
    acc = None
    for k in range(frames):
        frame = dataclasses.replace(init_frame(config.width, config.height),
                                    frame_id=jnp.int32(base_id + 37 * k))
        out = render_frame_jit(compiled, cam, env, config, frame)
        img = np.asarray(out.color[..., :3], np.float64)
        acc = img if acc is None else acc + img
    return acc / frames


def test_samples_in_lanes_is_unbiased():
    compiled = build_test_scene().build()
    cam = CameraProperties(fov=90.0, size=(32, 32))
    cam.look_at_target((0.0, 1.0, 2.4), (0.0, 0.9, 0.0))
    env = EnvironmentProperties().state()
    base = RenderConfig(width=32, height=32, bounces=3, samples=4,
                        accumulate=False, enable_textures=False,
                        enable_vertex_color=False)
    frames = 24
    seq_a = _mean_image(compiled, cam.state(), env, base, frames, 1000)
    seq_b = _mean_image(compiled, cam.state(), env, base, frames, 50000)
    lanes = _mean_image(compiled, cam.state(), env,
                        dataclasses.replace(base, samples_in_lanes=True),
                        frames, 1000)
    # noise floor: two independent sequential runs of the same estimator
    noise = np.abs(seq_a - seq_b).mean()
    cross = np.abs(seq_a - lanes).mean()
    assert noise > 0.0
    # the lanes layout deviates no more than the estimator's own noise
    # (bias would push `cross` well above `noise`)
    assert cross < 1.5 * noise, (float(cross), float(noise))
    # and the images are non-trivial
    assert seq_a.std() > 0.05
