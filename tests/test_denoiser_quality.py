"""Shipped denoiser checkpoint quality gate.

The reference ships a working denoiser (OptiX, ref RayTracer.cu:508-556);
this framework ships scripts/train_denoiser.py's checkpoint. The gates:

* denoising a 1-spp frame must land close (SSIM) to a CONVERGED clean
  target on a camera pose that was NOT in the training set, and beat the
  noisy input by a clear margin;
* an 8x-exposure HDR variant of the same frame must denoise just as well
  — the inverse-average-log-luminance intensity normalization (the
  optixDenoiserComputeIntensity analog, ref RayTracer.cu:523-531) makes
  the network exposure-equivariant.

The clean target is PINNED (tests/goldens/denoiser_clean_96.npy, a
2048-spp accumulated render of the gate pose by this framework's own
tracer — scripts/render_denoiser_golden.py). A clean target rendered
in-test at CI-affordable spp is itself too noisy to gate against:
measured, two independent 32-spp renders of this pose agree only to
SSIM 0.34, capping even a PERFECT denoiser's measurable score near
0.43. Against the converged target the scores separate properly.
"""

import dataclasses
import os

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

# absolute SSIM bar for the shipped checkpoint on the held-out pose
# (denoised 1-spp vs the pinned 2048-spp converged target); the noisy
# input scores ~0.10 and a gaussian blur ~0.35 on this measure
SSIM_GATE = 0.60

_GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")
_GOLDEN = os.path.join(_GOLDENS, "denoiser_clean_96.npy")


def _cornell():
    compiled = build_test_scene().build()
    cam = CameraProperties(fov=75.0, size=(96, 96))
    # held-out pose (training used (0,1,2.4)/(1.5,1.2,1.8)-style poses);
    # MUST match scripts/render_denoiser_golden.py
    cam.look_at_target((-1.3, 1.7, 1.9), (0.2, 0.6, 0.0))
    return compiled, cam


def _strands():
    from raytracerfacility_tpu.scene.procedural import build_strands_scene

    cam = CameraProperties(fov=55.0, size=(96, 96))
    cam.look_at_target((-1.2, 1.1, 1.8), (0.0, 0.5, 0.0))
    return build_strands_scene(n_strands=600, seed=11).build(), cam


def _canopy():
    # kept for scripts/render_denoiser_golden.py's gate pose; re-add to
    # _EVAL_SCENES once denoiser_clean_canopy_96.npy is rendered
    from raytracerfacility_tpu.scene.procedural import build_canopy_scene

    cam = CameraProperties(fov=60.0, size=(96, 96))
    cam.look_at_target((-1.3, 2.0, 1.8), (0.0, 0.4, 0.0))
    return build_canopy_scene(rows=5, cols=5).build(), cam


# eval set: (scene builder, pinned golden, absolute SSIM gate). The
# curve scene gates the swept-cone silhouette noise structure none of
# the mesh training scenes produce. Gates are set a margin under the
# SHIPPED checkpoint's measured scores (cornell 0.683, strands 0.563 vs
# their converged goldens) so a real regression fails loudly; the
# strands score reflects a checkpoint trained before curve scenes
# entered the pair set — rendered strands/BTF pairs exist
# (scripts/train_denoiser.py --render 3/4) and retraining against them
# is the known path to raising this gate. The canopy eval scene was cut:
# its converged-golden render exceeded the round's chip budget
# (compile-bound), and an unconverged target cannot gate (see module
# docstring: two 32-spp renders agree only to SSIM 0.34).
_EVAL_SCENES = {
    "cornell": (_cornell, "denoiser_clean_96.npy", SSIM_GATE),
    "strands": (_strands, "denoiser_clean_strands_96.npy", 0.55),
}


def _render_noisy(compiled, cam):
    env = EnvironmentProperties().state()
    base = RenderConfig(width=96, height=96, bounces=3, samples=1,
                        accumulate=False, enable_textures=False,
                        enable_vertex_color=False)
    return render_frame_jit(
        compiled, cam.state(), env, base,
        dataclasses.replace(init_frame(96, 96), frame_id=jnp.int32(31)))


@pytest.fixture(scope="module")
def frames():
    compiled, cam = _cornell()
    return _render_noisy(compiled, cam), np.load(_GOLDEN)


@pytest.mark.parametrize("scene", sorted(_EVAL_SCENES))
def test_packaged_denoiser_eval_scenes(scene):
    """Per-scene quality gate on held-out poses: denoised 1 spp must
    beat the noisy input by a clear SSIM margin AND clear the scene's
    absolute bar against its pinned converged golden (the reference
    ships a production denoiser, ref RayTracer.cu:508-556 — matching it
    means holding quality across the feature envelope, not one room)."""
    den = default_denoiser()
    if den is None:
        pytest.fail("no packaged denoiser checkpoint")
    build, golden, gate = _EVAL_SCENES[scene]
    path = os.path.join(_GOLDENS, golden)
    if not os.path.exists(path):
        pytest.fail(f"missing pinned golden {golden} "
                    "(run scripts/render_denoiser_golden.py)")
    compiled, cam = build()
    noisy = _render_noisy(compiled, cam)
    clean = np.load(path)
    denoised = np.asarray(den.denoise(
        noisy.color[..., :3], noisy.albedo[..., :3],
        noisy.normal[..., :3]))
    n = np.asarray(noisy.color[..., :3])
    s_noisy = ssim(n, clean)
    s_den = ssim(denoised, clean)
    assert np.isfinite(denoised).all()
    assert s_den > s_noisy + 0.15, (scene, s_noisy, s_den)
    assert s_den > gate, (scene, s_noisy, s_den)


def test_packaged_denoiser_quality(frames):
    den = default_denoiser()
    if den is None:
        pytest.fail("no packaged denoiser checkpoint "
                    "(run scripts/train_denoiser.py)")
    noisy, clean = frames
    denoised = np.asarray(den.denoise(
        noisy.color[..., :3], noisy.albedo[..., :3], noisy.normal[..., :3]))
    n = np.asarray(noisy.color[..., :3])

    s_noisy = ssim(n, clean)
    s_den = ssim(denoised, clean)
    assert np.isfinite(denoised).all()
    assert s_den > s_noisy + 0.3, (s_noisy, s_den)
    assert s_den > SSIM_GATE, (s_noisy, s_den)


def test_packaged_denoiser_hdr_exposure(frames):
    """8x exposure outside the training distribution: the intensity
    normalization must hold quality at the same gate."""
    den = default_denoiser()
    if den is None:
        pytest.fail("no packaged denoiser checkpoint")
    noisy, clean = frames
    e = 8.0
    denoised = np.asarray(den.denoise(
        noisy.color[..., :3] * e, noisy.albedo[..., :3],
        noisy.normal[..., :3])) / e
    s_den = ssim(denoised, clean)
    assert np.isfinite(denoised).all()
    assert s_den > SSIM_GATE, s_den
