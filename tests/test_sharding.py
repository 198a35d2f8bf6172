"""Multi-device SPMD rendering on the virtual 8-device CPU mesh
(SURVEY.md section 4 item (d): single-chip vs multi-chip equivalence)."""

import jax
import numpy as np
import pytest

from raytracerfacility_tpu.models.pathtracer import (
    RenderConfig,
    init_frame,
    render_frame_jit,
)
from raytracerfacility_tpu.models.renderer import EnvironmentProperties
from raytracerfacility_tpu.ops.camera import CameraProperties
from raytracerfacility_tpu.parallel import make_mesh, render_frame_sharded
from tests.test_smoke import build_test_scene


@pytest.fixture(scope="module")
def setup():
    scene = build_test_scene()
    compiled = scene.build()
    cam = CameraProperties(fov=90.0, size=(32, 32))
    cam.look_at_target((0.0, 1.0, 2.4), (0.0, 0.9, 0.0))
    env = EnvironmentProperties().state()
    return compiled, cam.state(), env


def test_tile_sharding_matches_single_device(setup):
    """Row-tiling only (no spp axis): identical RNG streams per pixel, so
    the sharded render must match the single-device one exactly."""
    compiled, cam_state, env = setup
    config = RenderConfig(width=32, height=32, bounces=2, samples=2)
    single = render_frame_jit(compiled, cam_state, env, config, init_frame(32, 32))
    mesh = make_mesh(8, tile=8, spp=1)
    sharded = render_frame_sharded(
        compiled, cam_state, env, config, init_frame(32, 32), mesh
    )
    np.testing.assert_allclose(
        np.asarray(sharded.color), np.asarray(single.color), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(sharded.normal), np.asarray(single.normal), atol=1e-5
    )


def test_tile_x_spp_mesh(setup):
    """Full 2D mesh (4 tile x 2 spp) runs, reduces over ICI, and converges
    to the same image statistics (different RNG streams per spp shard)."""
    compiled, cam_state, env = setup
    config = RenderConfig(width=32, height=32, bounces=2, samples=4)
    single = render_frame_jit(compiled, cam_state, env, config, init_frame(32, 32))
    mesh = make_mesh(8, tile=4, spp=2)
    sharded = render_frame_sharded(
        compiled, cam_state, env, config, init_frame(32, 32), mesh
    )
    a = np.asarray(sharded.color[..., :3])
    b = np.asarray(single.color[..., :3])
    assert np.all(np.isfinite(a))
    assert int(sharded.frame_id) == 1
    # different sample streams -> images agree in the mean, not per pixel
    assert abs(a.mean() - b.mean()) < 0.05


def test_has_eight_devices():
    assert len(jax.devices()) == 8
