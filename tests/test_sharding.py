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


def test_estimator_sharding_matches_single_device(setup):
    """Probe-axis sharding with global RNG offsets (probe count NOT
    divisible by 8 to exercise the pad/slice path). RNG streams are
    identical by construction, so the bulk of probe energies matches to
    the ulp; a thin tail diverges where a last-ulp fusion difference
    between the sharded and unsharded XLA compilations flips a chaotic
    bounce path (same contract as the fused-vs-wavefront tests)."""
    from raytracerfacility_tpu.models.illumination import (
        estimate_illumination,
        probes_from_mesh,
    )
    from raytracerfacility_tpu.parallel import estimate_illumination_sharded
    from raytracerfacility_tpu.scene import make_sphere

    compiled, _, env = setup
    probes = probes_from_mesh(make_sphere(0.4, rings=5, sectors=7),
                              np.eye(4, dtype="float32"))
    assert probes.num_probes % 8 != 0
    config = RenderConfig(bounces=2, samples=2)
    single = estimate_illumination(compiled, env, config, probes, seed=5)
    mesh = make_mesh(8, tile=4, spp=2)
    sharded = estimate_illumination_sharded(
        compiled, env, config, probes, mesh, seed=5)
    d = np.abs(np.asarray(sharded.energy) - np.asarray(single.energy))
    assert np.quantile(d, 0.9) < 1e-6, float(np.quantile(d, 0.9))
    assert d.mean() < 0.01, float(d.mean())
    assert np.isfinite(np.asarray(sharded.direction)).all()


def test_lidar_sharding_matches_single_device(setup):
    """Beam-axis sharding: exact restitch of the single-device sweep."""
    from raytracerfacility_tpu.models.lidar import scan_point_cloud_jit
    from raytracerfacility_tpu.parallel import scan_point_cloud_sharded
    import jax.numpy as jnp

    compiled, _, _ = setup
    n = 333  # not divisible by 8
    xs = jnp.linspace(-0.9, 0.9, n)
    start = jnp.stack([xs, jnp.full((n,), 1.8), jnp.zeros(n)], axis=-1)
    direction = jnp.tile(jnp.asarray([[0.0, -1.0, 0.0]]), (n, 1))
    single = scan_point_cloud_jit(compiled, start, direction)
    mesh = make_mesh(8, tile=8, spp=1)
    sharded = scan_point_cloud_sharded(compiled, start, direction, mesh)
    for field in ("hit", "position", "normal", "color", "handle_words"):
        np.testing.assert_array_equal(
            np.asarray(getattr(sharded, field)),
            np.asarray(getattr(single, field)), err_msg=field)
    assert int(np.asarray(single.hit).sum()) > 0


def test_has_eight_devices():
    assert len(jax.devices()) == 8
