"""Parity of the Pallas brute-trace mega-kernel (interpret mode on CPU)
against the chunked XLA oracle, standalone and through the full frame."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from raytracerfacility_tpu.ops.intersect import trace_closest_bruteforce
from raytracerfacility_tpu.ops.pallas_brute import (
    pack_tri_table,
    trace_any_pallas,
    trace_closest_pallas,
)


def _random_tris(n, seed=0):
    rng = np.random.default_rng(seed)
    v0 = (rng.standard_normal((n, 3)) * 2).astype(np.float32)
    e1 = rng.standard_normal((n, 3)).astype(np.float32)
    e2 = rng.standard_normal((n, 3)).astype(np.float32)
    return jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2)


def test_closest_parity_multichunk():
    v0, e1, e2 = _random_tris(1300)  # > TRI_CHUNK: exercises accumulation
    rng = np.random.default_rng(1)
    r = 700
    o = jnp.asarray((rng.standard_normal((r, 3)) * 3).astype(np.float32))
    d = jnp.asarray(rng.standard_normal((r, 3)).astype(np.float32))
    tmin = jnp.full(r, 1e-3, jnp.float32)
    tmax = jnp.full(r, 100.0, jnp.float32)

    ref = trace_closest_bruteforce(v0, e1, e2, o, d, tmin, tmax)
    got = trace_closest_pallas(pack_tri_table(v0, e1, e2), o, d, tmin, tmax)
    assert int(ref.hit.sum()) > 100  # the scene actually hits
    np.testing.assert_array_equal(np.asarray(ref.hit), np.asarray(got.hit))
    np.testing.assert_array_equal(np.asarray(ref.prim), np.asarray(got.prim))
    np.testing.assert_allclose(np.asarray(ref.t), np.asarray(got.t),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ref.u), np.asarray(got.u),
                               rtol=1e-5, atol=1e-6)

    occ = trace_any_pallas(pack_tri_table(v0, e1, e2), o, d, tmin, tmax)
    np.testing.assert_array_equal(np.asarray(ref.hit), np.asarray(occ))


def test_mixed_triangle_curve_parity():
    """Curve rows (kind=1) in the kernel agree with the XLA oracle's
    round-cone path — lifting round 1's triangles-only gate."""
    rng = np.random.default_rng(7)
    n_tri, n_cur = 400, 300
    v0t, e1t, e2t = _random_tris(n_tri, seed=2)
    p0 = (rng.standard_normal((n_cur, 3)) * 2).astype(np.float32)
    axis = rng.standard_normal((n_cur, 3)).astype(np.float32)
    r0 = (0.05 + 0.15 * rng.random(n_cur)).astype(np.float32)
    r1 = (0.05 + 0.15 * rng.random(n_cur)).astype(np.float32)
    e2c = np.zeros((n_cur, 3), np.float32)
    e2c[:, 0] = r0
    e2c[:, 1] = r1 - r0
    v0 = jnp.concatenate([v0t, jnp.asarray(p0)])
    e1 = jnp.concatenate([e1t, jnp.asarray(axis)])
    e2 = jnp.concatenate([e2t, jnp.asarray(e2c)])
    kind = jnp.concatenate([jnp.zeros(n_tri, jnp.int32),
                            jnp.ones(n_cur, jnp.int32)])

    r = 600
    o = jnp.asarray((rng.standard_normal((r, 3)) * 3).astype(np.float32))
    d = rng.standard_normal((r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    tmin = jnp.full(r, 1e-3, jnp.float32)
    tmax = jnp.full(r, 100.0, jnp.float32)

    ref = trace_closest_bruteforce(v0, e1, e2, o, d, tmin, tmax, kind=kind)
    got = trace_closest_pallas(pack_tri_table(v0, e1, e2, kind=kind),
                               o, d, tmin, tmax)
    assert int(ref.hit.sum()) > 100
    # curve prims are actually being hit
    curve_hits = np.asarray(ref.prim >= n_tri) & np.asarray(ref.hit)
    assert curve_hits.sum() > 20
    np.testing.assert_array_equal(np.asarray(ref.hit), np.asarray(got.hit))
    np.testing.assert_array_equal(np.asarray(ref.prim), np.asarray(got.prim))
    np.testing.assert_allclose(np.asarray(ref.t), np.asarray(got.t),
                               rtol=1e-5, atol=1e-5)

    occ = trace_any_pallas(pack_tri_table(v0, e1, e2, kind=kind),
                           o, d, tmin, tmax)
    np.testing.assert_array_equal(np.asarray(ref.hit), np.asarray(occ))


def test_render_frame_matches_bvh_path(monkeypatch):
    """A tiny frame rendered through the Pallas trace matches the BVH
    render to float noise (identical hit decisions incl. index
    tie-breaking on shared edges; u/v differ by FMA grouping only)."""
    monkeypatch.setenv("RTF_TPU_PALLAS_BRUTE", "1")
    from raytracerfacility_tpu.models.pathtracer import (
        RenderConfig,
        init_frame,
        render_frame,
    )
    from raytracerfacility_tpu.models.renderer import EnvironmentProperties
    from raytracerfacility_tpu.ops.camera import CameraProperties
    from tests.test_smoke import build_test_scene

    scene = build_test_scene()
    compiled = scene.build()
    assert compiled.pallas_tris is not None
    cam = CameraProperties(fov=60.0, size=(8, 8))
    cam.look_at_target((0.0, 1.0, 2.6), (0.0, 0.8, 0.0))
    env = EnvironmentProperties().state()
    cfg = RenderConfig(width=8, height=8, bounces=2, samples=1)
    frame_pl = render_frame(compiled, cam.state(), env, cfg, init_frame(8, 8))

    compiled_bvh = dataclasses.replace(compiled, pallas_tris=None)
    frame_bvh = render_frame(
        compiled_bvh, cam.state(), env, cfg, init_frame(8, 8)
    )
    np.testing.assert_allclose(
        np.asarray(frame_pl.color), np.asarray(frame_bvh.color), atol=1e-6
    )
    # u/v from the kernel differ from XLA's by float reassociation (FMA
    # grouping), which shows up as ~1 ULP in interpolated normals
    np.testing.assert_allclose(
        np.asarray(frame_pl.normal), np.asarray(frame_bvh.normal),
        atol=1e-6,
    )
