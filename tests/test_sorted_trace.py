"""Coherence-sorted wavefront traversal (ops/pallas_seg.trace_closest_sorted):
bit-exact parity with the unsorted brute kernel, standalone and through a
full BTF frame (the feature-rich wavefront path it accelerates)."""

import numpy as np
import jax.numpy as jnp

from raytracerfacility_tpu.ops.pallas_brute import (
    pack_tri_table,
    trace_closest_pallas,
)
from raytracerfacility_tpu.ops.pallas_seg import trace_closest_sorted
from tests.test_pallas_brute import _random_tris


def test_sorted_trace_bitexact_vs_brute():
    """Sort -> trace -> unsort must return the SAME ARRAYS as the unsorted
    kernel: per-pair math is lane-independent and the best-hit record is a
    lexicographic (t, original-prim-id) min, so results are permutation
    independent. Pool includes dead lanes (poisoned tmax = -3e38, as the
    wavefront engine passes for terminated rays), per-ray tmin spread
    (alpha re-trace bumps tmin), and curve rows."""
    rng = np.random.default_rng(11)
    n_tri, n_cur = 900, 300
    v0t, e1t, e2t = _random_tris(n_tri, seed=3)
    p0 = (rng.standard_normal((n_cur, 3)) * 2).astype(np.float32)
    axis = rng.standard_normal((n_cur, 3)).astype(np.float32)
    e2c = np.zeros((n_cur, 3), np.float32)
    e2c[:, 0] = (0.05 + 0.15 * rng.random(n_cur)).astype(np.float32)
    e2c[:, 1] = (0.05 + 0.15 * rng.random(n_cur)).astype(
        np.float32) - e2c[:, 0]
    v0 = jnp.concatenate([v0t, jnp.asarray(p0)])
    e1 = jnp.concatenate([e1t, jnp.asarray(axis)])
    e2 = jnp.concatenate([e2t, jnp.asarray(e2c)])
    kind = jnp.concatenate([jnp.zeros(n_tri, jnp.int32),
                            jnp.ones(n_cur, jnp.int32)])
    table = pack_tri_table(v0, e1, e2, kind=kind)

    r = 900
    o = jnp.asarray((rng.standard_normal((r, 3)) * 3).astype(np.float32))
    d = rng.standard_normal((r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    tmin = jnp.asarray((1e-3 + 1e-4 * rng.random(r)).astype(np.float32))
    dead = rng.random(r) < 0.3
    tmax = jnp.asarray(np.where(dead, -3.0e38, 1e20).astype(np.float32))

    ref = trace_closest_pallas(table, o, d, tmin, tmax)
    got = trace_closest_sorted(table, o, d, tmin, tmax)
    assert int(ref.hit.sum()) > 100
    for name in ("hit", "prim", "t", "u", "v"):
        np.testing.assert_array_equal(
            np.asarray(getattr(ref, name)), np.asarray(getattr(got, name)),
            err_msg=name)


def test_btf_frame_bitexact_sorted_trace(monkeypatch):
    """A BTF frame (the config-3 shape: wavefront engine, MLVQ shading)
    rendered with the sorted trace is bit-identical to the unsorted
    trace — the full engine consumes only (t, prim, u, v, hit), all of
    which are permutation independent.

    Runs in a clean subprocess when invoked from the full suite: after
    ~100 prior jit programs the XLA CPU backend segfaults inside
    backend_compile_and_load compiling this frame (deterministic
    mid-suite, absent standalone, unchanged by a 512 MB stack rlimit —
    an accumulated backend-state interaction, not this test's math).
    Assertion coverage is identical either way."""
    import os
    import subprocess
    import sys

    if os.environ.get("RTF_SORTED_TRACE_INPROC") != "1":
        env = dict(os.environ, RTF_SORTED_TRACE_INPROC="1")
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider",
             __file__ + "::test_btf_frame_bitexact_sorted_trace"],
            env=env, capture_output=True, text=True, timeout=900)
        assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-1000:])
        return

    from raytracerfacility_tpu.enums import MaterialType
    from raytracerfacility_tpu.models.pathtracer import (
        RenderConfig,
        init_frame,
        render_frame,
    )
    from raytracerfacility_tpu.models.renderer import EnvironmentProperties
    from raytracerfacility_tpu.ops.camera import CameraProperties
    from raytracerfacility_tpu.scene import RayTracerScene, make_sphere
    from tests.test_mlvq import synthetic_btf

    monkeypatch.setenv("RTF_TPU_PALLAS_BRUTE", "1")
    scene = RayTracerScene()
    scene.upsert_geometry(1, version=0,
                          mesh=make_sphere(0.6, rings=8, sectors=12))
    scene.upsert_material(2, version=0,
                          material_type=MaterialType.COMPRESSED_BTF,
                          btf=synthetic_btf(seed=2))
    scene.upsert_instance(3, version=0, geometry=1, material=2)
    compiled = scene.build()
    assert compiled.pallas_tris is not None
    cam = CameraProperties(fov=60.0, size=(16, 16))
    cam.look_at_target((0.0, 0.4, 2.2), (0.0, 0.0, 0.0))
    env = EnvironmentProperties().state()
    cfg = RenderConfig(width=16, height=16, bounces=2, samples=1,
                       enable_btf=True, enable_textures=False,
                       enable_vertex_color=False)

    monkeypatch.setenv("RTF_TPU_SORTED_TRACE", "1")
    frame_s = render_frame(compiled, cam.state(), env, cfg,
                           init_frame(16, 16))
    monkeypatch.setenv("RTF_TPU_SORTED_TRACE", "0")
    frame_u = render_frame(compiled, cam.state(), env, cfg,
                           init_frame(16, 16))
    for name in ("color", "normal", "albedo"):
        np.testing.assert_array_equal(
            np.asarray(getattr(frame_s, name)),
            np.asarray(getattr(frame_u, name)), err_msg=name)
    assert float(np.asarray(frame_u.color).std()) > 0.01
