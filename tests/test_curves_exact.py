"""Exact swept-spline intersection: Newton refinement + subdivision bound.

The reference intersects quadratic/cubic strands with OptiX builtin IS
modules evaluating the exact spline (ref RayTracer.cu:1773-1787,
CurveSplineDefinations.hpp:119-313). The TPU build subdivides splines into
sphere-swept linear prims for traversal, then refines accepted hits onto
the exact canal surface (ops/curve.py::refine_swept_hit). These tests pin

1. the refinement lands ON the exact surface (residual ~ float eps),
2. the subdivision's visibility error (hit-t) against an 8x denser
   subdivision is bounded,
3. an end-to-end quadratic strand render works through the full engine.
"""

import numpy as np
import jax.numpy as jnp

from raytracerfacility_tpu.enums import GeometryType, RendererType
from raytracerfacility_tpu.ops.curve import (
    intersect_round_cone,
    refine_swept_hit,
    spline_point,
    subdivide_strand_segments,
)


def _strands(mode, n=6, seed=0):
    rng = np.random.default_rng(seed)
    n_ctrl = {"quadratic": 3, "cubic": 4}[mode]
    points, segments = [], []
    for k in range(n):
        base = rng.uniform(-0.5, 0.5, 3)
        pts = [base]
        for _ in range(n_ctrl - 1):
            pts.append(pts[-1] + rng.uniform(-0.25, 0.45, 3))
        for i, p in enumerate(pts):
            if i == 0:
                segments.append(len(points))
            points.append([*p, 0.06 + 0.03 * rng.random()])
    return (np.asarray(points, np.float32),
            np.asarray(segments, np.int32))


def _trace_subdiv(sub, o, d, tmax=100.0):
    """Closest hit over all linear sub-segments; returns (t, seg_idx, u)."""
    o = jnp.asarray(o)[:, None, :]
    d = jnp.asarray(d)[:, None, :]
    p0 = jnp.asarray(sub["p0"])[None]
    axis = jnp.asarray(sub["p1"] - sub["p0"])[None]
    r0 = jnp.asarray(sub["r0"])[None]
    dr = jnp.asarray(sub["r1"] - sub["r0"])[None]
    hit, t, u = intersect_round_cone(
        o, d, p0, axis, r0, dr, jnp.float32(1e-3), jnp.float32(tmax))
    t = jnp.where(hit, t, tmax)
    j = jnp.argmin(t, axis=1)
    tt = jnp.take_along_axis(t, j[:, None], axis=1)[:, 0]
    uu = jnp.take_along_axis(u, j[:, None], axis=1)[:, 0]
    return np.asarray(tt), np.asarray(j), np.asarray(uu)


def _rays_at(points, n_rays, seed):
    rng = np.random.default_rng(seed)
    center = points[:, :3].mean(axis=0)
    o = center + rng.uniform(1.5, 2.5, (n_rays, 3)) * rng.choice(
        [-1.0, 1.0], (n_rays, 3))
    target = center + rng.normal(0, 0.3, (n_rays, 3))
    d = target - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o.astype(np.float32), d.astype(np.float32)


def test_refinement_lands_on_exact_surface():
    for mode, order in (("quadratic", 2), ("cubic", 3)):
        points, segments = _strands(mode, seed=3)
        sub = subdivide_strand_segments(points, segments, mode)
        o, d = _rays_at(points, 400, seed=7)
        t, j, u = _trace_subdiv(sub, o, d)
        hit = t < 99.0
        assert hit.sum() > 60, f"{mode}: too few hits ({hit.sum()})"

        s_seed = sub["u0"][j] + u * (sub["u1"][j] - sub["u0"][j])
        ctrl = jnp.asarray(sub["ctrl"][j])
        radii = jnp.asarray(sub["ctrl_r"][j])
        ords = jnp.full(j.shape, order, jnp.int32)
        t_r, s_r, pos, nrm, conv = refine_swept_hit(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(t),
            jnp.asarray(s_seed), ctrl, radii, ords)
        conv = np.asarray(conv)
        # residual of the canal-surface conditions at the refined point
        c, dc, _, r, dr, _ = spline_point(ctrl, radii, ords, s_r)
        x = jnp.asarray(o) + t_r[:, None] * jnp.asarray(d)
        f1 = jnp.abs(jnp.linalg.norm(x - c, axis=1) - r)
        interior = hit & (np.asarray(s_r) > 0.02) & (np.asarray(s_r) < 0.98)
        assert interior.sum() > 30
        # the bulk of hits converge onto the exact surface
        assert conv[interior].mean() > 0.85, conv[interior].mean()
        res = np.asarray(f1)[interior & conv]
        assert np.quantile(res, 0.99) < 2e-4, float(np.quantile(res, 0.99))
        # the refined position sits on the sphere at s (by construction) —
        # also check converged lanes stay near the unrefined hit (sanity:
        # refinement is a correction on the radius scale, not a different
        # intersection)
        moved = np.linalg.norm(
            np.asarray(pos) - (o + np.asarray(t)[:, None] * d), axis=1)
        assert np.quantile(moved[interior & conv], 0.95) < 0.1


def test_subdivision_visibility_error_bound():
    for mode in ("quadratic", "cubic"):
        points, segments = _strands(mode, seed=5)
        coarse = subdivide_strand_segments(points, segments, mode)  # k=6
        dense = subdivide_strand_segments(points, segments, mode,
                                          subdivisions=48)
        o, d = _rays_at(points, 500, seed=11)
        t_c, _, _ = _trace_subdiv(coarse, o, d)
        t_d, _, _ = _trace_subdiv(dense, o, d)
        hit_c = t_c < 99.0
        hit_d = t_d < 99.0
        # hit/miss agreement within 2% (silhouette rays may flip)
        assert (hit_c != hit_d).mean() < 0.02, (hit_c != hit_d).mean()
        both = hit_c & hit_d
        dt = np.abs(t_c[both] - t_d[both])
        # visibility error of the default subdivision vs 8x denser: small
        # relative to the strand radius (~0.06)
        assert np.quantile(dt, 0.95) < 0.02, float(np.quantile(dt, 0.95))
        assert dt.max() < 0.15, float(dt.max())


def _quadratic_strand_scene():
    from raytracerfacility_tpu.scene import MaterialProperties, RayTracerScene

    rng = np.random.default_rng(2)
    points, segments = [], []
    for k in range(8):
        base = np.array([(k - 4) * 0.15, 0.0, 0.0], np.float32)
        mid = base + [rng.normal(0, 0.05), 0.5, rng.normal(0, 0.2)]
        tip = mid + [rng.normal(0, 0.1), 0.5, rng.normal(0, 0.2)]
        segments.append(len(points))
        for p in (base, mid, tip):
            points.append([*p, 0.05, 0.3, 0.5, 0.2, 1.0])
    scene = RayTracerScene()
    scene.upsert_geometry(
        1, version=0, renderer_type=RendererType.CURVE,
        geometry_type=GeometryType.QUADRATIC_BSPLINE,
        strand_points=np.asarray(points, np.float32),
        curve_segments=np.asarray(segments, np.int32))
    scene.upsert_material(2, version=0, properties=MaterialProperties(
        albedo_color=(0.3, 0.5, 0.2), roughness=1.0, metallic=0.0))
    scene.upsert_instance(3, version=0, geometry=1, material=2)
    return scene


def _render_strands():
    from raytracerfacility_tpu.models.renderer import (
        EnvironmentProperties, RayProperties, RayTracerCamera)

    cam = RayTracerCamera(_quadratic_strand_scene())
    cam.camera.resize((32, 32))
    cam.camera.fov = 60.0
    cam.camera.look_at_target((0.0, 0.5, 1.6), (0.0, 0.5, 0.0))
    return np.asarray(cam.render(EnvironmentProperties(),
                                 RayProperties(bounces=2, samples=2)))


def test_quadratic_strand_render_end_to_end():
    img = _render_strands()
    assert np.isfinite(img).all()
    # strands darken pixels against the white environment
    assert (img[..., :3].min(axis=-1) < 0.8).sum() > 20


def test_strand_render_through_pallas_kernel(monkeypatch):
    """Curve scenes now ride the fast Pallas trace (round 1 silently fell
    back to the slow XLA walk): same image as the XLA path."""
    img_xla = _render_strands()
    monkeypatch.setenv("RTF_TPU_PALLAS_BRUTE", "1")
    img_pl = _render_strands()
    # verify the kernel path was actually taken
    sc = _quadratic_strand_scene()
    assert sc.build().pallas_tris is not None
    # hit decisions agree to ~1e-5 in t (test_mixed_triangle_curve_parity);
    # the Newton spline refinement amplifies those ulps to ~1e-2 in shading
    d = np.abs(img_pl - img_xla)
    assert d.max() < 0.05, float(d.max())
    assert d.mean() < 2e-3, float(d.mean())
