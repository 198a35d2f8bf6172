"""Analytic ray / round-curve intersection (sphere-swept segments).

The reference uses OptiX's builtin ROUND_LINEAR / QUADRATIC / CUBIC
intersectors (ref RayTracer.cu:1773-1787) — hardware-adjacent code with no
TPU equivalent (SURVEY.md section 7.3 item 4). This module implements the
TPU-native version:

* higher-order B-spline segments are subdivided at scene-bake time into
  sphere-swept *linear* sub-segments (flat SoA prims that drop into the
  same BVH as triangles),
* each sub-segment is intersected analytically: one quadratic for the cone
  body + two sphere caps, fully vectorized,
* shading normals/positions use the reference's own offset-surface
  projection (ref CurveSplineDefinations.hpp:352-387 ``surfaceNormal`` for
  LinearBSplineSegment, including the round endcap branches).

Primitive encoding (shared with GeometryBuffers/BVH rows): ``v0`` = p0,
``e1`` = p1 - p0, ``e2`` = (r0, r1 - r0, 0); ``kind`` = 1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def intersect_round_cone(
    origin: jax.Array,  # (..., 3)
    direction: jax.Array,  # (..., 3) unit length
    p0: jax.Array,  # (..., 3) or (T, 3) broadcastable
    axis: jax.Array,  # (..., 3) p1 - p0
    r0: jax.Array,  # (...,)
    dr: jax.Array,  # (...,) r1 - r0
    tmin: jax.Array,
    tmax: jax.Array,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Closest intersection with the sphere-swept segment.

    Returns ``(hit, t, u)`` with ``u`` in [0, 1] along the axis (0/1 exactly
    on the endcaps, matching optixGetCurveParameter semantics the shading
    path keys on).
    """
    oa = origin - p0
    rr = -dr  # r0 - r1
    m0 = jnp.sum(axis * axis, axis=-1)
    m1 = jnp.sum(oa * axis, axis=-1)
    m2 = jnp.sum(direction * axis, axis=-1)
    m3 = jnp.sum(direction * oa, axis=-1)
    m5 = jnp.sum(oa * oa, axis=-1)

    d2 = m0 - rr * rr
    k2 = d2 - m2 * m2
    k1 = d2 * m3 - m1 * m2 + m2 * rr * r0
    k0 = d2 * m5 - m1 * m1 + 2.0 * m1 * rr * r0 - m0 * r0 * r0
    h = k1 * k1 - k0 * k2
    safe_k2 = jnp.where(jnp.abs(k2) > _EPS, k2, 1.0)
    t_body = (-jnp.sqrt(jnp.maximum(h, 0.0)) - k1) / safe_k2
    y = m1 - r0 * rr + t_body * m2
    body_ok = (
        (h >= 0.0)
        & (jnp.abs(k2) > _EPS)
        & (y > 0.0)
        & (y < d2)
        & (t_body > tmin)
        & (t_body < tmax)
    )

    # sphere cap at p0
    disc0 = m3 * m3 - m5 + r0 * r0
    t_cap0 = -m3 - jnp.sqrt(jnp.maximum(disc0, 0.0))
    y0 = m1 - r0 * rr + t_cap0 * m2
    cap0_ok = (disc0 >= 0.0) & (y0 <= 0.0) & (t_cap0 > tmin) & (t_cap0 < tmax)

    # sphere cap at p1
    r1 = r0 + dr
    ob = oa - axis
    m3b = jnp.sum(direction * ob, axis=-1)
    m5b = jnp.sum(ob * ob, axis=-1)
    disc1 = m3b * m3b - m5b + r1 * r1
    t_cap1 = -m3b - jnp.sqrt(jnp.maximum(disc1, 0.0))
    y1 = m1 - r0 * rr + t_cap1 * m2
    cap1_ok = (disc1 >= 0.0) & (y1 >= d2) & (t_cap1 > tmin) & (t_cap1 < tmax)

    big = jnp.float32(3.4e38)
    t_body_m = jnp.where(body_ok, t_body, big)
    t_cap0_m = jnp.where(cap0_ok, t_cap0, big)
    t_cap1_m = jnp.where(cap1_ok, t_cap1, big)
    t = jnp.minimum(jnp.minimum(t_body_m, t_cap0_m), t_cap1_m)
    hit = body_ok | cap0_ok | cap1_ok

    safe_d2 = jnp.where(jnp.abs(d2) > _EPS, d2, 1.0)
    u_body = jnp.clip(
        (m1 - r0 * rr + t * m2) / safe_d2, 0.0, 1.0
    )
    u = jnp.where(t == t_cap0_m, 0.0, jnp.where(t == t_cap1_m, 1.0, u_body))
    return hit, jnp.where(hit, t, tmax), u


def linear_curve_normal(
    hit_point: jax.Array,  # (..., 3) ray hit (near the offset surface)
    p0: jax.Array,
    axis: jax.Array,  # p1 - p0
    r0: jax.Array,
    dr: jax.Array,
    u: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Offset-surface normal + surface-projected position for a linear
    sphere-swept segment (ref CurveSplineDefinations.hpp:352-387).

    Returns ``(normal (...,3) unit, position (...,3))``.
    """
    p1 = p0 + axis
    # body branch
    p = p0 + u[..., None] * axis
    r = r0 + u * dr
    dd = jnp.sum(axis * axis, axis=-1)
    o1 = hit_point - p
    o1 = o1 - (jnp.sum(o1 * axis, axis=-1) / jnp.maximum(dd, _EPS))[..., None] * axis
    o1_len = jnp.linalg.norm(o1, axis=-1)
    o1 = o1 * (r / jnp.maximum(o1_len, _EPS))[..., None]
    ps_body = p + o1
    n_body = dd[..., None] * o1 - (dr * r)[..., None] * axis

    # round endcaps (ref :355-361)
    n_cap0 = hit_point - p0
    n_cap1 = hit_point - p1
    is_cap0 = (u == 0.0)[..., None]
    is_cap1 = (u >= 1.0)[..., None]
    normal = jnp.where(is_cap0, n_cap0, jnp.where(is_cap1, n_cap1, n_body))
    norm = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    normal = normal / jnp.maximum(norm, _EPS)
    position = jnp.where(is_cap0 | is_cap1, hit_point, ps_body)
    return normal, position


# --------------------------------------------------------------------------
# Exact swept-spline refinement (the TPU answer to OptiX's builtin
# quadratic/cubic intersectors, ref RayTracer.cu:1773-1787 with exact
# spline evaluation in CurveSplineDefinations.hpp:119-313)
# --------------------------------------------------------------------------


def spline_point(ctrl, radii, order, s):
    """Uniform B-spline evaluation c(s), c'(s), c''(s), r, r', r''.

    ``ctrl`` (..., 4, 3) control points (row 3 ignored for quadratics),
    ``radii`` (..., 4), ``order`` (...,) 2 = quadratic, 3 = cubic,
    ``s`` (...,) in [0, 1]. Quadratic/cubic bases match
    CurveSplineDefinations.hpp:119-176 / :179-313 (uniform B-splines).
    """
    s = s[..., None]
    # quadratic basis + derivatives
    qb = jnp.concatenate([
        (1.0 - s) ** 2 / 2.0, 0.5 + s * (1.0 - s), s * s / 2.0,
        jnp.zeros_like(s),
    ], axis=-1)
    qd = jnp.concatenate([
        s - 1.0, 1.0 - 2.0 * s, s, jnp.zeros_like(s)], axis=-1)
    qdd = jnp.concatenate([
        jnp.ones_like(s), -2.0 * jnp.ones_like(s), jnp.ones_like(s),
        jnp.zeros_like(s)], axis=-1)
    # cubic basis + derivatives
    cb = jnp.concatenate([
        (1.0 - s) ** 3 / 6.0,
        (3.0 * s**3 - 6.0 * s**2 + 4.0) / 6.0,
        (-3.0 * s**3 + 3.0 * s**2 + 3.0 * s + 1.0) / 6.0,
        s**3 / 6.0,
    ], axis=-1)
    cd = jnp.concatenate([
        -((1.0 - s) ** 2) / 2.0,
        (3.0 * s**2 - 4.0 * s) / 2.0,
        (-3.0 * s**2 + 2.0 * s + 1.0) / 2.0,
        s**2 / 2.0,
    ], axis=-1)
    cdd = jnp.concatenate([
        1.0 - s, 3.0 * s - 2.0, 1.0 - 3.0 * s, s], axis=-1)

    is_cubic = (order == 3)[..., None]
    b = jnp.where(is_cubic, cb, qb)
    db = jnp.where(is_cubic, cd, qd)
    ddb = jnp.where(is_cubic, cdd, qdd)

    c = jnp.sum(b[..., None] * ctrl, axis=-2)
    dc = jnp.sum(db[..., None] * ctrl, axis=-2)
    ddc = jnp.sum(ddb[..., None] * ctrl, axis=-2)
    r = jnp.sum(b * radii, axis=-1)
    dr = jnp.sum(db * radii, axis=-1)
    ddr = jnp.sum(ddb * radii, axis=-1)
    return c, dc, ddc, r, dr, ddr


def refine_swept_hit(origin, direction, t0, s0, ctrl, radii, order,
                     iters: int = 4):
    """Newton-refine a subdivision hit onto the EXACT swept-spline (canal)
    surface. Unknowns (t, s) solve

        f1 = |x - c(s)|^2 - r(s)^2 = 0      (on the sphere at s)
        f2 = (x - c(s)) . c'(s) + r r' = 0  (envelope condition)

    with x = origin + t*direction. Seeded by the linear-subdivision hit
    (t0, global spline parameter s0); converges in 3-4 iterations to float
    precision for the curvature range of hair/strand geometry. Returns
    (t, s, position, normal, converged): position on the exact surface,
    normal = (x - c(s)) / r (the canal surface is tangent to the touching
    sphere). ``converged`` is False for the grazing-ray tail where Newton
    wanders — callers keep the subdivision hit there (the subdivision
    error is bounded, see tests/test_curves_exact.py).
    """
    t, s = t0, s0
    for _ in range(iters):
        c, dc, ddc, r, dr, ddr = spline_point(ctrl, radii, order, s)
        x = origin + t[..., None] * direction
        w = x - c
        f1 = jnp.sum(w * w, axis=-1) - r * r
        f2 = jnp.sum(w * dc, axis=-1) + r * dr
        j11 = 2.0 * jnp.sum(w * direction, axis=-1)
        j12 = -2.0 * (jnp.sum(w * dc, axis=-1) + r * dr)
        j21 = jnp.sum(direction * dc, axis=-1)
        j22 = (-jnp.sum(dc * dc, axis=-1) + jnp.sum(w * ddc, axis=-1)
               + dr * dr + r * ddr)
        det = j11 * j22 - j12 * j21
        safe = jnp.where(jnp.abs(det) > _EPS, det, 1.0)
        dt = (f1 * j22 - f2 * j12) / safe
        ds = (j11 * f2 - j21 * f1) / safe
        ok = jnp.abs(det) > _EPS
        t = jnp.where(ok, t - dt, t)
        s = jnp.clip(jnp.where(ok, s - ds, s), 0.0, 1.0)
    c, dc, ddc, r, dr, ddr = spline_point(ctrl, radii, order, s)
    x = origin + t[..., None] * direction
    w = x - c
    wlen = jnp.linalg.norm(w, axis=-1, keepdims=True)
    normal = w / jnp.maximum(wlen, _EPS)
    position = c + normal * r[..., None]
    resid = jnp.abs(wlen[..., 0] - r)
    converged = (resid < 1e-4 * jnp.maximum(r, 1e-3)) & (
        jnp.abs(t - t0) < 4.0 * jnp.maximum(r, 1e-3))
    return t, s, position, normal[..., 0:3], converged


def subdivide_strand_segments(
    strand_points, segments, mode: str, subdivisions: int | None = None,
    tex_coords=None,
):
    """Host-side: evaluate each spline segment at k+1 points -> k linear
    sphere-swept sub-segments with interpolated attributes.

    Returns dict of numpy arrays: p0, p1, r0, r1 (per sub-segment), color0,
    color1 (N,4), u0, u1 (spline parameter range of each sub-segment),
    tex0, tex1 (user strand texcoord interpolated with the same spline
    basis — ref Curves::GetHitInfo strandU, RayDataDefinations.hpp:32-72;
    defaults to the parametric u when ``tex_coords`` is None), and
    — for quadratic/cubic — ctrl (N, 4, 3), ctrl_r (N, 4) parent control
    points/radii plus order (N,), for the exact-surface refinement.
    """
    import numpy as np

    pts = np.asarray(strand_points, np.float32)
    segments = np.asarray(segments, np.int32)
    texc = (np.asarray(tex_coords, np.float32)
            if tex_coords is not None else None)
    n_ctrl = {"linear": 2, "quadratic": 3, "cubic": 4}[mode]
    k = subdivisions if subdivisions is not None else (
        1 if mode == "linear" else 6
    )
    u = np.linspace(0.0, 1.0, k + 1, dtype=np.float32)
    if mode == "linear":
        basis = np.stack([1 - u, u], axis=-1)
    elif mode == "quadratic":
        basis = np.stack(
            [(1 - u) ** 2 / 2, 0.5 + u * (1 - u), u**2 / 2], axis=-1
        )
    else:
        basis = np.stack(
            [
                (1 - u) ** 3 / 6,
                (3 * u**3 - 6 * u**2 + 4) / 6,
                (-3 * u**3 + 3 * u**2 + 3 * u + 1) / 6,
                u**3 / 6,
            ],
            axis=-1,
        )

    out = {key: [] for key in (
        "p0", "p1", "r0", "r1", "color0", "color1", "u0", "u1",
        "tex0", "tex1", "ctrl", "ctrl_r", "order",
    )}
    order_val = {"linear": 1, "quadratic": 2, "cubic": 3}[mode]
    for seg_start in segments:
        ctrl = pts[seg_start : seg_start + n_ctrl]
        if ctrl.shape[0] < n_ctrl:
            continue
        center = basis @ ctrl[:, :3]  # (k+1, 3)
        radius = basis @ ctrl[:, 3]  # (k+1,)
        if ctrl.shape[1] >= 8:
            color = basis @ ctrl[:, 4:8]
        else:
            color = np.ones((k + 1, 4), np.float32)
        out["p0"].append(center[:-1])
        out["p1"].append(center[1:])
        out["r0"].append(radius[:-1])
        out["r1"].append(radius[1:])
        out["color0"].append(color[:-1])
        out["color1"].append(color[1:])
        out["u0"].append(u[:-1])
        out["u1"].append(u[1:])
        if texc is not None:
            tx = basis @ texc[seg_start : seg_start + n_ctrl]
        else:
            tx = u
        out["tex0"].append(tx[:-1])
        out["tex1"].append(tx[1:])
        ctrl4 = np.zeros((4, 4), np.float32)
        ctrl4[:n_ctrl] = ctrl[:, :4]
        out["ctrl"].append(np.tile(ctrl4[None, :, :3], (k, 1, 1)))
        out["ctrl_r"].append(np.tile(ctrl4[None, :, 3], (k, 1)))
        out["order"].append(np.full(k, order_val, np.float32))
    if not out["p0"]:
        return None
    return {key: np.concatenate(vals, axis=0) for key, vals in out.items()}
