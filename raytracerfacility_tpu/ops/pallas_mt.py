"""Fused whole-path mega-kernel v2: Möller–Trumbore on the MXU.

v1 (ops/pallas_fused.py) broadcasts one scalar triangle against the whole
ray tile per loop step — ~0.06 VPU-cycles per (ray, triangle) pair, which
caps incoherent bounce segments (where AABB culling fails) at ~150 ms per
1080p segment. This kernel reformulates the intersection so the pair work
runs on the MXU instead:

Möller–Trumbore's four pair quantities are each *bilinear* in per-ray and
per-triangle data. With the per-ray feature vector
``g = [d, o, o×d, 1]`` (10 features, padded to 16) and per-triangle
constant rows

    det   = d·(e2×e1)                 -> [e2×e1, 0, 0, 0]
    u_num = (o×d)·e2 − d·(e2×v0)      -> [−(e2×v0), 0, e2, 0]
    v_num = −(o×d)·e1 − d·(v0×e1)     -> [−(v0×e1), 0, −e1, 0]
    t_num = o·n − v0·n,  n = e1×e2    -> [0, n, 0, −v0·n]

every pair's (det, u_num, v_num, t_num) is one f32 matmul
``A_chunk (4·Tc, 16) @ G (16, 512 rays)`` (bf16x3 passes via
``precision=HIGHEST`` — the MXU truncates raw f32 operands to bf16).
The epilogue (accept tests, running-min, winner mask) is plain VPU work at
full (Tc, 512) pair-block density: ~0.011 cycles/pair, ~6x less than v1.
Winner shading attributes come from one more matmul — the one-hot winner
mask times a transposed per-triangle attribute table — so there is no
per-lane gather anywhere.

Layout: rays ride the LANE dimension in (G_ROWS, 512) state planes; one
"group" = 512 rays = one plane row. Per group the kernel slab-tests
SUB-sized Morton runs (dead lanes carry an unbeatable best-t, so fully
dead groups cull to nothing), builds G by copying 10 state rows, and
sweeps the chunk list. Grid = (ray tiles, path segments) — chunks and
groups are in-kernel loops, so the whole 8-bounce frame is ~1.1k grid
steps. Scene tables live wholly in VMEM (A: 4·N·16 f32 — fits ~64k
triangles in 8 MB; larger scenes fall back to v1/XLA paths for now).

Semantics: identical to ops/pallas_fused.py (same statically specialized
feature set, same reference cites). Precision caveat: the accept window
is algebraically identical to ops/intersect.py::moller_trumbore, but the
plane-equation form computes t from the difference of two dot products
(o·n − v0·n). For scenes positioned far from the world origin those
products are large and nearly equal, so this form loses substantially
more precision than the sequential Möller–Trumbore used everywhere else
(catastrophic cancellation, not mere reassociation): hit t and accept
decisions can diverge near the _DET_EPS and tmin boundaries. Keep scenes
near the origin when enabling this path (RTF_TPU_MT=1), or re-center
geometry and ray origins host-side first.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAY_LANES = 512  # rays per group (pair-block lane width)
G_ROWS = int(os.environ.get("RTF_TPU_MT_ROWS", "32"))  # groups per tile
TRI_CHUNK = int(os.environ.get("RTF_TPU_MT_CHUNK", "256"))  # tris per pair block
SUB = 64  # triangles per cullable Morton run; TRI_CHUNK % SUB == 0
_FEAT = 16
_DET_EPS = 1e-12
_TMAX = 1e20
_HIT_MAX = 1e19
_DEAD = -3.0e38
_BIG = 3.0e38
_BOUNCE_TMIN = 1e-3
_MAT_PAD = 8

_LCG_A = 1664525
_LCG_C = 1013904223
_TWO_PI = 6.2831853071795864769

# VMEM cap for the A matrix: 4 * N * 16 * 4 bytes
MAX_TRIS = int(os.environ.get("RTF_TPU_MT_MAX_TRIS", "65536"))


def _cross(a, b):
    return jnp.stack(
        [a[:, 1] * b[:, 2] - a[:, 2] * b[:, 1],
         a[:, 2] * b[:, 0] - a[:, 0] * b[:, 2],
         a[:, 0] * b[:, 1] - a[:, 1] * b[:, 0]], axis=1
    )


def pack_mt_tables(compiled):
    """Build (A, shadeT, sub_aabbs, mat_table) for the v2 kernel.

    A: (nchunks·4·TRI_CHUNK, 16) f32 — chunk-major blocks [det|u|v|t] rows.
    shadeT: (16, N) f32 — rows [n0(3), n1-n0(3), n2-n0(3), mid, pad].
    sub_aabbs: (N/SUB, 8) f32. mat_table: (M, 8) f32 (SMEM).
    """
    from raytracerfacility_tpu.ops.bvh import morton_codes

    g = compiled.geometry
    v0, e1, e2 = g.v0, g.e1, g.e2
    n = v0.shape[0]
    centroid = v0 + (e1 + e2) / 3.0
    lo = jnp.min(jnp.minimum(v0, jnp.minimum(v0 + e1, v0 + e2)), axis=0)
    hi = jnp.max(jnp.maximum(v0, jnp.maximum(v0 + e1, v0 + e2)), axis=0)
    order = jnp.argsort(morton_codes(centroid, lo, hi))
    v0, e1, e2 = v0[order], e1[order], e2[order]
    normals = g.normal[order]
    mat = compiled.instance_material[g.instance[order]]

    pad = (-n) % TRI_CHUNK
    npad = n + pad

    def padrows(a):
        return jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)

    v0p, e1p, e2p = padrows(v0), padrows(e1), padrows(e2)
    nrm = _cross(e1p, e2p)
    det_r = jnp.concatenate(
        [_cross(e2p, e1p), jnp.zeros((npad, _FEAT - 3), jnp.float32)], axis=1)
    u_r = jnp.concatenate(
        [-_cross(e2p, v0p), jnp.zeros((npad, 3), jnp.float32), e2p,
         jnp.zeros((npad, _FEAT - 9), jnp.float32)], axis=1)
    v_r = jnp.concatenate(
        [-_cross(v0p, e1p), jnp.zeros((npad, 3), jnp.float32), -e1p,
         jnp.zeros((npad, _FEAT - 9), jnp.float32)], axis=1)
    t_r = jnp.concatenate(
        [jnp.zeros((npad, 3), jnp.float32), nrm,
         jnp.zeros((npad, 3), jnp.float32),
         -jnp.sum(v0p * nrm, axis=1, keepdims=True),
         jnp.zeros((npad, _FEAT - 10), jnp.float32)], axis=1)
    nchunks = npad // TRI_CHUNK
    # chunk-major [det | u | v | t] row blocks
    blocks = []
    for comp in (det_r, u_r, v_r, t_r):
        blocks.append(comp.reshape(nchunks, TRI_CHUNK, _FEAT))
    a_mat = jnp.concatenate(blocks, axis=1).reshape(nchunks * 4 * TRI_CHUNK, _FEAT)

    n0 = normals[:, 0, :]
    shade = jnp.zeros((npad, 16), jnp.float32)
    shade = shade.at[:n, 0:3].set(n0)
    shade = shade.at[:n, 3:6].set(normals[:, 1, :] - n0)
    shade = shade.at[:n, 6:9].set(normals[:, 2, :] - n0)
    shade = shade.at[:n, 9].set(mat.astype(jnp.float32))
    shade_t = shade.T  # (16, npad)

    big = 3.4e38
    pmin = jnp.minimum(v0p, jnp.minimum(v0p + e1p, v0p + e2p))
    pmax = jnp.maximum(v0p, jnp.maximum(v0p + e1p, v0p + e2p))
    if pad:
        pmin = pmin.at[n:].set(big)
        pmax = pmax.at[n:].set(-big)
    subs = npad // SUB
    sub_aabbs = jnp.zeros((subs, 8), jnp.float32)
    sub_aabbs = sub_aabbs.at[:, 0:3].set(jnp.min(pmin.reshape(subs, SUB, 3), axis=1))
    sub_aabbs = sub_aabbs.at[:, 3:6].set(jnp.max(pmax.reshape(subs, SUB, 3), axis=1))

    mats = compiled.materials
    m = mats.albedo.shape[0]
    mpad = (-m) % _MAT_PAD
    mat_table = jnp.zeros((m + mpad, 8), jnp.float32)
    mat_table = mat_table.at[:m, 0:3].set(mats.albedo)
    mat_table = mat_table.at[:m, 3].set(mats.roughness)
    mat_table = mat_table.at[:m, 4].set(mats.metallic)
    mat_table = mat_table.at[:m, 5].set(mats.emission)
    return a_mat, shade_t, sub_aabbs, mat_table


def _lcg(s):
    s = s * _LCG_A + _LCG_C
    val = (s & 0xFFFFFF).astype(jnp.float32) * (1.0 / 0x1000000)
    return s, val


def _kernel(
    a_ref, shade_ref, sub_ref, mats,
    ox, oy, oz, dx, dy, dz, rng0, valid,
    envc,
    o_rr, o_rg, o_rb, o_nx, o_ny, o_nz, o_ar, o_ag, o_ab,
    o_px, o_py, o_pz, o_cnt,
    s_ox, s_oy, s_oz, s_dx, s_dy, s_dz, s_rng, s_tmin,
    s_tr, s_tg, s_tb, s_rr, s_rg, s_rb, s_act, s_hc,
    s_fnx, s_fny, s_fnz, s_far, s_fag, s_fab, s_fpx, s_fpy, s_fpz,
    s_cx, s_cy, s_cz, s_ivx, s_ivy, s_ivz,
    b_t, b_nx, b_ny, b_nz, b_mid,
    g_scr,
    live,
    *,
    bounces: int,
    num_mats: int,
    nchunks: int,
):
    s = pl.program_id(1)
    nseg = pl.num_programs(1)

    @pl.when(s == 0)
    def _init_tile():
        s_ox[...] = ox[...]
        s_oy[...] = oy[...]
        s_oz[...] = oz[...]
        s_dx[...] = dx[...]
        s_dy[...] = dy[...]
        s_dz[...] = dz[...]
        s_rng[...] = rng0[...]
        zero = jnp.zeros_like(ox[...])
        one = zero + 1.0
        s_tmin[...] = zero
        s_tr[...] = one
        s_tg[...] = one
        s_tb[...] = one
        s_rr[...] = zero
        s_rg[...] = zero
        s_rb[...] = zero
        s_act[...] = valid[...]
        s_hc[...] = zero
        s_fnx[...] = zero
        s_fny[...] = zero
        s_fnz[...] = zero
        s_far[...] = zero
        s_fag[...] = zero
        s_fab[...] = zero
        s_fpx[...] = zero + 999999.0
        s_fpy[...] = zero + 999999.0
        s_fpz[...] = zero + 999999.0
        b_nx[...] = zero
        b_ny[...] = zero
        b_nz[...] = zero
        b_mid[...] = zero
        # constant-1 feature row (index 9); data rows rewritten per group
        rows_i = jax.lax.broadcasted_iota(jnp.int32, (_FEAT, RAY_LANES), 0)
        g_scr[...] = jnp.where(rows_i == 9, 1.0, 0.0)
        live[0] = 0.0
        live[1] = jnp.sum(valid[...])

    any_live = live[1] > 0.0

    @pl.when(any_live)
    def _segment():
        live[0] = live[0] + jnp.sum(s_act[...])
        b_t[...] = jnp.where(s_act[...] > 0.0, _TMAX, _DEAD)
        # per-segment ray derivatives: o x d and safe inverse direction
        d_x, d_y, d_z = s_dx[...], s_dy[...], s_dz[...]
        o_x, o_y, o_z = s_ox[...], s_oy[...], s_oz[...]
        s_cx[...] = o_y * d_z - o_z * d_y
        s_cy[...] = o_z * d_x - o_x * d_z
        s_cz[...] = o_x * d_y - o_y * d_x
        eps = 1e-20
        s_ivx[...] = 1.0 / jnp.where(jnp.abs(d_x) < eps,
                                     jnp.where(d_x < 0, -eps, eps), d_x)
        s_ivy[...] = 1.0 / jnp.where(jnp.abs(d_y) < eps,
                                     jnp.where(d_y < 0, -eps, eps), d_y)
        s_ivz[...] = 1.0 / jnp.where(jnp.abs(d_z) < eps,
                                     jnp.where(d_z < 0, -eps, eps), d_z)

        subs_per_chunk = TRI_CHUNK // SUB
        # tpu.iota only produces integers; cast for the winner-index trick
        tri_iota = jax.lax.broadcasted_iota(
            jnp.int32, (TRI_CHUNK, RAY_LANES), 0).astype(jnp.float32)

        def group_body(gi, _):
            row = lambda ref: ref[pl.ds(gi, 1), :]
            o_xr, o_yr, o_zr = row(s_ox), row(s_oy), row(s_oz)
            ivx, ivy, ivz = row(s_ivx), row(s_ivy), row(s_ivz)
            tmin_r = row(s_tmin)

            def chunk_body(c, _):
                bt_r = b_t[pl.ds(gi, 1), :]
                # ---- sub-run slab culling: (subs_per_chunk, RAY_LANES)
                sc = sub_ref[pl.ds(c * subs_per_chunk, subs_per_chunk), :]
                bx0 = sc[:, 0:1]
                by0 = sc[:, 1:2]
                bz0 = sc[:, 2:3]
                bx1 = sc[:, 3:4]
                by1 = sc[:, 4:5]
                bz1 = sc[:, 5:6]
                t1x = (bx0 - o_xr) * ivx
                t2x = (bx1 - o_xr) * ivx
                t1y = (by0 - o_yr) * ivy
                t2y = (by1 - o_yr) * ivy
                t1z = (bz0 - o_zr) * ivz
                t2z = (bz1 - o_zr) * ivz
                near = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                               jnp.minimum(t1y, t2y)),
                                   jnp.minimum(t1z, t2z))
                far = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                              jnp.maximum(t1y, t2y)),
                                  jnp.maximum(t1z, t2z))
                enter = (near <= far) & (far > tmin_r) & (near < bt_r)

                def run(_):
                    p = jax.lax.dot_general(
                        a_ref[pl.ds(c * 4 * TRI_CHUNK, 4 * TRI_CHUNK), :],
                        g_scr[...],
                        (((1,), (0,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32,
                    )
                    det = p[0:TRI_CHUNK]
                    un = p[TRI_CHUNK:2 * TRI_CHUNK]
                    vn = p[2 * TRI_CHUNK:3 * TRI_CHUNK]
                    tn = p[3 * TRI_CHUNK:4 * TRI_CHUNK]
                    adet = jnp.abs(det)
                    okd = adet > _DET_EPS
                    inv_d = 1.0 / jnp.where(okd, det, 1.0)
                    u = un * inv_d
                    v = vn * inv_d
                    t = tn * inv_d
                    ok = (
                        okd & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                        & (t > tmin_r) & (t < bt_r)
                    )
                    tsel = jnp.where(ok, t, _BIG)
                    tmin_c = jnp.min(tsel, axis=0, keepdims=True)
                    improved = tmin_c < bt_r
                    w0 = tsel == tmin_c
                    idx = jnp.min(jnp.where(w0, tri_iota, _BIG), axis=0,
                                  keepdims=True)
                    w = (tri_iota == idx).astype(jnp.float32)
                    uw = jnp.sum(u * w, axis=0, keepdims=True)
                    vw = jnp.sum(v * w, axis=0, keepdims=True)
                    attrs = jax.lax.dot_general(
                        shade_ref[:, pl.ds(c * TRI_CHUNK, TRI_CHUNK)], w,
                        (((1,), (0,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32,
                    )
                    nxw = attrs[0:1] + uw * attrs[3:4] + vw * attrs[6:7]
                    nyw = attrs[1:2] + uw * attrs[4:5] + vw * attrs[7:8]
                    nzw = attrs[2:3] + uw * attrs[5:6] + vw * attrs[8:9]
                    b_t[pl.ds(gi, 1), :] = jnp.where(improved, tmin_c, bt_r)
                    b_nx[pl.ds(gi, 1), :] = jnp.where(
                        improved, nxw, b_nx[pl.ds(gi, 1), :])
                    b_ny[pl.ds(gi, 1), :] = jnp.where(
                        improved, nyw, b_ny[pl.ds(gi, 1), :])
                    b_nz[pl.ds(gi, 1), :] = jnp.where(
                        improved, nzw, b_nz[pl.ds(gi, 1), :])
                    b_mid[pl.ds(gi, 1), :] = jnp.where(
                        improved, attrs[9:10], b_mid[pl.ds(gi, 1), :])
                    return 0

                jax.lax.cond(jnp.any(enter), run, lambda _: 0, 0)
                return 0

            # build G for this group: rows [d, o, oxd, 1(pre-set)]
            g_scr[0:1, :] = row(s_dx)
            g_scr[1:2, :] = row(s_dy)
            g_scr[2:3, :] = row(s_dz)
            g_scr[3:4, :] = o_xr
            g_scr[4:5, :] = o_yr
            g_scr[5:6, :] = o_zr
            g_scr[6:7, :] = row(s_cx)
            g_scr[7:8, :] = row(s_cy)
            g_scr[8:9, :] = row(s_cz)
            jax.lax.fori_loop(0, nchunks, chunk_body, 0)
            return 0

        jax.lax.fori_loop(0, G_ROWS, group_body, 0)

        # ---- shade (identical math to ops/pallas_fused.py::_shade)
        act = s_act[...] > 0.0
        bt = b_t[...]
        hitm = act & (bt < _HIT_MAX)
        missm = act & ~(bt < _HIT_MAX)
        tr, tg, tb = s_tr[...], s_tg[...], s_tb[...]
        rr, rg, rb = s_rr[...], s_rg[...], s_rb[...]
        hc = s_hc[...]

        er, eg, eb = envc[0], envc[1], envc[2]
        rr = jnp.where(missm, rr + tr * er, rr)
        rg = jnp.where(missm, rg + tg * eg, rg)
        rb = jnp.where(missm, rb + tb * eb, rb)
        pm = missm & (hc == 0.0)
        far_, fag_, fab_ = s_far[...], s_fag[...], s_fab[...]
        far_ = jnp.where(pm, er, far_)
        fag_ = jnp.where(pm, eg, fag_)
        fab_ = jnp.where(pm, eb, fab_)

        mid = b_mid[...]
        ar = jnp.zeros_like(mid)
        ag = jnp.zeros_like(mid)
        ab = jnp.zeros_like(mid)
        ro = jnp.zeros_like(mid)
        me = jnp.zeros_like(mid)
        em = jnp.zeros_like(mid)
        for k in range(num_mats):
            is_k = mid == float(k)
            ar = jnp.where(is_k, mats[k, 0], ar)
            ag = jnp.where(is_k, mats[k, 1], ag)
            ab = jnp.where(is_k, mats[k, 2], ab)
            ro = jnp.where(is_k, mats[k, 3], ro)
            me = jnp.where(is_k, mats[k, 4], me)
            em = jnp.where(is_k, mats[k, 5], em)

        nx, ny, nz = b_nx[...], b_ny[...], b_nz[...]
        inv = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-20))
        nx, ny, nz = nx * inv, ny * inv, nz * inv
        d_x, d_y, d_z = s_dx[...], s_dy[...], s_dz[...]
        dp = d_x * nx + d_y * ny + d_z * nz
        flip = dp > 0.0
        nx = jnp.where(flip, -nx, nx)
        ny = jnp.where(flip, -ny, ny)
        nz = jnp.where(flip, -nz, nz)

        rr = jnp.where(hitm, rr + tr * em * ar, rr)
        rg = jnp.where(hitm, rg + tg * em * ag, rg)
        rb = jnp.where(hitm, rb + tb * em * ab, rb)

        first = hitm & (hc == 0.0)
        o_x, o_y, o_z = s_ox[...], s_oy[...], s_oz[...]
        hx = o_x + bt * d_x
        hy = o_y + bt * d_y
        hz = o_z + bt * d_z
        s_fnx[...] = jnp.where(first, nx, s_fnx[...])
        s_fny[...] = jnp.where(first, ny, s_fny[...])
        s_fnz[...] = jnp.where(first, nz, s_fnz[...])
        far_ = jnp.where(first, ar, far_)
        fag_ = jnp.where(first, ag, fag_)
        fab_ = jnp.where(first, ab, fab_)
        s_far[...] = far_
        s_fag[...] = fag_
        s_fab[...] = fab_
        s_fpx[...] = jnp.where(first, hx, s_fpx[...])
        s_fpy[...] = jnp.where(first, hy, s_fpy[...])
        s_fpz[...] = jnp.where(first, hz, s_fpz[...])

        new_hc = jnp.where(hitm, hc + 1.0, hc)
        cont = hitm & (new_hc <= float(bounces))

        dpf = d_x * nx + d_y * ny + d_z * nz
        rx = d_x - 2.0 * dpf * nx
        ry = d_y - 2.0 * dpf * ny
        rz = d_z - 2.0 * dpf * nz
        rng = s_rng[...]
        rng2, u_cos = _lcg(rng)
        rng2, u_phi = _lcg(rng2)
        one_minus = 1.0 - me
        cos_t = 1.0 - u_cos * one_minus * one_minus
        sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
        phi = _TWO_PI * u_phi
        lx = jnp.cos(phi) * sin_t
        ly = jnp.sin(phi) * sin_t
        lz = cos_t
        use_z = jnp.abs(rx) > 0.99
        hx_ = jnp.where(use_z, 0.0, 1.0)
        hz_ = jnp.where(use_z, 1.0, 0.0)
        tx = ry * hz_
        ty = rz * hx_ - rx * hz_
        tz = -ry * hx_
        tinv = jax.lax.rsqrt(jnp.maximum(tx * tx + ty * ty + tz * tz, 1e-20))
        tx, ty, tz = tx * tinv, ty * tinv, tz * tinv
        bx = ry * tz - rz * ty
        by = rz * tx - rx * tz
        bz = rx * ty - ry * tx
        binv = jax.lax.rsqrt(jnp.maximum(bx * bx + by * by + bz * bz, 1e-20))
        bx, by, bz = bx * binv, by * binv, bz * binv
        ndx = tx * lx + bx * ly + rx * lz
        ndy = ty * lx + by * ly + ry * lz
        ndz = tz * lx + bz * ly + rz * lz

        f = jnp.where(me >= 0.0, (me + 2.0) / (me + 1.0), 1.0)
        ndotl = jnp.abs(nx * ndx + ny * ndy + nz * ndz)
        w = jnp.clip(ndotl * ro + (1.0 - ro) * f, 0.0, 1.0)

        s_tr[...] = jnp.where(cont, tr * ar * w, tr)
        s_tg[...] = jnp.where(cont, tg * ag * w, tg)
        s_tb[...] = jnp.where(cont, tb * ab * w, tb)
        s_ox[...] = jnp.where(cont, hx, o_x)
        s_oy[...] = jnp.where(cont, hy, o_y)
        s_oz[...] = jnp.where(cont, hz, o_z)
        s_dx[...] = jnp.where(cont, ndx, d_x)
        s_dy[...] = jnp.where(cont, ndy, d_y)
        s_dz[...] = jnp.where(cont, ndz, d_z)
        s_tmin[...] = jnp.where(cont, _BOUNCE_TMIN, s_tmin[...])
        s_rng[...] = jnp.where(cont, rng2, rng)
        s_rr[...] = rr
        s_rg[...] = rg
        s_rb[...] = rb
        s_hc[...] = new_hc
        new_act = cont.astype(jnp.float32)
        s_act[...] = new_act
        live[1] = jnp.sum(new_act)

    @pl.when(s == nseg - 1)
    def _write_outputs():
        o_rr[...] = s_rr[...]
        o_rg[...] = s_rg[...]
        o_rb[...] = s_rb[...]
        o_nx[...] = s_fnx[...]
        o_ny[...] = s_fny[...]
        o_nz[...] = s_fnz[...]
        o_ar[...] = s_far[...]
        o_ag[...] = s_fag[...]
        o_ab[...] = s_fab[...]
        o_px[...] = s_fpx[...]
        o_py[...] = s_fpy[...]
        o_pz[...] = s_fpz[...]
        shape = s_rr[...].shape
        rows_i = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        cols_i = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        o_cnt[...] = jnp.where((rows_i == 0) & (cols_i == 0), live[0], 0.0)


@functools.partial(jax.jit, static_argnames=("bounces", "interpret"))
def _render_pool(a_mat, shade_t, sub_aabbs, mat_table, origin, direction,
                 rng, valid, env_rgb, bounces: int, interpret: bool = False):
    r = origin.shape[0]
    block = G_ROWS * RAY_LANES
    pad = (-r) % block
    if pad:
        origin = jnp.concatenate([origin, jnp.zeros((pad, 3), jnp.float32)], 0)
        direction = jnp.concatenate(
            [direction,
             jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (pad, 1))], 0)
        rng = jnp.concatenate([rng, jnp.zeros((pad,), jnp.uint32)])
        valid = jnp.concatenate([valid, jnp.zeros((pad,), jnp.float32)])
    rp = r + pad
    rows = rp // RAY_LANES
    tiles = rows // G_ROWS

    def plane(x):
        return x.reshape(rows, RAY_LANES)

    rng_i = jax.lax.bitcast_convert_type(rng, jnp.int32)
    ray_ins = (
        plane(origin[:, 0]), plane(origin[:, 1]), plane(origin[:, 2]),
        plane(direction[:, 0]), plane(direction[:, 1]), plane(direction[:, 2]),
        plane(rng_i), plane(valid),
    )

    nseg = bounces + 1
    nchunks = shade_t.shape[1] // TRI_CHUNK
    grid = (tiles, nseg)

    ray_spec = pl.BlockSpec((G_ROWS, RAY_LANES), lambda i, s: (i, 0))
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    plane_shape = jax.ShapeDtypeStruct((rows, RAY_LANES), jnp.float32)
    splane = pltpu.VMEM((G_ROWS, RAY_LANES), jnp.float32)
    scratch = (
        [splane] * 6
        + [pltpu.VMEM((G_ROWS, RAY_LANES), jnp.int32)]
        + [splane] * 18
        + [splane] * 6  # cx, cy, cz, ivx, ivy, ivz
        + [splane] * 5  # b_t, b_nx, b_ny, b_nz, b_mid
        + [pltpu.VMEM((_FEAT, RAY_LANES), jnp.float32)]  # G
        + [pltpu.SMEM((2,), jnp.float32)]
    )

    kernel = functools.partial(
        _kernel, bounces=bounces, num_mats=int(mat_table.shape[0]),
        nchunks=nchunks,
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=(full, full, full, smem) + (ray_spec,) * 8 + (smem,),
        out_specs=(ray_spec,) * 13,
        out_shape=(plane_shape,) * 13,
        scratch_shapes=scratch,
        interpret=interpret,
    )(a_mat, shade_t, sub_aabbs, mat_table, *ray_ins, env_rgb)

    def unplane3(a, b, c):
        return jnp.stack(
            [a.reshape(rp)[:r], b.reshape(rp)[:r], c.reshape(rp)[:r]], axis=-1)

    radiance = unplane3(*outs[0:3])
    normal = unplane3(*outs[3:6])
    albedo = unplane3(*outs[6:9])
    position = unplane3(*outs[9:12])
    count = jnp.sum(outs[12])
    return radiance, normal, albedo, position, count


def render_pool_mt(
    tables, origin, direction, rng, valid, env_rgb, bounces: int,
    interpret: bool | None = None,
):
    """Public entry: ``tables`` from :func:`pack_mt_tables`."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    a_mat, shade_t, sub_aabbs, mat_table = tables
    return _render_pool(
        a_mat, shade_t, sub_aabbs, mat_table, origin, direction, rng, valid,
        env_rgb, bounces=bounces, interpret=bool(interpret),
    )
