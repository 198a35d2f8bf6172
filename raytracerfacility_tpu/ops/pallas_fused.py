"""Fused whole-path Pallas mega-kernel: the entire camera render — trace,
shade, environment, BRDF sampling, bounce — as ONE kernel execution.

Round-1 measured the frame cost split on the tunneled v5e: ~45 ms/segment
of Pallas trace (ops/pallas_brute.py) plus ~400 ms of XLA shading dispatch
per 1080p 8-bounce frame, with 77% of lane-trace work spent on dead lanes
(only ~4.3M of 18.6M lane-segments are live). This kernel removes both
costs at once:

* The segment (bounce) loop becomes a GRID AXIS: grid = (ray tiles,
  path segments, triangle chunks). Per-ray path state (origin, direction,
  throughput, radiance, RNG, AOVs) persists in VMEM scratch across grid
  steps — scratch survives the whole sweep of one ray tile, and every
  tile re-initializes at its (segment 0, chunk 0) step.
* Shading runs inside the kernel at each segment's last chunk as planar
  vector ops; the XLA per-segment dispatch chain disappears.
* A tile whose lanes are all dead skips every remaining body via
  ``@pl.when`` on an SMEM liveness scalar (measured ~2 us per skipped
  grid step vs ~180 us for a live trace step).
* Triangle + shading data ride in an SMEM-windowed table (scalar loads
  broadcast natively against the ray tile; VMEM dynamic scalar loads
  measured ~3x slower, and DMA into SMEM scratch crashes this
  toolchain's Mosaic backend, so BlockSpec windowing is the only fill
  path). Hit attributes are interpolated *during* the triangle loop — on
  an accepted hit the triangle's corner normals blend into VMEM
  best-hit planes via read-modify-write under the accept mask, which
  keeps the loop carry to a single plane (a 10-plane carry measured 8x
  slower from register spills). Material constants resolve at shade time
  from a per-tile material-id plane via a short static loop over the
  scene's (small) material table.

Semantics match models/pathtracer.py::_segment for the statically
specializable feature set (the same set the reference specializes SBT
programs for): triangle-only scene, MaterialType::Default without
textures / BTF / subsurface / alpha cutout, Scene environment with flat
color (no cubemap). The renderer dispatches here when the compiled scene
and RenderConfig qualify, else falls back to the general wavefront engine.

Reference semantics reproduced (file:line cites into /root/reference):
ray loop + accumulation ptx/CameraRendering.cu:32-147; path step
RayFunctions.cuh:25-171 (emission :168-171, energy recurrence :152-161,
first-hit AOVs :163-167); BRDF cone sample BSDF.cuh:6-13; miss radiance
Environment.cuh:147-175 (Scene branch, flat color); RNG
LinearCongruenceGenerator.hpp:28-33 (24-bit LCG; the TEA init runs in XLA
before the kernel).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# ray tile = (BLOCK_ROWS, 128) lanes. 32 rows (4096-ray tiles) beat 64
# on the real chip at 1080p (8.24 vs 7.08 Mrays/s): tighter per-tile
# frusta cull more sub-runs than the extra grid steps cost; 16 and 128
# both regress (6.8 / 5.7)
BLOCK_ROWS = int(os.environ.get("RTF_TPU_FUSED_ROWS", "32"))
# triangles per SMEM window (rows x 20 cols; 512x20 x2 double-buffered
# windows = ~655 KB fits SMEM). PER-SCENE (round 3): small scenes want
# 256 (finer level-1 slab culls: fused 9.46 -> 9.85 at 1080p/2.7k tris),
# big scenes want 512 (the 111k-tri canopy estimate measured 1.14 s at
# 512 vs ~1.5 s at 256 — at 440 windows the per-step floor dominates).
# RTF_TPU_FUSED_CHUNK forces one size for every scene (sweeps).
_CHUNK_ENV = os.environ.get("RTF_TPU_FUSED_CHUNK")
TRI_CHUNK = int(_CHUNK_ENV or "256")  # legacy default for direct callers


def auto_chunk(num_tris: int) -> int:
    """Per-scene SMEM window size (env override wins).

    The chunk cannot grow past 512: the per-chunk table window is
    SMEM-resident at 512 B/row with 2 buffering levels (chunk=512 ->
    ~524 KB of the ~1 MB core SMEM; chunk=2048 was measured to fail
    program load with "Allocation (size=2097152) would exceed memory
    (size=1048576), space=smem" on the 1.04M-tri config 6). Many-chunk
    scenes instead fit the (tiles, nchunks) order/skip tables by
    scaling the TILE height — see ops/pallas_seg._pick_block_rows.
    """
    if _CHUNK_ENV is not None:
        return int(_CHUNK_ENV)
    return 512 if num_tris >= 65536 else 256
# triangles per cullable sub-chunk (Morton-ordered runs); TRI_CHUNK/SUB
# must be a multiple of 8 (TPU block-shape rule for the sub-AABB window).
# 16 measured best once the segmented engine's windowed reorder landed
# (29.8 vs 24.9 Mrays/s at 1080p with SEG_ROWS=32); 32 was the round-2
# best, 64 regresses.
SUB = int(os.environ.get("RTF_TPU_FUSED_SUB", "16"))
# primitive-loop unroll; 0 = auto (full unroll of the SUB run on the real
# chip, none in interpret mode). Mosaic honors ONLY full unroll of a
# statically-bounded fori_loop; full unroll measured +24% at 1080p
# (9.48 vs 8.24 Mrays/s at ROWS=32) by overlapping SMEM scalar loads
# with the previous row's vector math. Interpret mode (CPU tests) skips
# it: unrolling just multiplies trace time there.
UNROLL = int(os.environ.get("RTF_TPU_UNROLL", "0"))


def resolve_unroll(interpret: bool, sub: int = None) -> int:
    """Map the UNROLL env knob to a concrete fori_loop unroll factor."""
    if UNROLL > 0:
        return UNROLL
    return 1 if interpret else (SUB if sub is None else sub)
_LANES = 128
_DET_EPS = 1e-12
_TMAX = 1e20
_HIT_MAX = 1e19  # b_t below this => real hit
_DEAD = -3.0e38  # b_t for dead lanes: no AABB can beat it
_BOUNCE_TMIN = 1e-3
_MAT_PAD = 8  # material table rows padded to a multiple of this

_COLS = 20
# table columns: 0:9 v0,e1,e2 | 9 orig prim id | 10:19 n0, n1-n0, n2-n0
# | 19 material slot (exact small-int float)

_LCG_A = 1664525
_LCG_C = 1013904223
_TWO_PI = 6.2831853071795864769


def pack_fused_tables(compiled, chunk: int | None = None,
                      sub: int | None = None):
    """Build the (N, 20) SMEM trace+shade table, the (N/sub, 8) sub-run
    AABBs, the per-chunk AABBs and the (M, 8) material constant table
    from a CompiledScene. Morton-orders triangles so sub-sized runs are
    spatially compact; pads to a ``chunk`` multiple with degenerate
    triangles under inverted AABBs. ``chunk`` defaults per-scene
    (:func:`auto_chunk`); ``sub`` to the SUB env default.
    Returns (table, sub_aabbs, chunk_aabbs, mat_table). The chunk size is
    NOT recoverable from the returned shapes (chunk_aabbs is padded) —
    callers persist it (CompiledScene.fused_chunk) and pass it back into
    the render entry points."""
    from raytracerfacility_tpu.ops.bvh import morton_codes

    g = compiled.geometry
    v0, e1, e2 = g.v0, g.e1, g.e2
    n = v0.shape[0]
    chunk = auto_chunk(n) if chunk is None else int(chunk)
    sub = SUB if sub is None else int(sub)
    # fail fast on knob combos the TPU block-shape rules reject (the
    # sub-AABB window is (chunk//sub, 8), so chunk//sub must be a
    # positive multiple of 8) — a bad combo otherwise surfaces as an
    # opaque Mosaic compile error deep inside the kernel call
    if chunk % sub != 0 or (chunk // sub) % 8 != 0:
        raise ValueError(
            f"chunk={chunk} must be a multiple of sub={sub} with "
            f"chunk//sub a multiple of 8 (TPU sub-AABB window shape)")
    centroid = v0 + (e1 + e2) / 3.0
    lo = jnp.min(jnp.minimum(v0, jnp.minimum(v0 + e1, v0 + e2)), axis=0)
    hi = jnp.max(jnp.maximum(v0, jnp.maximum(v0 + e1, v0 + e2)), axis=0)
    order = jnp.argsort(morton_codes(centroid, lo, hi))
    v0, e1, e2 = v0[order], e1[order], e2[order]
    normals = g.normal[order]  # (N, 3 corners, 3)
    mat = compiled.instance_material[g.instance[order]]

    pad = (-n) % chunk
    table = jnp.zeros((n + pad, _COLS), jnp.float32)
    table = table.at[:n, 0:3].set(v0)
    table = table.at[:n, 3:6].set(e1)
    table = table.at[:n, 6:9].set(e2)
    table = table.at[:n, 9].set(order.astype(jnp.float32))
    n0 = normals[:, 0, :]
    table = table.at[:n, 10:13].set(n0)
    table = table.at[:n, 13:16].set(normals[:, 1, :] - n0)
    table = table.at[:n, 16:19].set(normals[:, 2, :] - n0)
    table = table.at[:n, 19].set(mat.astype(jnp.float32))

    big = 3.4e38
    pmin = jnp.minimum(v0, jnp.minimum(v0 + e1, v0 + e2))
    pmax = jnp.maximum(v0, jnp.maximum(v0 + e1, v0 + e2))
    pmin = jnp.concatenate([pmin, jnp.full((pad, 3), big, jnp.float32)], axis=0)
    pmax = jnp.concatenate([pmax, jnp.full((pad, 3), -big, jnp.float32)], axis=0)
    subs = (n + pad) // sub
    sub_aabbs = jnp.zeros((subs, 8), jnp.float32)
    sub_aabbs = sub_aabbs.at[:, 0:3].set(jnp.min(pmin.reshape(subs, sub, 3), axis=1))
    sub_aabbs = sub_aabbs.at[:, 3:6].set(jnp.max(pmax.reshape(subs, sub, 3), axis=1))
    nchunks = (n + pad) // chunk
    chunk_aabbs = jnp.zeros((max(nchunks, 8), 8), jnp.float32)
    chunk_aabbs = chunk_aabbs.at[:, 0:3].set(3.4e38).at[:, 3:6].set(-3.4e38)
    chunk_aabbs = chunk_aabbs.at[:nchunks, 0:3].set(
        jnp.min(pmin.reshape(nchunks, chunk, 3), axis=1))
    chunk_aabbs = chunk_aabbs.at[:nchunks, 3:6].set(
        jnp.max(pmax.reshape(nchunks, chunk, 3), axis=1))
    cpad = (-chunk_aabbs.shape[0]) % 8
    if cpad:
        fill = jnp.zeros((cpad, 8), jnp.float32)
        fill = fill.at[:, 0:3].set(3.4e38).at[:, 3:6].set(-3.4e38)
        chunk_aabbs = jnp.concatenate([chunk_aabbs, fill], axis=0)

    return table, sub_aabbs, chunk_aabbs, pack_material_table(compiled.materials)


def pack_material_table(mats):
    """(M_pad, 8) SMEM material constants. Split out so material-value
    edits re-pack only this table (incremental rebuilds, scene/builder)."""
    m = mats.albedo.shape[0]
    mpad = (-m) % _MAT_PAD
    mat_table = jnp.zeros((m + mpad, 8), jnp.float32)
    mat_table = mat_table.at[:m, 0:3].set(mats.albedo)
    mat_table = mat_table.at[:m, 3].set(mats.roughness)
    mat_table = mat_table.at[:m, 4].set(mats.metallic)
    mat_table = mat_table.at[:m, 5].set(mats.emission)
    return mat_table


def _lcg(s):
    """One LCG draw on int32 planes (bit-identical to ops/rng.py::lcg_next:
    int32 wraparound == uint32; the masked low 24 bits are non-negative)."""
    s = s * _LCG_A + _LCG_C
    val = (s & 0xFFFFFF).astype(jnp.float32) * (1.0 / 0x1000000)
    return s, val


def _kernel(
    # SMEM-windowed scene tables + full material table
    tris, subs, chunks_ref, mats,
    # per-tile ray inputs (VMEM planes)
    ox, oy, oz, dx, dy, dz, rng0, valid,
    # SMEM scalars: env radiance rgb
    envc,
    # outputs (VMEM planes, revisited per tile)
    o_rr, o_rg, o_rb, o_nx, o_ny, o_nz, o_ar, o_ag, o_ab,
    o_px, o_py, o_pz, o_cnt,
    # scratch: path state
    s_ox, s_oy, s_oz, s_dx, s_dy, s_dz, s_rng, s_tmin,
    s_tr, s_tg, s_tb, s_rr, s_rg, s_rb, s_act, s_hc,
    s_fnx, s_fny, s_fnz, s_far, s_fag, s_fab, s_fpx, s_fpy, s_fpz,
    # scratch: per-segment best-hit record (b_pid = original prim id of the
    # best hit, for exact-tie determinism vs pallas_brute / the XLA oracle)
    b_t, b_nx, b_ny, b_nz, b_mid, b_pid,
    # scratch: SingleLightSource shadow state (hit pos, sun dir, N.L,
    # occlusion record); allocated tiny when lighting == 0
    s_hx, s_hy, s_hz, s_sdx, s_sdy, s_sdz, s_ndl, b_oc,
    # SMEM scratch: [0] = cumulative live count, [1] = live lanes now
    live,
    *,
    bounces: int,
    num_mats: int,
    lighting: int,
    nchunks: int,
    unroll: int,
    chunk: int,
    sub: int,
):
    s = pl.program_id(1)
    c = pl.program_id(2)
    nseg = pl.num_programs(1)
    nchunk = pl.num_programs(2)  # = phases * nchunks

    @pl.when((s == 0) & (c == 0))
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
        # envc[10] = primary-ray tmin (0 for camera rays; probe pools use
        # the estimator's 1e-3 offset, ref IlluminationEstimation.cu:63)
        s_tmin[...] = zero + envc[10]
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
        # ref CameraRendering.cu:48 "no hit" position sentinel
        s_fpx[...] = zero + 999999.0
        s_fpy[...] = zero + 999999.0
        s_fpz[...] = zero + 999999.0
        b_nx[...] = zero
        b_ny[...] = zero
        b_nz[...] = zero
        b_mid[...] = zero
        b_pid[...] = zero + 3.4e38
        live[0] = 0.0
        live[1] = jnp.sum(valid[...])

    any_live = live[1] > 0.0

    @pl.when((c == 0) & any_live)
    def _segment_start():
        live[0] = live[0] + jnp.sum(s_act[...])
        # dead lanes get an unbeatable best-t so no AABB admits them
        b_t[...] = jnp.where(s_act[...] > 0.0, _TMAX, _DEAD)
        b_pid[...] = jnp.zeros_like(b_pid[...]) + 3.4e38

    @pl.when(any_live & (c < nchunks))
    def _trace_chunk():
        o_x, o_y, o_z = s_ox[...], s_oy[...], s_oz[...]
        d_x, d_y, d_z = s_dx[...], s_dy[...], s_dz[...]
        tmin_v = s_tmin[...]
        eps = 1e-20
        ivx = 1.0 / jnp.where(jnp.abs(d_x) < eps,
                              jnp.where(d_x < 0, -eps, eps), d_x)
        ivy = 1.0 / jnp.where(jnp.abs(d_y) < eps,
                              jnp.where(d_y < 0, -eps, eps), d_y)
        ivz = 1.0 / jnp.where(jnp.abs(d_z) < eps,
                              jnp.where(d_z < 0, -eps, eps), d_z)

        def tri_body(j, carry):
            bt, nx, ny, nz, mid, bpid = carry
            v0x, v0y, v0z = tris[j, 0], tris[j, 1], tris[j, 2]
            e1x, e1y, e1z = tris[j, 3], tris[j, 4], tris[j, 5]
            e2x, e2y, e2z = tris[j, 6], tris[j, 7], tris[j, 8]
            # Moller-Trumbore: one scalar triangle vs the whole tile
            # (accept window identical to ops/intersect.py:moller_trumbore)
            pvx = d_y * e2z - d_z * e2y
            pvy = d_z * e2x - d_x * e2z
            pvz = d_x * e2y - d_y * e2x
            det = e1x * pvx + e1y * pvy + e1z * pvz
            ok_det = jnp.abs(det) > _DET_EPS
            inv_det = 1.0 / jnp.where(ok_det, det, 1.0)
            tvx = o_x - v0x
            tvy = o_y - v0y
            tvz = o_z - v0z
            u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
            qvx = tvy * e1z - tvz * e1y
            qvy = tvz * e1x - tvx * e1z
            qvz = tvx * e1y - tvy * e1x
            v = (d_x * qvx + d_y * qvy + d_z * qvz) * inv_det
            t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
            jf = tris[j, 9]
            # exact ties resolve to the lowest ORIGINAL primitive index,
            # matching pallas_brute and the XLA oracle (shared mesh edges
            # tie exactly on bounce rays)
            ok = (
                ok_det & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                & (t > tmin_v) & ((t < bt) | ((t == bt) & (jf < bpid)))
            )
            # interpolate-on-improve: blend this triangle's corner normals
            # + material id into the best-hit record under the accept mask.
            # The record rides the loop CARRY (registers); per-triangle
            # VMEM read-modify-writes of the same planes measured 4x the
            # whole trace cost.
            return (
                jnp.where(ok, t, bt),
                jnp.where(ok, tris[j, 10] + u * tris[j, 13] + v * tris[j, 16], nx),
                jnp.where(ok, tris[j, 11] + u * tris[j, 14] + v * tris[j, 17], ny),
                jnp.where(ok, tris[j, 12] + u * tris[j, 15] + v * tris[j, 18], nz),
                jnp.where(ok, tris[j, 19], mid),
                jnp.where(ok, jf, bpid),
            )

        def slab(bx0, by0, bz0, bx1, by1, bz1, bt):
            t1x = (bx0 - o_x) * ivx
            t2x = (bx1 - o_x) * ivx
            t1y = (by0 - o_y) * ivy
            t2y = (by1 - o_y) * ivy
            t1z = (bz0 - o_z) * ivz
            t2z = (bz1 - o_z) * ivz
            near = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                           jnp.minimum(t1y, t2y)),
                               jnp.minimum(t1z, t2z))
            far = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                          jnp.maximum(t1y, t2y)),
                              jnp.maximum(t1z, t2z))
            # <= so a tie candidate on a run boundary is still visited
            return (near <= far) & (far > tmin_v) & (near <= bt)

        def sub_body(si, carry):
            enter = slab(subs[si, 0], subs[si, 1], subs[si, 2],
                         subs[si, 3], subs[si, 4], subs[si, 5], carry[0])

            def run(b):
                # static 0..sub bounds with the run offset applied inside:
                # `unroll` requires statically known loop bounds
                return jax.lax.fori_loop(
                    0, sub, lambda k, bb: tri_body(si * sub + k, bb), b,
                    unroll=unroll)

            return jax.lax.cond(jnp.any(enter), run, lambda b: b, carry)

        carry = (b_t[...], b_nx[...], b_ny[...], b_nz[...], b_mid[...],
                 b_pid[...])
        # level-1 cull: the whole TRI_CHUNK window vs the tile (the sub_body
        # slab is level 2); dead lanes carry _DEAD best-t and fall out
        entered = slab(chunks_ref[c, 0], chunks_ref[c, 1], chunks_ref[c, 2],
                       chunks_ref[c, 3], chunks_ref[c, 4], chunks_ref[c, 5],
                       carry[0])

        def run_chunk(b):
            return jax.lax.fori_loop(0, chunk // sub, sub_body, b)

        carry = jax.lax.cond(jnp.any(entered), run_chunk, lambda b: b, carry)
        b_t[...] = carry[0]
        b_nx[...] = carry[1]
        b_ny[...] = carry[2]
        b_nz[...] = carry[3]
        b_mid[...] = carry[4]
        b_pid[...] = carry[5]

    def _mat_resolve(mid):
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
        return ar, ag, ab, ro, me, em

    if lighting == 1:
        # ---- SingleLightSource mid-shade at the end of the closest-hit
        # phase: normalize/flip the hit normal, sample the sun cone
        # (ref RayFunctions.cuh:61-92; draw order matches
        # math3d.sample_hemisphere with alpha = 1 - lightSize) and arm the
        # shadow sweep of phase 1
        @pl.when((c == nchunks - 1) & any_live)
        def _sls_mid():
            act = s_act[...] > 0.0
            bt = b_t[...]
            hitm = act & (bt < _HIT_MAX)
            nx, ny, nz = b_nx[...], b_ny[...], b_nz[...]
            inv = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz,
                                            1e-20))
            nx, ny, nz = nx * inv, ny * inv, nz * inv
            d_x, d_y, d_z = s_dx[...], s_dy[...], s_dz[...]
            dp = d_x * nx + d_y * ny + d_z * nz
            flip = dp > 0.0
            nx = jnp.where(flip, -nx, nx)
            ny = jnp.where(flip, -ny, ny)
            nz = jnp.where(flip, -nz, nz)
            b_nx[...] = nx
            b_ny[...] = ny
            b_nz[...] = nz
            o_xx, o_yy, o_zz = s_ox[...], s_oy[...], s_oz[...]
            s_hx[...] = o_xx + bt * d_x
            s_hy[...] = o_yy + bt * d_y
            s_hz[...] = o_zz + bt * d_z
            # sun-cone sample around envc[6:9] with alpha = envc[9]
            rng = s_rng[...]
            rng2, u_cos = _lcg(rng)
            rng2, u_phi = _lcg(rng2)
            alpha = envc[9]
            one_minus = 1.0 - alpha
            cos_t = 1.0 - u_cos * one_minus * one_minus
            sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
            phi = _TWO_PI * u_phi
            lx = jnp.cos(phi) * sin_t
            ly = jnp.sin(phi) * sin_t
            lz = cos_t
            sx, sy, sz = envc[6], envc[7], envc[8]
            zero = jnp.zeros_like(nx)
            use_z = jnp.abs(sx) > 0.99
            hxh = jnp.where(use_z, zero, zero + 1.0)
            hzh = jnp.where(use_z, zero + 1.0, zero)
            tx = sy * hzh
            ty = sz * hxh - sx * hzh
            tz = -sy * hxh
            tinv = jax.lax.rsqrt(jnp.maximum(tx * tx + ty * ty + tz * tz,
                                             1e-20))
            tx, ty, tz = tx * tinv, ty * tinv, tz * tinv
            bx = sy * tz - sz * ty
            by = sz * tx - sx * tz
            bz = sx * ty - sy * tx
            binv = jax.lax.rsqrt(jnp.maximum(bx * bx + by * by + bz * bz,
                                             1e-20))
            bx, by, bz = bx * binv, by * binv, bz * binv
            sdx = tx * lx + bx * ly + sx * lz
            sdy = ty * lx + by * ly + sy * lz
            sdz = tz * lx + bz * ly + sz * lz
            s_sdx[...] = sdx
            s_sdy[...] = sdy
            s_sdz[...] = sdz
            ndl = nx * sdx + ny * sdy + nz * sdz
            s_ndl[...] = ndl
            s_rng[...] = jnp.where(hitm, rng2, rng)
            # arm shadow rays only for NEE-eligible lanes
            # (ref RayFunctions.cuh:61-92: accepted hit, N.L > 0)
            b_oc[...] = jnp.where(hitm & (ndl > 0.0), _TMAX, _DEAD)

        # ---- phase-1 occlusion sweep: any-hit over the same windows
        # (ref TERMINATE_ON_FIRST_HIT shadow rays, RayFunctions.cuh:81-92)
        @pl.when(any_live & (c >= nchunks))
        def _shadow_chunk():
            o_x, o_y, o_z = s_hx[...], s_hy[...], s_hz[...]
            d_x, d_y, d_z = s_sdx[...], s_sdy[...], s_sdz[...]
            tmin_v = jnp.zeros_like(o_x) + _BOUNCE_TMIN
            eps = 1e-20
            ivx = 1.0 / jnp.where(jnp.abs(d_x) < eps,
                                  jnp.where(d_x < 0, -eps, eps), d_x)
            ivy = 1.0 / jnp.where(jnp.abs(d_y) < eps,
                                  jnp.where(d_y < 0, -eps, eps), d_y)
            ivz = 1.0 / jnp.where(jnp.abs(d_z) < eps,
                                  jnp.where(d_z < 0, -eps, eps), d_z)

            def tri_any(j, bt):
                v0x, v0y, v0z = tris[j, 0], tris[j, 1], tris[j, 2]
                e1x, e1y, e1z = tris[j, 3], tris[j, 4], tris[j, 5]
                e2x, e2y, e2z = tris[j, 6], tris[j, 7], tris[j, 8]
                pvx = d_y * e2z - d_z * e2y
                pvy = d_z * e2x - d_x * e2z
                pvz = d_x * e2y - d_y * e2x
                det = e1x * pvx + e1y * pvy + e1z * pvz
                ok_det = jnp.abs(det) > _DET_EPS
                inv_det = 1.0 / jnp.where(ok_det, det, 1.0)
                tvx = o_x - v0x
                tvy = o_y - v0y
                tvz = o_z - v0z
                u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
                qvx = tvy * e1z - tvz * e1y
                qvy = tvz * e1x - tvx * e1z
                qvz = tvx * e1y - tvy * e1x
                v = (d_x * qvx + d_y * qvy + d_z * qvz) * inv_det
                t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
                ok = (
                    ok_det & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                    & (t > tmin_v) & (t < bt)
                )
                # first-hit exit: poison so later slabs cull this lane
                return jnp.where(ok, _DEAD, bt)

            def shadow_slab(bx0, by0, bz0, bx1, by1, bz1, bt):
                t1x = (bx0 - o_x) * ivx
                t2x = (bx1 - o_x) * ivx
                t1y = (by0 - o_y) * ivy
                t2y = (by1 - o_y) * ivy
                t1z = (bz0 - o_z) * ivz
                t2z = (bz1 - o_z) * ivz
                near = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                               jnp.minimum(t1y, t2y)),
                                   jnp.minimum(t1z, t2z))
                far = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                              jnp.maximum(t1y, t2y)),
                                  jnp.maximum(t1z, t2z))
                return (near <= far) & (far > tmin_v) & (near < bt)

            def sub_any(si, bt):
                enter = shadow_slab(subs[si, 0], subs[si, 1], subs[si, 2],
                                    subs[si, 3], subs[si, 4], subs[si, 5], bt)

                def run(b):
                    return jax.lax.fori_loop(
                        0, sub, lambda k, bb: tri_any(si * sub + k, bb), b,
                        unroll=unroll)

                return jax.lax.cond(jnp.any(enter), run, lambda b: b, bt)

            # level-1 cull of the shadow sweep (occluded lanes carry _DEAD
            # and fall out; fully-occluded tiles skip the window body)
            ci = c - nchunks
            entered = shadow_slab(
                chunks_ref[ci, 0], chunks_ref[ci, 1], chunks_ref[ci, 2],
                chunks_ref[ci, 3], chunks_ref[ci, 4], chunks_ref[ci, 5],
                b_oc[...])

            def run_shadow(b):
                return jax.lax.fori_loop(0, chunk // sub, sub_any, b)

            b_oc[...] = jax.lax.cond(jnp.any(entered), run_shadow,
                                     lambda b: b, b_oc[...])

        # ---- final SLS shade (ref RayFunctions.cuh:61-92: ambient +
        # one sun NEE sample, no continuation; emission :168-171)
        @pl.when((c == nchunk - 1) & any_live)
        def _sls_shade():
            act = s_act[...] > 0.0
            bt = b_t[...]
            hitm = act & (bt < _HIT_MAX)
            missm = act & ~(bt < _HIT_MAX)
            tr, tg, tb = s_tr[...], s_tg[...], s_tb[...]
            rr, rg, rb = s_rr[...], s_rg[...], s_rb[...]
            hc = s_hc[...]
            er, eg, eb = envc[0], envc[1], envc[2]
            # miss: flat color (SLS miss program, Environment.cuh:168-170)
            rr = jnp.where(missm, rr + tr * er, rr)
            rg = jnp.where(missm, rg + tg * eg, rg)
            rb = jnp.where(missm, rb + tb * eb, rb)
            pm = missm & (hc == 0.0)
            far_, fag_, fab_ = s_far[...], s_fag[...], s_fab[...]
            far_ = jnp.where(pm, er, far_)
            fag_ = jnp.where(pm, eg, fag_)
            fab_ = jnp.where(pm, eb, fab_)

            ar, ag, ab, ro, me, em = _mat_resolve(b_mid[...])
            nx, ny, nz = b_nx[...], b_ny[...], b_nz[...]  # unit (mid-shade)

            # emission
            rr = jnp.where(hitm, rr + tr * em * ar, rr)
            rg = jnp.where(hitm, rg + tg * em * ag, rg)
            rb = jnp.where(hitm, rb + tb * em * ab, rb)
            # ambient (raw color * ambient intensity, RayFunctions.cuh:64)
            ar_r, ar_g, ar_b = envc[3], envc[4], envc[5]
            rr = jnp.where(hitm, rr + tr * ar_r * ar, rr)
            rg = jnp.where(hitm, rg + tg * ar_g * ag, rg)
            rb = jnp.where(hitm, rb + tb * ar_b * ab, rb)
            # sun NEE: unoccluded lanes only
            ndl = s_ndl[...]
            occluded = b_oc[...] < -1.0e30
            lit = hitm & (ndl > 0.0) & ~occluded
            rr = jnp.where(lit, rr + tr * er * ndl * ar, rr)
            rg = jnp.where(lit, rg + tg * eg * ndl * ag, rg)
            rb = jnp.where(lit, rb + tb * eb * ndl * ab, rb)

            # first-hit AOVs
            first = hitm & (hc == 0.0)
            s_fnx[...] = jnp.where(first, nx, s_fnx[...])
            s_fny[...] = jnp.where(first, ny, s_fny[...])
            s_fnz[...] = jnp.where(first, nz, s_fnz[...])
            far_ = jnp.where(first, ar, far_)
            fag_ = jnp.where(first, ag, fag_)
            fab_ = jnp.where(first, ab, fab_)
            s_far[...] = far_
            s_fag[...] = fag_
            s_fab[...] = fab_
            s_fpx[...] = jnp.where(first, s_hx[...], s_fpx[...])
            s_fpy[...] = jnp.where(first, s_hy[...], s_fpy[...])
            s_fpz[...] = jnp.where(first, s_hz[...], s_fpz[...])

            s_rr[...] = rr
            s_rg[...] = rg
            s_rb[...] = rb
            s_hc[...] = jnp.where(hitm, hc + 1.0, hc)
            # SLS paths terminate at the first accepted hit
            s_act[...] = jnp.zeros_like(bt)
            live[1] = 0.0

    @pl.when((c == nchunk - 1) & any_live & (lighting == 0))
    def _shade():
        act = s_act[...] > 0.0
        bt = b_t[...]
        hitm = act & (bt < _HIT_MAX)
        missm = act & ~(bt < _HIT_MAX)
        tr, tg, tb = s_tr[...], s_tg[...], s_tb[...]
        rr, rg, rb = s_rr[...], s_rg[...], s_rb[...]
        hc = s_hc[...]

        # ---- miss: flat Scene environment (ref Environment.cuh:158-162,
        # MissFunc RayFunctions.cuh:260-272); env rgb is pre-gamma'd in XLA
        er, eg, eb = envc[0], envc[1], envc[2]
        rr = jnp.where(missm, rr + tr * er, rr)
        rg = jnp.where(missm, rg + tg * eg, rg)
        rb = jnp.where(missm, rb + tb * eb, rb)
        pm = missm & (hc == 0.0)
        far_, fag_, fab_ = s_far[...], s_fag[...], s_fab[...]
        far_ = jnp.where(pm, er, far_)
        fag_ = jnp.where(pm, eg, fag_)
        fab_ = jnp.where(pm, eb, fab_)

        # ---- material constants via a short static loop over the (small)
        # material table (the SBT dispatch equivalent; no per-lane gather)
        ar, ag, ab, ro, me, em = _mat_resolve(b_mid[...])

        # ---- hit: normalize + flip interpolated normal
        # (ref RayDataDefinations.hpp:364-382)
        nx, ny, nz = b_nx[...], b_ny[...], b_nz[...]
        inv = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-20))
        nx, ny, nz = nx * inv, ny * inv, nz * inv
        d_x, d_y, d_z = s_dx[...], s_dy[...], s_dz[...]
        dp = d_x * nx + d_y * ny + d_z * nz
        flip = dp > 0.0
        nx = jnp.where(flip, -nx, nx)
        ny = jnp.where(flip, -ny, ny)
        nz = jnp.where(flip, -nz, nz)

        # ---- emission (ref RayFunctions.cuh:168-171)
        rr = jnp.where(hitm, rr + tr * em * ar, rr)
        rg = jnp.where(hitm, rg + tg * em * ag, rg)
        rb = jnp.where(hitm, rb + tb * em * ab, rb)

        # ---- first-hit AOVs (ref RayFunctions.cuh:163-167)
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

        # ---- BRDF cone sample around the reflected direction
        # (ref BSDF.cuh:6-13; draw order matches math3d.sample_hemisphere).
        # Reflect about the *flipped* normal, like the XLA path.
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
        # tangent frame around the reflected dir (RayTracerUtilities.cuh:110-120)
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

        # ---- energy weight (ref RayFunctions.cuh:152-161)
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

    @pl.when((s == nseg - 1) & (c == nchunk - 1))
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
        # per-tile live-ray total in lane [0, 0] of a zero plane (a 1-wide
        # SMEM output block violates the TPU block-shape rules; .at[].set
        # lowers to an unsupported scatter, so mask with iota instead)
        shape = s_rr[...].shape
        rows_i = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        cols_i = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        first_el = (rows_i == 0) & (cols_i == 0)
        o_cnt[...] = jnp.where(first_el, live[0], 0.0)


@functools.partial(
    jax.jit, static_argnames=("bounces", "lighting", "interpret", "chunk")
)
def _render_pool(table, sub_aabbs, chunk_aabbs, mat_table, origin, direction,
                 rng, valid, env_rgb, bounces: int, lighting: int = 0,
                 interpret: bool = False, chunk: int = TRI_CHUNK):
    """Run the mega-kernel over a flat ray pool.

    origin/direction (R,3) f32, rng (R,) uint32, valid (R,) f32 in {0,1};
    ``env_rgb`` is the 16-wide environment scalar vector (see
    render_pool_fused). ``lighting`` 0 = Scene, 1 = SingleLightSource
    (one segment: closest-hit phase + shadow any-hit phase).
    Returns (radiance (R,3), first_normal, first_albedo, first_position,
    live_ray_count ())."""
    r = origin.shape[0]
    block = BLOCK_ROWS * _LANES
    pad = (-r) % block
    if pad:
        origin = jnp.concatenate([origin, jnp.zeros((pad, 3), jnp.float32)], 0)
        direction = jnp.concatenate(
            [direction,
             jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (pad, 1))], 0)
        rng = jnp.concatenate([rng, jnp.zeros((pad,), jnp.uint32)])
        valid = jnp.concatenate([valid, jnp.zeros((pad,), jnp.float32)])
    rp = r + pad
    rows = rp // _LANES
    tiles = rows // BLOCK_ROWS

    def plane(x):
        return x.reshape(rows, _LANES)

    rng_i = jax.lax.bitcast_convert_type(rng, jnp.int32)
    ray_ins = (
        plane(origin[:, 0]), plane(origin[:, 1]), plane(origin[:, 2]),
        plane(direction[:, 0]), plane(direction[:, 1]), plane(direction[:, 2]),
        plane(rng_i), plane(valid),
    )

    nseg = 1 if lighting == 1 else bounces + 1
    nchunks = table.shape[0] // chunk
    # sub-run size is exactly recoverable from the packed shapes
    sub = table.shape[0] // sub_aabbs.shape[0]
    phases = 2 if lighting == 1 else 1
    grid = (tiles, nseg, phases * nchunks)

    ray_spec = pl.BlockSpec((BLOCK_ROWS, _LANES), lambda i, s, c: (i, 0))
    # scene windows revisit per phase: window index wraps at nchunks
    tri_spec = pl.BlockSpec((chunk, _COLS),
                            lambda i, s, c: (c % nchunks, 0),
                            memory_space=pltpu.SMEM)
    sub_spec = pl.BlockSpec((chunk // sub, 8),
                            lambda i, s, c: (c % nchunks, 0),
                            memory_space=pltpu.SMEM)
    chunk_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    mat_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    env_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    plane_shape = jax.ShapeDtypeStruct((rows, _LANES), jnp.float32)
    scratch_plane = pltpu.VMEM((BLOCK_ROWS, _LANES), jnp.float32)
    # SLS shadow-state planes shrink to minimal tiles when unused
    sls_plane = (scratch_plane if lighting == 1
                 else pltpu.VMEM((8, _LANES), jnp.float32))
    scratch = [scratch_plane] * 6 + [
        pltpu.VMEM((BLOCK_ROWS, _LANES), jnp.int32)  # s_rng
    ] + [scratch_plane] * 18 + [scratch_plane] * 6 + [sls_plane] * 8 + [
        pltpu.SMEM((2,), jnp.float32)
    ]

    kernel = functools.partial(_kernel, bounces=bounces,
                               num_mats=int(mat_table.shape[0]),
                               lighting=lighting, nchunks=nchunks,
                               unroll=resolve_unroll(interpret, sub),
                               chunk=chunk, sub=sub)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=(tri_spec, sub_spec, chunk_spec, mat_spec) + (ray_spec,) * 6
        + (pl.BlockSpec((BLOCK_ROWS, _LANES), lambda i, s, c: (i, 0)),)
        + (ray_spec,) + (env_spec,),
        out_specs=(ray_spec,) * 13,
        out_shape=(plane_shape,) * 13,
        scratch_shapes=scratch,
        interpret=interpret,
    )(table, sub_aabbs, chunk_aabbs, mat_table, *ray_ins, env_rgb)

    def unplane3(a, b, c):
        return jnp.stack(
            [a.reshape(rp)[:r], b.reshape(rp)[:r], c.reshape(rp)[:r]], axis=-1
        )

    radiance = unplane3(*outs[0:3])
    normal = unplane3(*outs[3:6])
    albedo = unplane3(*outs[6:9])
    position = unplane3(*outs[9:12])
    count = jnp.sum(outs[12])
    return radiance, normal, albedo, position, count


def render_pool_fused(
    tables, origin, direction, rng, valid, env_rgb, bounces: int,
    lighting: int = 0, interpret: bool | None = None,
    chunk: int = TRI_CHUNK,
):
    """Public entry: ``tables`` from :func:`pack_fused_tables`.

    ``env_rgb`` may be the 3-wide Scene radiance (padded internally) or
    the full 16-wide environment vector: [0:3] miss/sun radiance
    (pre-gamma'd), [3:6] ambient radiance (raw color x ambient
    intensity), [6:9] sun direction, [9] cone alpha = 1 - lightSize."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    env_vec = jnp.zeros((16,), jnp.float32)
    env_vec = env_vec.at[: env_rgb.shape[0]].set(env_rgb)
    table, sub_aabbs, chunk_aabbs, mat_table = tables
    return _render_pool(
        table, sub_aabbs, chunk_aabbs, mat_table, origin, direction, rng,
        valid, env_vec, bounces=bounces, lighting=int(lighting),
        interpret=bool(interpret), chunk=int(chunk),
    )
