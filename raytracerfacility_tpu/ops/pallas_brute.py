"""Pallas TPU trace kernel: triangle-sequential, ray-parallel, with
two-level hierarchical AABB culling — the framework's scalable traversal.

The kernel streams the whole scene through SMEM windows on a grid axis
(so triangle count is bounded by HBM, not on-chip memory) and collapses
each trace into ONE op-execution: a `fori_loop` over triangles inside the
kernel, each iteration testing one triangle (scalar broadcast) against the
full ray block (vector lanes).

Why triangle-sequential rather than a per-lane BVH walk: Mosaic has no
per-lane vector gather, so a per-ray walk must emulate gathers (one-hot
MXU matmuls — measured ~50 us fixed cost per in-kernel matmul on the v5e,
see the retired-experiments ledger in PERF.md — or VMEM dynamic scalar loads at ~3x SMEM
cost). A *scalar* dynamic row index shared by every lane is natively
supported: the triangle loop loads row j and broadcasts its nine scalars
against the ray tile. Culling therefore happens at *tile* granularity,
which is exactly what a hierarchy over Morton-ordered runs provides:

* level 1: per TRI_CHUNK window (512 triangles), one AABB slab test of
  the whole chunk against the tile — skips the entire window body
  (streamed scenes pay only the window DMA, ~25 KB);
* level 2: per SUB run (32 triangles), an AABB slab test skips the run.

Chunk VISITATION is per-tile front-to-back and conservatively culled
(ops/chunk_order.py, shared with the segmented engine in
ops/pallas_seg.py): the grid's chunk axis is a visit STEP, the actual
chunk comes from a scalar-prefetch ``order[tile, step]`` table computed
XLA-side. Chunks provably missed by every lane of the tile repeat the
previous window index (Pallas elides the repeated HBM->SMEM DMA,
measured 5.3 us per window fill) and gate the body off via
``skip[tile, step]``; accepted chunks visit near-to-far, so early hits
shrink best-t and the in-kernel (near <= best_t) slab term culls the far
scene — the occlusion win the reference gets from RT-core near-to-far
BVH order. Results are bit-identical under any visit order: the best-hit
record is a lexicographic (t, original-prim-id) min.

Rays whose best-t is already unbeatable (dead lanes carry -3e38 from the
fused path; any-hit lanes after their first hit) fall out of every slab
test, so the cull sharpens as the tile completes. This is the
TPU-idiomatic replacement for the reference's RT-core BVH traversal
(ref RayTracer.cu:355-366 launch -> hardware IAS/GAS walk; BLAS built
PREFER_FAST_TRACE + compaction at RayTracer.cu:1529-1584): wide
tile-coherent culling instead of per-thread pointer chasing.

Closest-hit semantics match ops/intersect.py:moller_trumbore exactly:
accept iff |det| > 1e-12, u >= 0, v >= 0, u+v <= 1, tmin < t < best_t
with exact ties resolved to the lowest ORIGINAL primitive index like the
XLA oracle. Sphere-swept curve rows (kind=1, encoding in ops/curve.py)
pack into kind-homogeneous SUB runs and dispatch per RUN via sibling
scalar conds (Mosaic cannot legalize a per-row scf.if at primitive-loop
depth); the cone math mirrors ops/curve.py::intersect_round_cone term
for term so accept decisions agree with the XLA path.

`trace_any_pallas` is a true occlusion query with first-hit exit
(ref TERMINATE_ON_FIRST_HIT shadow rays, RayFunctions.cuh:81-83): a lane
that finds any accepted hit poisons its best-t so every later slab test
culls it; tiles whose lanes are all occluded skip all remaining windows.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracerfacility_tpu.ops.chunk_order import chunk_order
from raytracerfacility_tpu.ops.intersect import TraceResult

# rays per grid step, in (BLOCK_ROWS, 128) f32 tiles
BLOCK_ROWS = int(os.environ.get("RTF_TPU_BRUTE_ROWS", "64"))
# triangles per grid step: the table rides in SMEM (scalar memory, ~1 MB,
# 32 B per scalar), so it is windowed in chunks along a second grid axis
# with best-hit accumulation in the revisited output block
# 256 matches the fused/segmented kernels' measured-better window size
# (finer level-1 slab culling beats the extra grid steps, PERF.md r3)
TRI_CHUNK = int(os.environ.get("RTF_TPU_BRUTE_CHUNK", "256"))
# triangles per cullable sub-chunk: rows are Morton-ordered at pack time so
# each run is spatially compact; TRI_CHUNK/SUB must be a multiple of 8
SUB = int(os.environ.get("RTF_TPU_BRUTE_SUB", "32"))
# primitive-loop unroll factor: the ~40-op pair test runs at ~25% of VPU
# peak at unroll 1 (bench.py roofline proxy) — unrolling overlaps the
# per-row SMEM scalar loads with the previous row's vector math;
# semantics (accept order, tie rule) are unchanged (lax.fori_loop unroll
# is sequential). 0 = auto: full unroll of the SUB run on the real chip
# (Mosaic honors only full unroll; +24% measured in the fused kernel),
# none in interpret mode (it just multiplies CPU trace time).
UNROLL = int(os.environ.get("RTF_TPU_UNROLL", "0"))


def _resolve_unroll(interpret: bool) -> int:
    if UNROLL > 0:
        return UNROLL
    return 1 if interpret else SUB
_LANES = 128
_DET_EPS = 1e-12
_DEAD = -3.0e38

_COLS = 12  # v0(3) e1(3) e2(3) original-prim(1) kind(1) pad(1)


def _run_aabbs(pmin, pmax, run: int):
    n = pmin.shape[0] // run
    lo = jnp.min(pmin.reshape(n, run, 3), axis=1)
    hi = jnp.max(pmax.reshape(n, run, 3), axis=1)
    out = jnp.zeros((n, 8), jnp.float32)
    return out.at[:, 0:3].set(lo).at[:, 3:6].set(hi)


def pack_tri_table(v0, e1, e2, kind=None):
    """Morton-orders the primitives (so SUB-sized runs are spatially
    compact), builds the (N, _COLS) f32 SMEM table (column 9 = original
    primitive index, exact as f32 for N < 2^24; column 10 = kind), the
    per-sub-run (N/SUB, 8) AABB table and the per-chunk (nchunks_pad8, 8)
    AABB table. Rows are padded to a TRI_CHUNK multiple with degenerate
    triangles (det == 0 -> never hit) under inverted AABBs (never
    entered). ``kind`` rows == 1 are sphere-swept curve segments
    (v0 = p0, e1 = p1-p0, e2 = (r0, r1-r0, 0); ops/curve.py encoding).
    Returns (table, sub_aabbs, chunk_aabbs)."""
    from raytracerfacility_tpu.ops.bvh import morton_codes

    n = v0.shape[0]
    if kind is None:
        kind = jnp.zeros((n,), jnp.int32)
    is_curve = (kind == 1)[:, None]
    centroid = jnp.where(is_curve, v0 + 0.5 * e1, v0 + (e1 + e2) / 3.0)
    # primitive bounds: triangle corner hull, or swept-segment box
    # inflated by the max radius
    rmax = jnp.maximum(e2[:, 0], e2[:, 0] + e2[:, 1])[:, None]
    tri_min = jnp.minimum(v0, jnp.minimum(v0 + e1, v0 + e2))
    tri_max = jnp.maximum(v0, jnp.maximum(v0 + e1, v0 + e2))
    cur_min = jnp.minimum(v0, v0 + e1) - rmax
    cur_max = jnp.maximum(v0, v0 + e1) + rmax
    pmin = jnp.where(is_curve, cur_min, tri_min)
    pmax = jnp.where(is_curve, cur_max, tri_max)

    lo = jnp.min(centroid, axis=0)
    hi = jnp.max(centroid, axis=0)
    morton = morton_codes(centroid, lo, hi)

    big = 3.4e38

    def pack_section(mask, section_kind=0):
        """Morton-order one kind's rows and pad them to a SUB multiple so
        every SUB run stays kind-homogeneous (the kernel dispatches the
        intersection test per RUN — a per-row branch does not legalize in
        Mosaic at triangle-loop depth)."""
        idx = jnp.where(mask, morton, jnp.uint32(0xFFFFFFFF))
        order = jnp.argsort(idx)
        count = int(mask.sum())
        order = order[:count]
        rows = jnp.zeros(((count + SUB - 1) // SUB * SUB, _COLS), jnp.float32)
        rows = rows.at[:count, 0:3].set(v0[order])
        rows = rows.at[:count, 3:6].set(e1[order])
        rows = rows.at[:count, 6:9].set(e2[order])
        rows = rows.at[:count, 9].set(order.astype(jnp.float32))
        rows = rows.at[:count, 10].set(kind[order].astype(jnp.float32))
        if section_kind == 1:
            # curve pad rows: negative radius, rejected explicitly by
            # _curve_test (zero rows are triangle-style degenerate, which
            # the curve test does not check)
            rows = rows.at[count:, 6].set(-1.0)
        pads = rows.shape[0] - count
        lo_s = jnp.concatenate(
            [pmin[order], jnp.full((pads, 3), big, jnp.float32)], axis=0)
        hi_s = jnp.concatenate(
            [pmax[order], jnp.full((pads, 3), -big, jnp.float32)], axis=0)
        return rows, lo_s, hi_s

    sections = [pack_section(kind == 0)]
    if int((kind == 1).sum()):
        sections.append(pack_section(kind == 1, section_kind=1))
    table = jnp.concatenate([s[0] for s in sections], axis=0)
    pmin = jnp.concatenate([s[1] for s in sections], axis=0)
    pmax = jnp.concatenate([s[2] for s in sections], axis=0)
    pad = (-table.shape[0]) % TRI_CHUNK
    if pad:
        table = jnp.concatenate(
            [table, jnp.zeros((pad, _COLS), jnp.float32)], axis=0)
        pmin = jnp.concatenate(
            [pmin, jnp.full((pad, 3), big, jnp.float32)], axis=0)
        pmax = jnp.concatenate(
            [pmax, jnp.full((pad, 3), -big, jnp.float32)], axis=0)

    sub_aabbs = _run_aabbs(pmin, pmax, SUB)
    # column 6 = the run's kind (runs are homogeneous by construction)
    run_kind = table[:, 10].reshape(-1, SUB).max(axis=1)
    sub_aabbs = sub_aabbs.at[:, 6].set(run_kind)
    chunk_aabbs = _run_aabbs(pmin, pmax, TRI_CHUNK)
    cpad = (-chunk_aabbs.shape[0]) % 8
    if cpad:
        fill = jnp.zeros((cpad, 8), jnp.float32)
        fill = fill.at[:, 0:3].set(big).at[:, 3:6].set(-big)
        chunk_aabbs = jnp.concatenate([chunk_aabbs, fill], axis=0)
    return table, sub_aabbs, chunk_aabbs


def _make_kernel(any_hit: bool, unroll: int = 1):
    def _kernel(order_ref, skip_ref, tris_ref, sub_ref, chunk_ref,
                ox, oy, oz, dx, dy, dz,
                tmn, tmx, t_ref, prim_ref, u_ref, v_ref):
        o_x, o_y, o_z = ox[...], oy[...], oz[...]
        d_x, d_y, d_z = dx[...], dy[...], dz[...]
        tmin_v = tmn[...]
        step = pl.program_id(1)
        # front-to-back culled visitation: the actual chunk this step
        # (ops/chunk_order.py; window index maps read the same table, so
        # culled steps re-window the previous chunk and skip the DMA)
        chunk_id = order_ref[pl.program_id(0), step]
        do_step = skip_ref[pl.program_id(0), step] == 0

        @pl.when(step == 0)
        def _init():
            t_ref[...] = tmx[...]
            prim_ref[...] = jnp.full_like(tmx[...], -1.0)
            u_ref[...] = jnp.zeros_like(tmx[...])
            v_ref[...] = jnp.zeros_like(tmx[...])

        eps = 1e-20
        ivx = 1.0 / jnp.where(jnp.abs(d_x) < eps,
                              jnp.where(d_x < 0, -eps, eps), d_x)
        ivy = 1.0 / jnp.where(jnp.abs(d_y) < eps,
                              jnp.where(d_y < 0, -eps, eps), d_y)
        ivz = 1.0 / jnp.where(jnp.abs(d_z) < eps,
                              jnp.where(d_z < 0, -eps, eps), d_z)

        def slab(bx0, by0, bz0, bx1, by1, bz1, best_t):
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
            # <= so a tie candidate sitting exactly on a run boundary
            # (shared mesh edges) is still visited for index tie-breaking
            return (near <= far) & (far > tmin_v) & (near <= best_t)

        def make_body(case: str):
            def body(j, carry):
                best_t, best_prim, best_u, best_v = carry
                # scalar loads from SMEM: SREG -> vector broadcasts are
                # native, unlike VMEM (1,1) -> (rows,128) broadcasts
                def col(c):
                    return tris_ref[j, c]

                v0x, v0y, v0z = col(0), col(1), col(2)
                e1x, e1y, e1z = col(3), col(4), col(5)
                e2x, e2y, e2z = col(6), col(7), col(8)
                ok, t, u, v = (_tri_test if case == "tri" else _curve_test)(
                    v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z)
                jf = col(9)
                # the table is Morton-ordered but exact ties must resolve
                # to the lowest ORIGINAL primitive index, like the XLA
                # oracle (shared mesh edges tie exactly on bounce rays)
                ok = ok & ((t < best_t)
                           | ((t == best_t) & (jf < best_prim)))
                if any_hit:
                    # first-hit exit (ref TERMINATE_ON_FIRST_HIT,
                    # RayFunctions.cuh:81-83): poison best-t so every
                    # later slab test culls this lane
                    return (
                        jnp.where(ok, _DEAD, best_t),
                        jnp.where(ok, jf, best_prim),
                        best_u,
                        best_v,
                    )
                return (
                    jnp.where(ok, t, best_t),
                    jnp.where(ok, jf, best_prim),
                    jnp.where(ok, u, best_u),
                    jnp.where(ok, v, best_v),
                )

            return body

        def _tri_test(v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z):
                # Moller-Trumbore, one scalar triangle vs the whole tile
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
                    ok_det
                    & (u >= 0.0)
                    & (v >= 0.0)
                    & (u + v <= 1.0)
                    & (t > tmin_v)
                )
                return ok, t, u, v

        def _curve_test(v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z):
            # sphere-swept segment; term-for-term mirror of
            # ops/curve.py::intersect_round_cone with p0 = v0,
            # axis = e1, r0 = e2.x, dr = e2.y, tmax = best_t.
            # Pad rows in curve sections carry r0 = -1 (pack_tri_table) and
            # are rejected explicitly by the r0 >= 0 guard below.
            r0 = e2x
            dr = e2y
            rr = -dr
            oax = o_x - v0x
            oay = o_y - v0y
            oaz = o_z - v0z
            m0 = e1x * e1x + e1y * e1y + e1z * e1z  # scalar
            m1 = oax * e1x + oay * e1y + oaz * e1z
            m2 = d_x * e1x + d_y * e1y + d_z * e1z
            m3 = d_x * oax + d_y * oay + d_z * oaz
            m5 = oax * oax + oay * oay + oaz * oaz
            d2 = m0 - rr * rr  # scalar
            k2 = d2 - m2 * m2
            k1 = d2 * m3 - m1 * m2 + m2 * rr * r0
            k0 = (d2 * m5 - m1 * m1 + 2.0 * m1 * rr * r0
                  - m0 * r0 * r0)
            h = k1 * k1 - k0 * k2
            safe_k2 = jnp.where(jnp.abs(k2) > 1e-12, k2, 1.0)
            t_body = (-jnp.sqrt(jnp.maximum(h, 0.0)) - k1) / safe_k2
            y = m1 - r0 * rr + t_body * m2
            body_ok = (
                (h >= 0.0) & (jnp.abs(k2) > 1e-12) & (y > 0.0)
                & (y < d2) & (t_body > tmin_v)
            )
            disc0 = m3 * m3 - m5 + r0 * r0
            t_cap0 = -m3 - jnp.sqrt(jnp.maximum(disc0, 0.0))
            y0 = m1 - r0 * rr + t_cap0 * m2
            cap0_ok = ((disc0 >= 0.0) & (y0 <= 0.0)
                       & (t_cap0 > tmin_v))
            r1 = r0 + dr
            obx = oax - e1x
            oby = oay - e1y
            obz = oaz - e1z
            m3b = d_x * obx + d_y * oby + d_z * obz
            m5b = obx * obx + oby * oby + obz * obz
            disc1 = m3b * m3b - m5b + r1 * r1
            t_cap1 = -m3b - jnp.sqrt(jnp.maximum(disc1, 0.0))
            y1 = m1 - r0 * rr + t_cap1 * m2
            cap1_ok = ((disc1 >= 0.0) & (y1 >= d2)
                       & (t_cap1 > tmin_v))
            big_f = 3.4e38
            tb = jnp.where(body_ok, t_body, big_f)
            t0c = jnp.where(cap0_ok, t_cap0, big_f)
            t1c = jnp.where(cap1_ok, t_cap1, big_f)
            t = jnp.minimum(jnp.minimum(tb, t0c), t1c)
            ok = (body_ok | cap0_ok | cap1_ok) & (r0 >= 0.0)
            safe_d2 = jnp.where(jnp.abs(d2) > 1e-12, d2, 1.0)
            u_body = jnp.clip((m1 - r0 * rr + t * m2) / safe_d2,
                              0.0, 1.0)
            u = jnp.where(t == t0c, 0.0,
                          jnp.where(t == t1c, 1.0, u_body))
            return ok, t, u, jnp.zeros_like(u)

        tri_body = make_body("tri")
        curve_body = make_body("curve")

        def sub_body(si, carry):
            # slab test of the sub-run AABB against the whole tile; skip
            # the SUB-primitive run when no lane can improve inside it.
            # Runs are kind-homogeneous (pack_tri_table), so the
            # intersection test dispatches per run via two sibling conds
            # (a per-row cond inside the primitive loop fails Mosaic's
            # scf.if legalization at that depth)
            enter = slab(sub_ref[si, 0], sub_ref[si, 1], sub_ref[si, 2],
                         sub_ref[si, 3], sub_ref[si, 4], sub_ref[si, 5],
                         carry[0])
            go = jnp.any(enter)
            run_kind = sub_ref[si, 6]

            def run_t(c):
                # static 0..SUB bounds (offset inside): `unroll` requires
                # statically known loop bounds
                return jax.lax.fori_loop(
                    0, SUB, lambda k, cc: tri_body(si * SUB + k, cc), c,
                    unroll=unroll)

            def run_c(c):
                return jax.lax.fori_loop(
                    0, SUB, lambda k, cc: curve_body(si * SUB + k, cc), c,
                    unroll=unroll)

            carry = jax.lax.cond(go & (run_kind < 0.5), run_t,
                                 lambda c: c, carry)
            carry = jax.lax.cond(go & (run_kind >= 0.5), run_c,
                                 lambda c: c, carry)
            return carry

        carry = (t_ref[...], prim_ref[...], u_ref[...], v_ref[...])
        # level-1 cull: whole 512-triangle window vs the tile
        centered = slab(
            chunk_ref[chunk_id, 0], chunk_ref[chunk_id, 1],
            chunk_ref[chunk_id, 2], chunk_ref[chunk_id, 3],
            chunk_ref[chunk_id, 4], chunk_ref[chunk_id, 5], carry[0],
        )

        def run_chunk(c):
            return jax.lax.fori_loop(0, TRI_CHUNK // SUB, sub_body, c)

        best_t, best_prim, best_u, best_v = jax.lax.cond(
            do_step & jnp.any(centered), run_chunk, lambda c: c, carry
        )
        t_ref[...] = best_t
        prim_ref[...] = best_prim
        u_ref[...] = best_u
        v_ref[...] = best_v

    return _kernel


_kernel_cache: dict = {}


def _get_kernel(any_hit: bool, unroll: int):
    key = (any_hit, unroll)
    if key not in _kernel_cache:
        _kernel_cache[key] = _make_kernel(any_hit=any_hit, unroll=unroll)
    return _kernel_cache[key]


@functools.partial(jax.jit, static_argnames=("interpret", "any_hit"))
def _trace(tri_table, sub_aabbs, chunk_aabbs, origin, direction, tmin, tmax,
           interpret=False, any_hit=False):
    num_tris = tri_table.shape[0]
    r = origin.shape[0]
    block = BLOCK_ROWS * _LANES
    pad = (-r) % block
    if pad:
        origin = jnp.concatenate(
            [origin, jnp.zeros((pad, 3), jnp.float32)], axis=0
        )
        direction = jnp.concatenate(
            [direction, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32),
                                 (pad, 1))], axis=0
        )
        tmin = jnp.concatenate([tmin, jnp.zeros(pad, jnp.float32)])
        tmax = jnp.concatenate([tmax, jnp.zeros(pad, jnp.float32)])
    rp = r + pad
    rows = rp // _LANES

    def plane(x):
        return x.reshape(rows, _LANES)

    ray_ins = (
        plane(origin[:, 0]), plane(origin[:, 1]), plane(origin[:, 2]),
        plane(direction[:, 0]), plane(direction[:, 1]), plane(direction[:, 2]),
        plane(tmin), plane(tmax),
    )
    # grid: (ray blocks, visit steps); steps iterate innermost so each ray
    # block's best-hit record accumulates in its revisited VMEM output block
    nchunks = num_tris // TRI_CHUNK
    grid = (rows // BLOCK_ROWS, nchunks)
    # per-tile front-to-back culled chunk order (ops/chunk_order.py);
    # a lane can only accept a hit in (tmin, tmax), so tmax <= tmin
    # lanes (pool padding, fused-path dead lanes at -3e38) are excluded
    # from the cull bundle
    order, skip = chunk_order(
        ray_ins[0], ray_ins[1], ray_ins[2], ray_ins[3], ray_ins[4],
        ray_ins[5], ray_ins[7] > ray_ins[6], chunk_aabbs[:nchunks],
        BLOCK_ROWS)
    ray_spec = pl.BlockSpec((BLOCK_ROWS, _LANES), lambda i, c, o, s: (i, 0))
    tri_spec = pl.BlockSpec((TRI_CHUNK, _COLS), lambda i, c, o, s: (o[i, c], 0),
                            memory_space=pltpu.SMEM)
    sub_spec = pl.BlockSpec((TRI_CHUNK // SUB, 8),
                            lambda i, c, o, s: (o[i, c], 0),
                            memory_space=pltpu.SMEM)
    chunk_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shape = jax.ShapeDtypeStruct((rows, _LANES), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[tri_spec, sub_spec, chunk_spec] + [ray_spec] * 8,
        out_specs=[ray_spec] * 4,
    )
    t, prim, u, v = pl.pallas_call(
        _get_kernel(any_hit, _resolve_unroll(interpret)),
        grid_spec=grid_spec,
        out_shape=(out_shape,) * 4,
        interpret=interpret,
    )(order, skip, tri_table, sub_aabbs, chunk_aabbs, *ray_ins)

    def unplane(x):
        return x.reshape(rp)[:r]

    return unplane(t), unplane(prim), unplane(u), unplane(v)


def _flatten(origin, direction, tmin, tmax):
    import math as _math

    batch = jnp.broadcast_shapes(origin.shape[:-1], jnp.shape(tmin),
                                 jnp.shape(tmax))
    flat = (_math.prod(batch),) if batch else (1,)
    origin = jnp.broadcast_to(origin, batch + (3,)).reshape(flat + (3,))
    direction = jnp.broadcast_to(direction, batch + (3,)).reshape(flat + (3,))
    tmin_f = jnp.broadcast_to(tmin, batch).reshape(flat).astype(jnp.float32)
    tmax_f = jnp.broadcast_to(tmax, batch).reshape(flat).astype(jnp.float32)
    return batch, origin, direction, tmin_f, tmax_f


def trace_closest_pallas(
    tri_table,  # (table, sub_aabbs, chunk_aabbs) from pack_tri_table
    origin: jax.Array,  # (..., 3)
    direction: jax.Array,  # (..., 3)
    tmin: jax.Array,
    tmax: jax.Array,
    interpret: bool | None = None,
) -> TraceResult:
    """Drop-in for trace_closest_bruteforce/trace_closest_bvh (triangles
    only). ``tri_table`` comes from :func:`pack_tri_table`."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    batch, origin, direction, tmin_f, tmax_f = _flatten(
        origin, direction, tmin, tmax)
    table, sub_aabbs, chunk_aabbs = tri_table
    t, prim, u, v = _trace(table, sub_aabbs, chunk_aabbs, origin, direction,
                           tmin_f, tmax_f, interpret=interpret)
    prim_i = prim.astype(jnp.int32)
    hit = prim_i >= 0
    return TraceResult(
        t=t.reshape(batch),
        prim=prim_i.reshape(batch),
        u=u.reshape(batch),
        v=v.reshape(batch),
        hit=hit.reshape(batch),
    )


def trace_any_pallas(tri_table, origin, direction, tmin, tmax,
                     interpret=None) -> jax.Array:
    """Occlusion query with first-hit early exit (same accept window as
    closest-hit; only the boolean is meaningful)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    batch, origin, direction, tmin_f, tmax_f = _flatten(
        origin, direction, tmin, tmax)
    table, sub_aabbs, chunk_aabbs = tri_table
    _, prim, _, _ = _trace(table, sub_aabbs, chunk_aabbs, origin, direction,
                           tmin_f, tmax_f, interpret=interpret, any_hit=True)
    return (prim.astype(jnp.int32) >= 0).reshape(batch)
