"""Segmented fused kernel with inter-segment ray reordering (round 3).

The round-2 fused mega-kernel (ops/pallas_fused.py) runs the whole frame
as one pallas_call with grid (tiles, segments, chunks) — but that grid
finishes ALL segments of a tile before the next tile starts, so rays can
never move between tiles, and bounce segments (BRDF-sampled directions,
incoherent across lanes) defeat the tile-granular AABB culling: each
bounce segment was measured at ~45% of the full O(N*R) sweep while only
~23% of lane-segments are live (PERF.md round 2).

This module restructures the same math as ONE KERNEL PER SEGMENT with
the ray state in HBM between segments, which enables the two structural
wins the round-2 ledger names as the next lever:

* Dead-ray COMPACTION: terminated rays sort to the pool tail, so whole
  ray tiles go dead and skip every chunk step (grid-step skip measured
  ~2.1 us vs ~180 us for a live trace step). Average liveness is ~23%
  at 8 bounces — the sweep cost follows the live fraction instead of
  paying full price for one straggler lane per tile.
* COHERENCE grouping: live rays sort by (origin Morton cell, direction
  octant), so a tile's rays share a spatial cell and direction wedge and
  the existing two-level (chunk/SUB) AABB culling works on bounce
  segments the way it does on camera rays.

The inter-segment reorder is XLA-side: one argsort of a packed int32 key
plus one row-gather of the packed state matrix. MEASURED COST (round 3,
properly fenced by scalar readback — block_until_ready does not reliably
fence through the axon tunnel, and an early sub-millisecond reading from
it was wrong): the full 15-plane reorder costs tens of ms per segment at
2M rays, consistent with the round-2 38 ms multi-operand-sort figure.
That cost is why RTF_TPU_SEG_EVERY exists and why this path must earn
its dispatch slot per-config on-chip. Per-ray results are BIT-IDENTICAL to
ops/pallas_fused.py: permutations never change any ray's own arithmetic
(the best-hit record is a lexicographic (t, prim-id) min — commutative
across visit order), and the final radiance scatters back through the
carried original-index plane.

Feature envelope and reference semantics are exactly those of
ops/pallas_fused.py (triangle-only, Default materials, flat-color Scene
environment): ray loop + accumulation ptx/CameraRendering.cu:32-147,
path step RayFunctions.cuh:25-171, BRDF cone sample BSDF.cuh:6-13, miss
radiance Environment.cuh:147-175 (Scene branch), RNG
LinearCongruenceGenerator.hpp:28-33. SingleLightSource mode has a single
segment (no bounce incoherence) and stays on the fused kernel.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracerfacility_tpu.ops.pallas_fused import (
    _COLS,
    _DEAD,
    _DET_EPS,
    _HIT_MAX,
    _TMAX,
    _BOUNCE_TMIN,
    _TWO_PI,
    _lcg,
    SUB,
    TRI_CHUNK,
    resolve_unroll,
)

# tile rows per kernel block: static per-call choice (see
# _pick_block_rows) — big pools want 32 (4096-ray tiles: tighter
# per-tile frusta beat 64's grid-step amortization once the windowed
# reorder landed — 29.8 vs 28.9 Mrays/s at 1080p/SUB=16), small
# incoherent pools want 16 (2048-ray tiles: canopy probe pools measured
# 1.135 s at 16 vs 1.342 s at 64 and 1.537 s at 8, where grid-step
# overhead wins)
BLOCK_ROWS_ENV = os.environ.get("RTF_TPU_SEG_ROWS")
_LANES = 128


def _pick_block_rows(rows: int, nchunks: int = 0) -> int:
    """Tile height (rows per kernel block), measured defaults 16/32.

    Many-chunk scenes additionally scale the tile UP so the per-tile
    (tiles, nchunks) int32 order+skip scalar-prefetch tables fit SMEM
    next to the double-buffered chunk table window (512 B/row/buffer —
    the window is why the chunk size itself cannot grow past 512, see
    ops/pallas_fused.auto_chunk). Diagnosed on the 1.04M-tri config 6:
    at 32-row tiles the tables need ~1 MB and program load fails with
    "Allocation would exceed memory (space=smem)"; 128-row tiles fit.
    Fewer, taller tiles trade culling granularity for fitting at all.
    """
    if BLOCK_ROWS_ENV is not None:
        return int(BLOCK_ROWS_ENV)
    br = 32 if rows >= 8192 else 16
    if nchunks:
        # ~400 KB SMEM budget for the order+skip tables (the chunk=512
        # table window takes ~524 KB of the ~1 MB core budget)
        while br < rows and (rows // br) * nchunks * 8 > 400_000:
            br *= 2
    return br
# origin-cell bits per axis for the reorder key (4 -> 4096 cells).
# The key is OCTANT-MAJOR: a sorted tile then holds rays of ONE
# direction octant whose origins form a morton-contiguous (compact)
# cell run — both the chunk slab test's frustum and the origin spread
# stay tight. Morton-major was measured worse: an 8192-ray tile spans
# ~20 cells x all 8 octants, and the union frustum defeats culling
# (canopy probe pools: 1.21x vs the 5.3x coherence headroom).
MORTON_BITS = int(os.environ.get("RTF_TPU_SEG_MBITS", "4"))
# reorder before segments 1, 1+k, 1+2k, ... (the reorder costs tens of
# ms at 2M rays — see module docstring — so its cadence is a tunable
# trade against the compaction/coherence win it buys)
REORDER_EVERY = int(os.environ.get("RTF_TPU_SEG_EVERY", "1"))
# extra direction bits per minor axis in the reorder key (0 = octant
# only). With k > 0 the direction key becomes cubemap-style: dominant
# face (6 values) + a 2^k x 2^k texel over the two minor-axis slopes,
# so a sorted tile's rays share a much tighter direction CONE than the
# octant's 90-degree wedge — tighter tile frusta, more chunk culls —
# at the cost of splitting origin-coherent runs across more buckets.
DIR_BITS = int(os.environ.get("RTF_TPU_SEG_DBITS", "0"))
# sort-block granularity, in kernel tiles (0 = one global sort): rays
# only need coherence WITHIN a tile, so sorting B independent blocks of
# consecutive tiles (XLA batches row-wise sorts) preserves almost all
# of the culling win while the sort itself gets much cheaper than a
# single 2M-element argsort. Read at call time (render_pool_sorted) so
# tests and sweeps can flip it per call.
SORT_BLOCK_DEFAULT = "0"
# liveness-windowed TRACE grid (RTF_TPU_TRACE_WINDOW=0 disables): after
# a reorder, every live ray sits in the compacted prefix, but the
# kernel's grid still stepped ALL (tiles, nchunks) steps — a dead tile
# pays ~2.1 us per grid step (vs ~180 us live), which at 1080p (507
# tiles x ~11 chunks) is ~12 ms of pure grid overhead per segment even
# at 8% liveness. Each bounce segment therefore runs on the smallest
# static tile-aligned window (tiles, /2, /4, /8) covering the live
# prefix extent, picked by a lax.cond cascade; the dead tail passes
# through untouched (the kernel is the identity on dead lanes, so this
# is bit-identical). Read at call time (render_pool_sorted) and passed
# as a static arg so tests/sweeps can flip it per call.
TRACE_WINDOW_DEFAULT = "1"
# liveness-window cascade depth (RTF_TPU_SEG_WDEPTH = k: static windows
# full, 1/2, ..., 1/2^k of the pool for BOTH the reorder sort and the
# trace grid). Default 3 (= the round-3 /8 floor). Late bounce segments
# at 8 bounces run ~3-8% live, below that floor — k=4/5 adds /16 and
# /32 windows at the cost of 2 more kernel-shape compiles per segment
# variant. Read at call time (render_pool_sorted).
WDEPTH_DEFAULT = "3"
# ROW-GROUP culling granularity (RTF_TPU_SEG_GROUP, rows per group; 0 =
# whole-tile culling, the round-3 behavior): the kernel's trace body
# runs per (group_rows, 128) row group with its own chunk/sub culling
# conds — a third culling level between the tile and the sub-run that
# captures most of the small-tile win without extra grid steps or window
# DMA (probe_visited.py measured tile-granular culling at 5-15x the
# per-ray ideal). Read at call time. DEFAULT 0: measured a MONOTONIC
# loss at the 1080p headline (31.0 whole-tile → 29.6/24.6/16.6 at
# 16/8/4-row groups, PERF.md round-4 ledger) — the per-group any-reduce
# + cond scalar overhead beats the visited-pair savings on coherent
# camera pools. Kept for incoherent pools (scripts/sweep_config4.py).
SEG_GROUP_DEFAULT = "0"
# per-sub-run cull bits (RTF_TPU_SEG_SUBBITS=1): alongside the per-tile
# chunk order, compute XLA-side a (tiles, nchunks) int32 bitmask whose
# bit j says the tile's live-ray bundle MAY hit sub-run j of that chunk
# (same interval arithmetic as the chunk test, over the sub AABBs). The
# kernel reads the chunk's mask ONCE from scalar prefetch and gates each
# sub-run's vector slab test on its scalar bit — provably-missed runs
# skip the ~30-op slab + cross-lane any-reduce entirely. This is the
# third culling level the row-group experiment wanted, WITHOUT its
# per-group vector-reduce overhead: the extra in-kernel work per sub-run
# is one scalar shift+branch. Strictly conservative (no best-t term;
# the in-kernel slab still guards every passing run) -> bit-identical.
# Requires sub-runs-per-chunk <= 32 (int32 mask); auto-disabled above.
SUBBITS_DEFAULT = "0"
# per-sub-run cull INTERVAL (RTF_TPU_SEG_SUBIV=1): like SUBBITS, but
# instead of a bitmask + per-run scalar shift/cond (which crashes the
# remote Mosaic compiler: tpu_compile_helper HTTP 500, round-4 sweep),
# the XLA side computes the [lo, hi) HULL of the sub-runs each
# (tile, chunk) bundle may hit and the kernel runs its sub loop as
# ``fori_loop(lo, hi)`` with bounds read from scalar prefetch. Runs
# outside the hull cost NOTHING (no slab, no any-reduce, no cond, no
# dynamic shifts — only loop bounds change), and Morton packing makes
# the hittable set nearly contiguous, so the hull is tight. Strictly
# conservative (the in-kernel per-sub slab still guards every visited
# run) -> bit-identical. Mutually exclusive with SUBBITS (SUBIV wins).
# RTF_TPU_SEG_SUBIV=2 keeps the sub loop STATIC and instead gates each
# run on a scalar (si >= lo) & (si < hi) cond — out-of-hull runs skip
# the ~30-op slab + cross-lane any-reduce but still pay a scalar
# compare + branch. This is the probe_mosaic p10 composition: no
# dynamic trip count, no dynamic shift — the two constructs the remote
# compiler rejects at full kernel scale (round-4 sweep).
SUBIV_DEFAULT = "0"
# BLOCK-PERMUTATION reorder (RTF_TPU_SEG_BPERM, rows per block; 0 = the
# XLA multi-operand-sort reorder): between segments, instead of sorting
# all 15 state planes (~17-21 ms full / ~91 ms per frame at 1080p,
# scripts/profile_seg_frame.py), permute the pool at BLOCK granularity —
# one block key (min of the live rays' Morton keys) per (bperm, 128)
# block, an argsort over just nblocks elements, and ONE Pallas pass
# whose input BlockSpec index map reads the permutation from a
# scalar-prefetch arg, so the "reorder" is pure sequential-write DMA
# (~250 MB of HBM traffic at 2M rays ≈ 1-3 ms) instead of a sort
# network. Rays never migrate BETWEEN blocks, so within-block coherence
# is whatever the last full sort (or camera raster order) left — the
# culling quality trade is measured in PERF.md. All-dead blocks key to
# INT32_MAX and sort to the tail, so the live extent stays a block
# prefix and the liveness-windowed trace grid keeps working.
# RTF_TPU_SEG_BPERM_FROM picks the first bounce segment that uses the
# block permutation (default 1 = every in-loop reorder; e.g. 3 keeps
# exact per-ray sorts for the two highest-liveness reorders).
BPERM_DEFAULT = "0"
BPERM_FROM_DEFAULT = "1"
# RTF_TPU_SEG_BPERM_EXACT=k (with BPERM on): every k-th reorder in the
# bperm region runs the EXACT windowed multi-operand sort instead — it
# re-compacts dead lanes and restores per-ray Morton order, resetting
# the within-block divergence that block-granular permutation
# accumulates (rays never migrate between blocks, so tile frusta widen
# as paths scatter). 0 = never (pure bperm after BPERM_FROM). Any mix
# of the two reorders is bit-identical to either alone: both are
# permutations, a ray's arithmetic never depends on its lane, and the
# final unsort restores original order.
BPERM_EXACT_DEFAULT = "0"
# STATIC PHASE SPLIT (RTF_TPU_SEG_SPLIT = s0; 0 = off): right after the
# reorder entering bounce segment s0, pick the smallest static
# tile-aligned pool width covering the (exactly compacted) live prefix
# via one lax.cond cascade, and run ALL remaining segments on genuinely
# sliced planes — the frozen dead tail is concatenated back once at the
# end. Attacks the ~18-21 ms/segment reorder floor that survives even
# 1/8 sort windows (PERF.md round 4): that floor is the full-pool-width
# tail CONCATENATES (15 sort + 14 trace planes per segment), which the
# per-segment windows cannot remove but a real pool slice does.
# Bit-identical (same dead-lane invariants as the windows; test
# tests/test_fused.py::test_seg_split_bitexact). Ignored when
# REORDER_EVERY > 1, bperm, or block-local sorts are active, and when
# s0 > bounces (short-segment workloads such as the estimator pools).
# Default 3 after the round-5 headline sweep: 32.09 vs 30.97 Mrays/s at
# 1080p/8 bounces for s0 = 3 (s0 = 2 gives 31.54; s0 = 4 exceeded the
# sweep's compile budget — PERF.md round 5).
SPLIT_DEFAULT = "3"
# CHUNK-VISIT-AXIS liveness window (RTF_TPU_SEG_VDEPTH = k; 0 = off):
# the trace grid's second dimension is always the static worst case
# (nchunks visit steps per tile), but the per-tile order/skip tables
# front-load the ACCEPTED chunks — every step past a tile's accepted
# count is a provable no-op that still costs a grid step (~2.1 us
# skipped vs ~180 us live, PERF.md round 3). This is the same liveness
# window the tile axis already has, applied to the VISIT axis: each
# segment runs on the smallest static visit width (nchunks, /2, ...,
# /2^k) covering the MAX accepted-chunk count over the window's tiles,
# picked by a lax.cond cascade. Bit-identical (the skipped steps are
# no-ops by construction; the shade phase fires at the last visit step
# either way). Pays most on many-chunk scenes with strong culling — the
# 111k-tri canopy pool steps 434 chunk columns per tile while accepting
# a few dozen. Costs one extra kernel-shape compile per cascade level.
VDEPTH_DEFAULT = "0"


def _kernel(
    order_ref, skip_ref, *args,
    is_first: bool,
    has_cont: bool,
    xla_env: bool,
    num_mats: int,
    nchunks: int,
    block_rows: int,
    unroll: int,
    chunk: int,
    sub: int,
    group_rows: int,
    use_subbits: bool = False,
    use_subiv: int = 0,
):
    # optional third scalar-prefetch arg: per-(tile, chunk) sub-run cull
    # bitmask (SUBBITS_DEFAULT) or [lo, hi) interval (SUBIV_DEFAULT)
    subbits_ref = subiv_ref = None
    if use_subbits:
        subbits_ref, *args = args
    elif use_subiv:
        subiv_ref, *args = args
    (tris, subs, chunks_ref, mats, envc,
     # per-tile ray-state inputs (VMEM planes)
     i_ox, i_oy, i_oz, i_dx, i_dy, i_dz, i_rng, i_act,
     i_tr, i_tg, i_tb, i_rr, i_rg, i_rb) = args[:19]
    # outputs: updated state (14) [+ 9 first-hit AOVs when seg == 0]
    refs = args[19:]
    (o_ox, o_oy, o_oz, o_dx, o_dy, o_dz, o_rng, o_act,
     o_tr, o_tg, o_tb, o_rr, o_rg, o_rb) = refs[:14]
    k = 14
    if is_first:
        (a_nx, a_ny, a_nz, a_ar, a_ag, a_ab, a_px, a_py, a_pz) = refs[k:k + 9]
        k += 9
    if xla_env:
        o_miss = refs[k]
        k += 1
    b_t, b_nx, b_ny, b_nz, b_mid, b_pid, live = refs[k:]

    c = pl.program_id(1)
    # FRONT-TO-BACK + CONSERVATIVELY CULLED chunk visitation (round 3):
    # c is the VISIT STEP; the actual chunk is order_ref[tile, c], a
    # per-tile order computed XLA-side (_chunk_order): chunks that MAY
    # be hit by some live ray of the tile (conservative interval slab
    # test over the tile's ray bundle) come first, near-to-far;
    # PROVABLY-MISSED steps repeat the last accepted chunk's index (so
    # Pallas elides their HBM->SMEM window DMA — measured 5.3 us per
    # 41 KB window fill, the dominant per-step floor on many-chunk
    # scenes) and carry skip_ref[tile, c] == 1, which gates the trace
    # body off entirely. Early near hits shrink b_t, so the
    # (near <= b_t) slab term culls most of the far scene — the
    # occlusion win an RT core gets from near-to-far BVH order. Results
    # are bit-identical under any visit order (the best-hit record is a
    # lexicographic (t, prim-id) min, and the in-kernel per-ray slab
    # test still guards every visited chunk).
    cc = order_ref[pl.program_id(0), c]
    do_step = skip_ref[pl.program_id(0), c] == 0
    # sub-run cull mask for this (tile, chunk) — read at kernel top level
    # (program_id inside the pl.when body breaks interpret mode)
    sb = subbits_ref[pl.program_id(0), cc] if use_subbits else None
    if use_subiv:
        siv_lo = subiv_ref[0, pl.program_id(0), cc]
        siv_hi = subiv_ref[1, pl.program_id(0), cc]

    # this segment's trace tmin (ref: camera rays start at envc[10] —
    # 0 for the camera, the estimator's 1e-3 probe offset for pools —
    # and bounce rays at the fixed 1e-3 self-intersection offset).
    # Kept SCALAR here: the grouped trace broadcasts it per row group
    # (slicing a plane broadcast from an SMEM scalar SIGABRTs the remote
    # Mosaic compiler in the is_first variant — scripts/probe_group2.py)
    tmin_s = envc[10] if is_first else _BOUNCE_TMIN

    @pl.when(c == 0)
    def _segment_start():
        act = i_act[...]
        live[0] = jnp.sum(act)
        b_t[...] = jnp.where(act > 0.0, _TMAX, _DEAD)
        zero = jnp.zeros_like(act)
        b_nx[...] = zero
        b_ny[...] = zero
        b_nz[...] = zero
        b_mid[...] = zero
        b_pid[...] = zero + 3.4e38

    any_live = (live[0] > 0.0) & do_step

    def _trace_chunk_group(rays, carry_in):
        # rays/carries are VALUE slices of the full planes (sliced VMEM
        # *ref* accesses at sublane offsets SIGABRT the remote Mosaic
        # compiler; register-level slices legalize)
        o_x, o_y, o_z, d_x, d_y, d_z = rays
        tmin_g = jnp.zeros_like(o_x) + tmin_s
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
            # exact ties -> lowest ORIGINAL primitive index (cross-engine
            # rule; also what makes the best-hit record visit-order
            # independent, the invariant the reorder relies on)
            ok = (
                ok_det & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                & (t > tmin_g) & ((t < bt) | ((t == bt) & (jf < bpid)))
            )
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
            return (near <= far) & (far > tmin_g) & (near <= bt)

        def sub_body(si, carry, gate=None):
            def test_and_run(b):
                enter = slab(subs[si, 0], subs[si, 1], subs[si, 2],
                             subs[si, 3], subs[si, 4], subs[si, 5], b[0])
                hit_any = jnp.any(enter)
                if gate is not None:
                    # subiv path: the chunk-level occlusion gate rides
                    # the per-sub predicate (see run_chunk note)
                    hit_any = hit_any & gate

                def run(bb):
                    # static 0..sub bounds (offset inside): `unroll`
                    # requires statically known loop bounds
                    return jax.lax.fori_loop(
                        0, sub, lambda k, b2: tri_body(si * sub + k, b2),
                        bb, unroll=unroll)

                return jax.lax.cond(hit_any, run, lambda bb: bb, b)

            if not use_subbits:
                return test_and_run(carry)
            bit = jax.lax.shift_right_logical(sb, si) & 1
            return jax.lax.cond(bit != 0, test_and_run, lambda b: b, carry)

        carry = carry_in
        entered = slab(chunks_ref[cc, 0], chunks_ref[cc, 1], chunks_ref[cc, 2],
                       chunks_ref[cc, 3], chunks_ref[cc, 4], chunks_ref[cc, 5],
                       carry[0])

        if use_subiv == 1:
            # dynamic [lo, hi) bounds from the scalar-prefetch hull:
            # provably-missed runs outside it are never visited. The
            # dynamic-trip loop must NOT sit inside a lax.cond branch
            # (that nesting crashes the remote Mosaic compiler —
            # scripts/probe_mosaic.py p9/p12), so the chunk-level
            # occlusion gate folds into the per-sub cond predicate
            # instead of wrapping the loop.
            chunk_any = jnp.any(entered)
            return jax.lax.fori_loop(
                siv_lo, siv_hi,
                lambda si, b: sub_body(si, b, gate=chunk_any), carry)

        if use_subiv == 2:
            # STATIC sub loop with a per-run scalar hull gate (the
            # probe_mosaic p10 composition — no dynamic trip count, no
            # dynamic shift): out-of-hull runs skip the slab + cross-
            # lane any-reduce for one scalar compare + branch each
            def gated(si, b):
                inb = (si >= siv_lo) & (si < siv_hi)
                return jax.lax.cond(inb, lambda bb: sub_body(si, bb),
                                    lambda bb: bb, b)

            def run_hull(b):
                return jax.lax.fori_loop(0, chunk // sub, gated, b)

            return jax.lax.cond(jnp.any(entered), run_hull,
                                lambda b: b, carry)

        def run_chunk(b):
            return jax.lax.fori_loop(0, chunk // sub, sub_body, b)

        return jax.lax.cond(jnp.any(entered), run_chunk, lambda b: b, carry)

    @pl.when(any_live)
    def _trace_chunk():
        # ROW-GROUP culling (round 4, the third culling level): the tile's
        # trace body runs as ``block_rows // group_rows`` independent
        # row-group passes, each with its OWN chunk/sub-run culling conds
        # over just its (group_rows, 128) lanes. Sorted rays are ordered,
        # so a 1024-lane group is a much tighter bundle than the 4096-lane
        # tile (probe_visited.py: tile-granular culling visits 5-15x the
        # per-ray ideal) — this captures most of the small-tile win
        # WITHOUT extra grid steps or window DMA (16-row kernel tiles
        # also fail the remote Mosaic compile at 1080p outright). Same
        # per-lane arithmetic, same accept/tie rules: bit-identical.
        gr = group_rows if 0 < group_rows < block_rows else block_rows
        full_rays = (i_ox[...], i_oy[...], i_oz[...],
                     i_dx[...], i_dy[...], i_dz[...])
        full_carry = (b_t[...], b_nx[...], b_ny[...], b_nz[...],
                      b_mid[...], b_pid[...])
        if gr == block_rows:
            outs = [_trace_chunk_group(full_rays, full_carry)]
        else:
            outs = []
            for g in range(block_rows // gr):
                sl = slice(g * gr, (g + 1) * gr)
                outs.append(_trace_chunk_group(
                    tuple(p[sl] for p in full_rays),
                    tuple(p[sl] for p in full_carry)))
        merged = tuple(
            outs[0][i] if len(outs) == 1
            else jnp.concatenate([o[i] for o in outs], axis=0)
            for i in range(6))
        b_t[...] = merged[0]
        b_nx[...] = merged[1]
        b_ny[...] = merged[2]
        b_nz[...] = merged[3]
        b_mid[...] = merged[4]
        b_pid[...] = merged[5]

    @pl.when(c == nchunks - 1)
    def _shade():
        act = i_act[...] > 0.0
        bt = b_t[...]
        hitm = act & (bt < _HIT_MAX)
        missm = act & ~(bt < _HIT_MAX)
        tr, tg, tb = i_tr[...], i_tg[...], i_tb[...]
        rr, rg, rb = i_rr[...], i_rg[...], i_rb[...]

        er, eg, eb = envc[0], envc[1], envc[2]
        if xla_env:
            # miss radiance is position/direction-dependent (cubemap or
            # Nishita sky): the caller adds it in ONE vectorized XLA step
            # per segment from this mask — misses never continue, so the
            # term is pure post-processing
            o_miss[...] = missm.astype(jnp.float32)
        else:
            rr = jnp.where(missm, rr + tr * er, rr)
            rg = jnp.where(missm, rg + tg * eg, rg)
            rb = jnp.where(missm, rb + tb * eb, rb)

        def mat_resolve(mid):
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

        ar, ag, ab, ro, me, em = mat_resolve(b_mid[...])

        nx, ny, nz = b_nx[...], b_ny[...], b_nz[...]
        inv = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-20))
        nx, ny, nz = nx * inv, ny * inv, nz * inv
        d_x, d_y, d_z = i_dx[...], i_dy[...], i_dz[...]
        dp = d_x * nx + d_y * ny + d_z * nz
        flip = dp > 0.0
        nx = jnp.where(flip, -nx, nx)
        ny = jnp.where(flip, -ny, ny)
        nz = jnp.where(flip, -nz, nz)

        rr = jnp.where(hitm, rr + tr * em * ar, rr)
        rg = jnp.where(hitm, rg + tg * em * ag, rg)
        rb = jnp.where(hitm, rb + tb * em * ab, rb)

        o_x, o_y, o_z = i_ox[...], i_oy[...], i_oz[...]
        hx = o_x + bt * d_x
        hy = o_y + bt * d_y
        hz = o_z + bt * d_z

        if is_first:
            # first-hit AOVs finalize at segment 0: in this feature
            # envelope (no alpha/BSSRDF re-spawn) every ray either
            # records its first event here or terminates
            a_nx[...] = jnp.where(hitm, nx, 0.0)
            a_ny[...] = jnp.where(hitm, ny, 0.0)
            a_nz[...] = jnp.where(hitm, nz, 0.0)
            if xla_env:  # primary-miss albedo patched in XLA
                a_ar[...] = jnp.where(hitm, ar, 0.0)
                a_ag[...] = jnp.where(hitm, ag, 0.0)
                a_ab[...] = jnp.where(hitm, ab, 0.0)
            else:
                a_ar[...] = jnp.where(hitm, ar, jnp.where(missm, er, 0.0))
                a_ag[...] = jnp.where(hitm, ag, jnp.where(missm, eg, 0.0))
                a_ab[...] = jnp.where(hitm, ab, jnp.where(missm, eb, 0.0))
            nohit = jnp.zeros_like(hx) + 999999.0
            a_px[...] = jnp.where(hitm, hx, nohit)
            a_py[...] = jnp.where(hitm, hy, nohit)
            a_pz[...] = jnp.where(hitm, hz, nohit)

        # every live ray at segment s carries hit_count == s, so the
        # continuation bound is static (ref RayFunctions.cuh:93-95);
        # middle segments all compile to the same kernel
        cont = hitm if has_cont else jnp.zeros_like(hitm)

        dpf = d_x * nx + d_y * ny + d_z * nz
        rx = d_x - 2.0 * dpf * nx
        ry = d_y - 2.0 * dpf * ny
        rz = d_z - 2.0 * dpf * nz
        rng = i_rng[...]
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

        o_tr[...] = jnp.where(cont, tr * ar * w, tr)
        o_tg[...] = jnp.where(cont, tg * ag * w, tg)
        o_tb[...] = jnp.where(cont, tb * ab * w, tb)
        o_ox[...] = jnp.where(cont, hx, o_x)
        o_oy[...] = jnp.where(cont, hy, o_y)
        o_oz[...] = jnp.where(cont, hz, o_z)
        o_dx[...] = jnp.where(cont, ndx, d_x)
        o_dy[...] = jnp.where(cont, ndy, d_y)
        o_dz[...] = jnp.where(cont, ndz, d_z)
        o_rng[...] = jnp.where(cont, rng2, rng)
        o_rr[...] = rr
        o_rg[...] = rg
        o_rb[...] = rb
        o_act[...] = cont.astype(jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("is_first", "has_cont", "xla_env", "rows",
                     "block_rows", "interpret", "chunk", "group_rows",
                     "subiv_mode", "nvisit"),
)
def _segment_call(table, sub_aabbs, chunk_aabbs, mat_table, env_vec, order,
                  skip, state, is_first: bool, has_cont: bool, rows: int,
                  interpret: bool, xla_env: bool = False,
                  block_rows: int = 64, chunk: int = TRI_CHUNK,
                  group_rows: int = 0, subbits=None, subiv=None,
                  subiv_mode: int = 1, nvisit: int = 0):
    """One trace+shade segment over planar state ((rows, 128) planes).

    ``state`` = (ox, oy, oz, dx, dy, dz, rng(i32), act, tr, tg, tb,
    rr, rg, rb); ``order``/``skip`` are (tiles, nchunks) int32
    scalar-prefetch inputs from ``_chunk_order``: the per-tile chunk
    visitation sequence (window index maps read ``order``, so each tile
    streams chunk windows front-to-back and culled steps repeat the
    previous window for DMA elision) and the per-step no-op flag.
    Returns (new_state, aovs-or-None, live_count).
    Only THREE kernel specializations exist per scene shape — first /
    middle / last segment — because every live ray at segment s carries
    hit_count == s (remote Mosaic compiles cost 30-300 s each; a
    per-segment-index specialization would pay that 9x per config)."""
    tiles = rows // block_rows
    nchunks = table.shape[0] // chunk
    # visit-axis window (VDEPTH_DEFAULT): run only the first ``nvisit``
    # visit steps of every tile's order/skip row. The caller guarantees
    # nvisit covers the max accepted-chunk count over these tiles, so
    # the dropped steps are exactly the provable no-op (skip == 1)
    # tail; order/skip stay full-width (only columns < nvisit are read)
    if nvisit:
        nchunks = nvisit
    sub = table.shape[0] // sub_aabbs.shape[0]
    grid = (tiles, nchunks)
    use_subbits = subbits is not None
    use_subiv = subiv is not None
    assert not (use_subbits and use_subiv)

    if use_subbits or use_subiv:
        # a third scalar-prefetch arg shifts every index-map signature
        ray_spec = pl.BlockSpec((block_rows, _LANES),
                                lambda i, c, o, s, b: (i, 0))
        tri_spec = pl.BlockSpec((chunk, _COLS),
                                lambda i, c, o, s, b: (o[i, c], 0),
                                memory_space=pltpu.SMEM)
        sub_spec = pl.BlockSpec((chunk // sub, 8),
                                lambda i, c, o, s, b: (o[i, c], 0),
                                memory_space=pltpu.SMEM)
    else:
        ray_spec = pl.BlockSpec((block_rows, _LANES),
                                lambda i, c, o, s: (i, 0))
        # culled steps repeat the previous step's window index, so their
        # HBM->SMEM window DMA is elided (Pallas only refetches on change)
        tri_spec = pl.BlockSpec((chunk, _COLS),
                                lambda i, c, o, s: (o[i, c], 0),
                                memory_space=pltpu.SMEM)
        sub_spec = pl.BlockSpec((chunk // sub, 8),
                                lambda i, c, o, s: (o[i, c], 0),
                                memory_space=pltpu.SMEM)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    plane = jax.ShapeDtypeStruct((rows, _LANES), jnp.float32)
    iplane = jax.ShapeDtypeStruct((rows, _LANES), jnp.int32)
    out_shape = (plane,) * 6 + (iplane,) + (plane,) * 7
    n_out = 14
    if is_first:
        out_shape = out_shape + (plane,) * 9
        n_out += 9
    if xla_env:
        out_shape = out_shape + (plane,)
        n_out += 1

    scratch = [pltpu.VMEM((block_rows, _LANES), jnp.float32)] * 6 + [
        pltpu.SMEM((1,), jnp.float32)
    ]

    kernel = functools.partial(
        _kernel, is_first=is_first, has_cont=has_cont, xla_env=xla_env,
        num_mats=int(mat_table.shape[0]), nchunks=nchunks,
        block_rows=block_rows, unroll=resolve_unroll(interpret, sub),
        chunk=chunk, sub=sub, group_rows=group_rows,
        use_subbits=use_subbits,
        use_subiv=subiv_mode if use_subiv else 0,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3 if (use_subbits or use_subiv) else 2,
        grid=grid,
        in_specs=[tri_spec, sub_spec, smem_spec, smem_spec, smem_spec]
        + [ray_spec] * 14,
        out_specs=[ray_spec] * n_out,
        scratch_shapes=scratch,
    )
    prefetch = (order, skip)
    if use_subbits:
        prefetch = (order, skip, subbits)
    elif use_subiv:
        prefetch = (order, skip, subiv)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(*prefetch, table, sub_aabbs, chunk_aabbs, mat_table, env_vec,
      *state)
    new_state = outs[:14]
    k = 14
    aovs = None
    if is_first:
        aovs = outs[k:k + 9]
        k += 9
    miss = outs[k] if xla_env else None
    # live count this segment = rays active at its start
    live = jnp.sum(state[7])
    return new_state, aovs, live, miss


def _chunk_order(state, chunk_aabbs, block_rows):
    """Per-tile front-to-back culled chunk order (see ops/chunk_order.py;
    shared with the wavefront trace kernel in ops/pallas_brute.py)."""
    from raytracerfacility_tpu.ops.chunk_order import chunk_order

    ox, oy, oz, dx, dy, dz = state[:6]
    return chunk_order(ox, oy, oz, dx, dy, dz, state[7] > 0.0,
                       chunk_aabbs, block_rows)


def _sub_bits(state, table, sub_aabbs, block_rows, chunk):
    """Per-(tile, chunk) sub-run cull bitmask (see SUBBITS_DEFAULT).
    nchunks comes from the triangle table so the mask width matches the
    kernel grid exactly (chunk_aabbs may carry extra pad rows)."""
    from raytracerfacility_tpu.ops.chunk_order import sub_run_bits

    nch = table.shape[0] // chunk
    ox, oy, oz, dx, dy, dz = state[:6]
    return sub_run_bits(ox, oy, oz, dx, dy, dz, state[7] > 0.0,
                        sub_aabbs, block_rows, nch)


def _sub_interval(state, table, sub_aabbs, block_rows, chunk):
    """Per-(tile, chunk) [lo, hi) sub-run hull (see SUBIV_DEFAULT)."""
    from raytracerfacility_tpu.ops.chunk_order import sub_run_interval

    nch = table.shape[0] // chunk
    ox, oy, oz, dx, dy, dz = state[:6]
    return sub_run_interval(ox, oy, oz, dx, dy, dz, state[7] > 0.0,
                            sub_aabbs, block_rows, nch)


def _morton_key(ox, oy, oz, dx, dy, dz, act, lo, inv_extent):
    """int32 reorder key: direction octant in the HIGH bits, morton
    origin cell below; dead rays get INT32_MAX-ish keys so a stable
    argsort compacts them to the pool tail."""
    m = MORTON_BITS
    scale = float(1 << m)
    qx = jnp.clip(((ox - lo[0]) * inv_extent[0] * scale).astype(jnp.int32),
                  0, (1 << m) - 1)
    qy = jnp.clip(((oy - lo[1]) * inv_extent[1] * scale).astype(jnp.int32),
                  0, (1 << m) - 1)
    qz = jnp.clip(((oz - lo[2]) * inv_extent[2] * scale).astype(jnp.int32),
                  0, (1 << m) - 1)
    code = jnp.zeros_like(qx)
    for b in range(m):
        code = code | (((qx >> b) & 1) << (3 * b + 2))
        code = code | (((qy >> b) & 1) << (3 * b + 1))
        code = code | (((qz >> b) & 1) << (3 * b))
    octant = ((dx < 0).astype(jnp.int32) * 4
              + (dy < 0).astype(jnp.int32) * 2
              + (dz < 0).astype(jnp.int32))
    if DIR_BITS > 0:
        # cubemap-style refinement: dominant axis (3 values) + the two
        # minor-axis slopes quantized to 2^k each. Combined with the
        # octant (signs), a bucket is a cone of half-angle ~atan(1/2^k).
        k = DIR_BITS
        ax, ay, az = jnp.abs(dx), jnp.abs(dy), jnp.abs(dz)
        dom = jnp.where(ax >= jnp.maximum(ay, az), 0,
                        jnp.where(ay >= az, 1, 2))
        amax = jnp.maximum(ax, jnp.maximum(ay, az))
        inv = 1.0 / jnp.maximum(amax, 1e-20)
        # the two non-dominant slopes in [0, 1)
        u = jnp.where(dom == 0, ay, ax) * inv
        v = jnp.where(dom == 2, ay, az) * inv
        scale_d = float(1 << k)
        qu = jnp.clip((u * scale_d).astype(jnp.int32), 0, (1 << k) - 1)
        qv = jnp.clip((v * scale_d).astype(jnp.int32), 0, (1 << k) - 1)
        dkey = ((octant * 3 + dom) << (2 * k)) | (qu << k) | qv
        key = (dkey << (3 * m)) | code
    else:
        key = (octant << (3 * m)) | code
    return jnp.where(act > 0.0, key, jnp.int32(2147483647))


def _apply_block_perm(perm, planes, brows: int, interpret: bool):
    """Permute (rows, 128) planes at (brows, 128)-block granularity in ONE
    Pallas pass: the input BlockSpec index map reads the target block id
    from the scalar-prefetch ``perm`` (the same mechanism the trace kernel
    uses for its per-tile chunk windows), outputs write sequentially — the
    whole reorder is straight DMA, no sort network, no gather."""
    rows = planes[0].shape[0]
    nblocks = rows // brows
    n = len(planes)

    def kern(perm_ref, *refs):
        del perm_ref
        for i in range(n):
            refs[n + i][...] = refs[i][...]

    in_spec = pl.BlockSpec((brows, _LANES), lambda b, p: (p[b], 0))
    out_spec = pl.BlockSpec((brows, _LANES), lambda b, p: (b, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(nblocks,),
        in_specs=[in_spec] * n, out_specs=[out_spec] * n)
    out_shape = tuple(jax.ShapeDtypeStruct(p.shape, p.dtype) for p in planes)
    return pl.pallas_call(kern, grid_spec=grid_spec, out_shape=out_shape,
                          interpret=interpret)(perm, *planes)


@functools.partial(
    jax.jit,
    static_argnames=("bounces", "presort", "interpret", "lighting_type",
                     "atmos_samples", "atmos_samples_light", "sort_block",
                     "chunk", "trace_window", "group_rows", "bperm_rows",
                     "bperm_from", "bperm_exact", "wdepth", "subbits",
                     "subiv", "split", "vdepth"))
def _render_pool_sorted(table, sub_aabbs, chunk_aabbs, mat_table, origin,
                        direction, rng, valid, env_vec, bounces: int,
                        presort: bool = False, interpret: bool = False,
                        env_state=None, lighting_type: int = 0,
                        atmos_samples: int = 16,
                        atmos_samples_light: int = 8,
                        sort_block: int = 0, chunk: int = TRI_CHUNK,
                        trace_window: bool = True, group_rows: int = 0,
                        bperm_rows: int = 0, bperm_from: int = 1,
                        bperm_exact: int = 0, wdepth: int = 3,
                        subbits: bool = False, subiv: int = 0,
                        split: int = 0, vdepth: int = 0):
    r = origin.shape[0]
    block_rows = _pick_block_rows((r + _LANES - 1) // _LANES,
                                  nchunks=table.shape[0] // chunk)
    block = block_rows * _LANES
    pad = (-r) % block
    if pad:
        origin = jnp.concatenate([origin, jnp.zeros((pad, 3), jnp.float32)], 0)
        direction = jnp.concatenate(
            [direction,
             jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32),
                      (pad, 1))], 0)
        rng = jnp.concatenate([rng, jnp.zeros((pad,), jnp.uint32)])
        valid = jnp.concatenate([valid, jnp.zeros((pad,), jnp.float32)])
    rp = r + pad
    rows = rp // _LANES

    def plane(x):
        return x.reshape(rows, _LANES)

    zero = jnp.zeros((rows, _LANES), jnp.float32)
    one = zero + 1.0
    state = (
        plane(origin[:, 0]), plane(origin[:, 1]), plane(origin[:, 2]),
        plane(direction[:, 0]), plane(direction[:, 1]), plane(direction[:, 2]),
        plane(jax.lax.bitcast_convert_type(rng, jnp.int32)), plane(valid),
        one, one, one,  # throughput
        zero, zero, zero,  # radiance
    )

    # scene bounds for the reorder key, from the chunk AABB table (pad
    # chunks carry inverted boxes; mask them out)
    cvalid = chunk_aabbs[:, 0] < 1e37
    big = 3.4e38
    lo = jnp.min(jnp.where(cvalid[:, None], chunk_aabbs[:, 0:3], big), axis=0)
    hi = jnp.max(jnp.where(cvalid[:, None], chunk_aabbs[:, 3:6], -big), axis=0)
    inv_extent = 1.0 / jnp.maximum(hi - lo, 1e-6)

    orig_idx = jnp.arange(rp, dtype=jnp.int32).reshape(rows, _LANES)

    # block-local sort: rays only need coherence within a tile, so when
    # the pool spans many sort blocks, sort each block independently
    # (a batched (nb, L) row sort is far cheaper than one global sort;
    # any permutation is equally CORRECT — the best-hit record is
    # visit-order independent and every ray keeps its own lane state)
    block_rays = (sort_block * block_rows * _LANES
                  if sort_block > 0 else 0)
    nb = rp // block_rays if block_rays and rp % block_rays == 0 else 1

    def _reorder_at(rp_w: int, wdepth_w: int):
        # ONE multi-operand lax.sort carrying the whole ray state as
        # payloads. Measured on-chip at 2M rays: argsort + stacked
        # row-gather nets ~39 ms (the gather dominates at ~33 ms), while
        # the key+payloads lax.sort nets ~12-14 ms — the sort network
        # moves the payload rows in-place instead of a pathological XLA
        # gather (scripts/profile_seg_frame.py, fenced per PERF.md rules;
        # an earlier ~2 ms reading came from a probe that consumed only
        # one sort output, letting XLA drop the other payload columns).
        # The act plane does NOT ride as a payload: dead rays are exactly
        # the INT32_MAX keys (live keys fit in 16 bits), so act is
        # recomputed from the sorted key — one less 8 MB plane to move.
        #
        # LIVENESS-BUCKETED SORT WINDOW: after a sort, live rays occupy a
        # prefix whose length is that sort's live count; deaths only
        # punch holes in it. So the next reorder needs to sort only the
        # smallest static bucket (full/half/quarter/eighth of the pool)
        # that covers the PREVIOUS segment's entering-live count — a
        # lax.cond picks the bucket on device, the dead tail passes
        # through untouched. Bit-identical to the full sort: lax.sort is
        # stable, so live rays land in the same order either way, and
        # dead-lane placement never affects any ray's arithmetic (the
        # final unsort restores original order exactly). At 8 bounces
        # the reorder was 101 ms of a 360 ms frame, with segments 4+
        # paying more for the sort than the trace it enables.
        #
        # Width-parameterized (rp_w rays): the static phase split (see
        # RTF_TPU_SEG_SPLIT below) runs late-bounce reorders on a
        # genuinely sliced prefix, so even the window tails' full-pool
        # concatenates shrink to the split width.
        rows_w = rp_w // _LANES

        def plane_w(x):
            return x.reshape(rows_w, _LANES)

        def reorder_w(state, orig_idx, prev_live=None):
            key = _morton_key(state[0], state[1], state[2],
                              state[3], state[4], state[5], state[7],
                              lo, inv_extent)
            f32s = [p.reshape(rp_w) for p in state[:6] + state[8:]]
            i32s = [state[6].reshape(rp_w), orig_idx.reshape(rp_w)]
            ops = [key.reshape(rp_w)] + f32s + i32s

            def sort_window(w):
                def f(o):
                    sub = o if w == rp_w else tuple(x[:w] for x in o)
                    outs = jax.lax.sort(sub, num_keys=1)
                    if w == rp_w:
                        return outs
                    return tuple(jnp.concatenate([s, full[w:]])
                                 for s, full in zip(outs, o))
                return f

            if nb > 1 and rp_w == rp:
                # block-local: lax.sort batches over leading dims for free
                bops = tuple(o.reshape(nb, rp_w // nb) for o in ops)
                outs = jax.lax.sort(bops, num_keys=1)
                outs = tuple(o.reshape(rp_w) for o in outs)
            elif prev_live is None or rp_w < (1 << wdepth_w) * block:
                outs = sort_window(rp_w)(tuple(ops))
            else:
                # cond cascade from the smallest window (rp_w >> wdepth_w)
                # up to the full pool; structurally the round-3 fixed
                # /2 /4 /8 cascade at wdepth=3
                def cascade(k):
                    if k == 0:
                        return sort_window(rp_w)
                    return lambda o: jax.lax.cond(
                        prev_live <= float(rp_w >> k),
                        sort_window(rp_w >> k), cascade(k - 1), o)

                outs = cascade(wdepth_w)(tuple(ops))
            key_s = outs[0].reshape(rp_w)
            act = plane_w(
                (key_s != jnp.int32(2147483647)).astype(jnp.float32))
            p6 = [plane_w(o.reshape(rp_w)) for o in outs[1:7]]
            rest = [plane_w(o.reshape(rp_w)) for o in outs[7:13]]
            rng_p = plane_w(outs[13].reshape(rp_w))
            return (*p6, rng_p, act, *rest), plane_w(outs[14].reshape(rp_w))

        return reorder_w

    reorder = _reorder_at(rp, wdepth)

    def reorder_bperm(state, orig_idx):
        # BLOCK-granular permutation (see BPERM_DEFAULT note): block key =
        # min of its rays' Morton keys (all-dead blocks key to INT32_MAX
        # and land at the tail, preserving the block-prefix liveness
        # property the trace window needs), argsort over nblocks scalars,
        # then ONE scalar-prefetch DMA pass moves all 15 planes. Any
        # permutation is bit-identically correct: a ray's own arithmetic
        # never depends on its lane, and the best-hit record is
        # visit-order independent — only tile grouping (culling quality)
        # changes. Returns the block-prefix live extent in rays for the
        # trace-window cascade (live rays are NOT lane-compacted here, so
        # the extent counts not-all-dead BLOCKS, not live rays).
        key = _morton_key(state[0], state[1], state[2],
                          state[3], state[4], state[5], state[7],
                          lo, inv_extent)
        nblocks = rows // bperm_rows
        bkeys = jnp.min(key.reshape(nblocks, bperm_rows * _LANES), axis=1)
        perm = jnp.argsort(bkeys).astype(jnp.int32)
        outs = _apply_block_perm(perm, list(state) + [orig_idx],
                                 bperm_rows, interpret)
        live_blocks = jnp.sum((bkeys != jnp.int32(2147483647)).astype(
            jnp.float32))
        extent = live_blocks * float(bperm_rows * _LANES)
        return tuple(outs[:14]), outs[14], extent

    xla_env = env_state is not None

    def add_env(state, prev, miss, n=None):
        """Position/direction-dependent miss radiance (cubemap Scene or
        Nishita Skydome), ONE vectorized XLA step per segment — exactly
        the wavefront engine's miss formula (ref MissFunc,
        RayFunctions.cuh:260-272), so results match it bit-for-bit.
        ``n`` is the window's ray count (the env step runs on the same
        liveness window as the trace: misses only occur on live lanes,
        all of which sit inside the window)."""
        from raytracerfacility_tpu.ops.environment import (
            calculate_environmental_light,
        )

        if n is None:
            n = rp
        o = jnp.stack([prev[0].reshape(n), prev[1].reshape(n),
                       prev[2].reshape(n)], axis=-1)
        d = jnp.stack([prev[3].reshape(n), prev[4].reshape(n),
                       prev[5].reshape(n)], axis=-1)
        light = calculate_environmental_light(
            o, d, env_state, lighting_type, atmos_samples,
            atmos_samples_light)
        m = miss.reshape(n)
        rad = [
            (state[11 + i].reshape(n)
             + m * prev[8 + i].reshape(n) * light[:, i]).reshape(
                 n // _LANES, _LANES)
            for i in range(3)
        ]
        return state[:11] + tuple(rad), light, m

    if presort:
        # incoherent primaries (probe pools): group BEFORE the first
        # trace; AOVs then come out permuted and scatter back below
        state, orig_idx = reorder(state, orig_idx)
    aov_orig_idx = orig_idx  # segment-0 order, for AOV scatter-back

    # sub-run cull bits need <= 32 sub-runs per chunk (int32 mask);
    # the [lo, hi) hull variant has no cap and wins the conflict
    sub_rows = table.shape[0] // sub_aabbs.shape[0]
    use_siv = subiv > 0
    siv_mode = subiv if use_siv else 1
    use_sb = subbits and not use_siv and chunk // sub_rows <= 32

    # visit-axis window cascade (VDEPTH_DEFAULT): static visit widths
    # nch_k, /2, ..., /2^vdepth; a segment runs on the smallest width
    # covering the max accepted-chunk count over its tiles' order rows
    nch_k = table.shape[0] // chunk
    _vws = []
    for _k in range(max(vdepth, 0) + 1):
        _w = -(-nch_k // (1 << _k))
        if _w not in _vws:
            _vws.append(_w)

    def _with_visit_window(skip_tab, call):
        """``call(nv)`` runs one segment at static visit width ``nv``
        (0 = full) and returns a FLAT tuple; all branches of the cond
        cascade return identical shapes. Bit-identical: every visit
        step >= a tile's accepted count carries skip == 1 (a no-op that
        repeats the previous window), and nv always covers the max
        accepted count, so only no-op steps are dropped."""
        if vdepth <= 0 or len(_vws) < 2 or nch_k < 4:
            return call(0)
        nacc = jnp.max(jnp.sum(
            jnp.int32(1) - skip_tab[:, :nch_k], axis=1)).astype(jnp.float32)

        def cascade(k):
            if k == 0:
                return lambda _: call(_vws[0])
            return lambda _: jax.lax.cond(
                nacc <= float(_vws[k]), lambda __: call(_vws[k]),
                cascade(k - 1), None)

        return cascade(len(_vws) - 1)(None)

    prev = state
    order, skip = _chunk_order(state, chunk_aabbs, block_rows)
    sb_tab = (_sub_bits(state, table, sub_aabbs, block_rows, chunk)
              if use_sb else None)
    siv_tab = (_sub_interval(state, table, sub_aabbs, block_rows, chunk)
               if use_siv else None)
    state0 = state

    def _first_flat(nv):
        st, av, _, ms = _segment_call(
            table, sub_aabbs, chunk_aabbs, mat_table, env_vec, order, skip,
            state0, is_first=True, has_cont=bounces >= 1, rows=rows,
            interpret=interpret, xla_env=xla_env, block_rows=block_rows,
            chunk=chunk, group_rows=group_rows, subbits=sb_tab,
            subiv=siv_tab, subiv_mode=siv_mode, nvisit=nv)
        return tuple(st) + tuple(av) + ((ms,) if xla_env else ())

    flat = _with_visit_window(skip, _first_flat)
    state = flat[:14]
    aovs = flat[14:23]
    miss = flat[23] if xla_env else None
    live0 = jnp.sum(state0[7])
    total_live = live0
    if xla_env:
        state, light, m = add_env(state, prev, miss)
        # primary-miss albedo AOV = environment radiance (ref MissFunc
        # writes m_albedo; segment 0 misses are primary by definition)
        aovs = list(aovs)
        for i in range(3):
            aovs[3 + i] = plane(jnp.where(m > 0.0, light[:, i],
                                          aovs[3 + i].reshape(rp)))
        aovs = tuple(aovs)

    # live extent of the current compacted prefix: all live rays sit in
    # the first `prefix_live` rows. Established by each sort (= the live
    # count entering the segment right after it); deaths between sorts
    # only punch holes, never extend it. Before ANY sort the prefix
    # property is not guaranteed (callers may pass an arbitrary `valid`
    # mask), so the first in-loop sort stays full unless `presort`
    # already compacted the pool.
    prefix_live = live0 if presort else None

    tiles = rows // block_rows

    def _seg_window_at(rows_w: int):
        tiles_w = rows_w // block_rows

        def seg_window(wt, has_cont):
            """One bounce segment on the first ``wt`` tiles; identity on
            the dead tail (the kernel writes every dead lane's state back
            unchanged, so slicing it off is bit-identical)."""
            wr = wt * block_rows

            def f(st):
                sub = st if wr == rows_w else tuple(p[:wr] for p in st)
                order, skip = _chunk_order(sub, chunk_aabbs, block_rows)
                sb_tab = (_sub_bits(sub, table, sub_aabbs, block_rows,
                                    chunk) if use_sb else None)
                siv_tab = (_sub_interval(sub, table, sub_aabbs, block_rows,
                                         chunk) if use_siv else None)

                def _mid_flat(nv):
                    o, _, _, ms = _segment_call(
                        table, sub_aabbs, chunk_aabbs, mat_table, env_vec,
                        order, skip, sub, is_first=False,
                        has_cont=has_cont, rows=wr, interpret=interpret,
                        xla_env=xla_env, block_rows=block_rows,
                        chunk=chunk, group_rows=group_rows,
                        subbits=sb_tab, subiv=siv_tab,
                        subiv_mode=siv_mode, nvisit=nv)
                    return tuple(o) + ((ms,) if xla_env else ())

                flat = _with_visit_window(skip, _mid_flat)
                out = flat[:14]
                miss = flat[14] if xla_env else None
                if xla_env:
                    out, _, _ = add_env(out, sub, miss, n=wr * _LANES)
                if wr == rows_w:
                    return out
                return tuple(jnp.concatenate([o, p[wr:]], axis=0)
                             for o, p in zip(out, st))
            return f

        def run_bounce(st, extent, has_cont, wdepth_w):
            # window sizes are in whole kernel TILES (ceil(tiles/2^k)) so
            # the windowed grid stays block-aligned; `extent` is compared
            # in rays. Cascade mirrors the reorder's sort windows above.
            if (extent is None or not trace_window
                    or tiles_w < (1 << wdepth_w)):
                return seg_window(tiles_w, has_cont)(st)
            wts = [-(-tiles_w // (1 << k)) for k in range(wdepth_w + 1)]
            cover = [float(w * block_rows * _LANES) for w in wts]

            def cascade(k):
                if k == 0:
                    return seg_window(wts[0], has_cont)
                return lambda o: jax.lax.cond(
                    extent <= cover[k], seg_window(wts[k], has_cont),
                    cascade(k - 1), o)

            return cascade(wdepth_w)(st)

        return run_bounce

    def bounce_loop(state, orig_idx, prefix_live, s_start: int,
                    s_end: int, skip_first_reorder: bool = False):
        """Segments ``s_start..s_end`` at the state's CURRENT width (a
        prefix slice of the pool under the phase split). Returns
        (state, orig_idx, live-ray total, prefix_live)."""
        rows_w = state[0].shape[0]
        rp_w = rows_w * _LANES
        # inside a split branch the pool is already near the live extent;
        # cap the inner cascades at /4 windows to bound program size
        wdepth_w = wdepth if rows_w == rows else min(wdepth, 2)
        reorder_w = (reorder if rows_w == rows
                     else _reorder_at(rp_w, wdepth_w))
        run_bounce = _seg_window_at(rows_w)
        total = jnp.float32(0.0)
        for s in range(s_start, s_end + 1):
            sorted_now = (s - 1) % REORDER_EVERY == 0
            use_bperm = (bperm_rows > 0 and s >= bperm_from
                         and rows_w % bperm_rows == 0
                         and rows_w == rows)
            if use_bperm and bperm_exact > 0 and (
                    (s - bperm_from) % bperm_exact == bperm_exact - 1):
                # periodic exact re-sort inside the bperm region:
                # re-compacts lanes and resets within-block divergence
                # (see BPERM_EXACT_DEFAULT). prefix_live after bperm
                # segments is a block-granular UPPER BOUND on the live
                # extent, which is all the sort-window cascade needs.
                use_bperm = False
            first_here = skip_first_reorder and s == s_start
            if sorted_now and use_bperm and not first_here:
                state, orig_idx, extent = reorder_bperm(state, orig_idx)
            elif sorted_now and not first_here:
                state, orig_idx = reorder_w(state, orig_idx,
                                            prev_live=prefix_live)
            live_s = jnp.sum(state[7])
            if sorted_now:
                # after a full sort live rays form an exact lane prefix;
                # after a block permutation only a BLOCK prefix — the
                # window cascade compares in rays either way
                prefix_live = extent if use_bperm else live_s
            state = run_bounce(state, prefix_live, s < bounces, wdepth_w)
            total = total + live_s
        return state, orig_idx, total, prefix_live

    # STATIC PHASE SPLIT (RTF_TPU_SEG_SPLIT = s0): liveness is
    # monotonically non-increasing, but every windowed sort / trace tail
    # above still CONCATENATES back to the full pool width — 15 (sort) +
    # 14 (trace) full-pool plane writes per segment, the measured
    # ~18-21 ms/segment floor that survives even 1/8 windows (PERF.md
    # round 4). So: right after the reorder entering segment s0 (which
    # compacts live rays into an exact prefix), pick the smallest static
    # tile-aligned width covering the live count via ONE lax.cond
    # cascade and run ALL remaining segments on genuinely sliced planes;
    # the frozen dead tail is concatenated back ONCE at the end.
    # Bit-identical: the kernel is the identity on dead lanes, sliced
    # sorts of a compacted prefix sort the same live set (lax.sort is
    # stable and live keys < dead keys), and dead-lane placement never
    # affects any ray's arithmetic — same invariants as the per-segment
    # windows, applied to the pool itself.
    do_split = (0 < split <= bounces and trace_window
                and REORDER_EVERY == 1 and bperm_rows == 0 and nb == 1
                and tiles >= (1 << wdepth))
    if not do_split:
        state, orig_idx, tl, prefix_live = bounce_loop(
            state, orig_idx, prefix_live, 1, bounces)
        total_live = total_live + tl
    else:
        if split > 1:
            state, orig_idx, tl, prefix_live = bounce_loop(
                state, orig_idx, prefix_live, 1, split - 1)
            total_live = total_live + tl
        # the splitting reorder runs at FULL width: it establishes the
        # exact live prefix the branch widths are chosen against
        state, orig_idx = reorder(state, orig_idx, prev_live=prefix_live)
        live_sp = jnp.sum(state[7])

        def split_branch(wt: int):
            wr = wt * block_rows

            def f(args):
                st, oi = args
                stw = (st if wr == rows
                       else tuple(p[:wr] for p in st))
                oiw = oi if wr == rows else oi[:wr]
                out, oio, tl, _ = bounce_loop(
                    stw, oiw, live_sp, split, bounces,
                    skip_first_reorder=True)
                if wr == rows:
                    return out, oio, tl
                return (tuple(jnp.concatenate([o, p[wr:]], axis=0)
                              for o, p in zip(out, st)),
                        jnp.concatenate([oio, oi[wr:]], axis=0), tl)
            return f

        wts = [-(-tiles // (1 << k)) for k in range(wdepth + 1)]
        cover = [float(w * block_rows * _LANES) for w in wts]

        def cascade(k):
            if k == 0:
                return split_branch(wts[0])
            return lambda a: jax.lax.cond(
                live_sp <= cover[k], split_branch(wts[k]),
                cascade(k - 1), a)

        state, orig_idx, tl = cascade(wdepth)((state, orig_idx))
        total_live = total_live + tl

    # restore original ray order: sorting (orig_idx, payloads...) by the
    # index IS the inverse permutation, and the multi-operand sort is
    # ~4x cheaper than an XLA scatter at 2M rays (same finding as the
    # reorder above)
    idx = orig_idx.reshape(rp)
    _, rr, rg, rb = jax.lax.sort(
        (idx, state[11].reshape(rp), state[12].reshape(rp),
         state[13].reshape(rp)), num_keys=1)
    radiance = jnp.stack([rr, rg, rb], axis=-1)[:r]

    if presort:
        # AOVs were produced in the presorted order; idx maps the
        # CURRENT order back to original, but AOVs froze at segment 0's
        # order — invert through the segment-0 index map instead
        aov_idx = aov_orig_idx.reshape(rp)

        def unplane3(a, b, c):
            _, ua, ub, uc = jax.lax.sort(
                (aov_idx, a.reshape(rp), b.reshape(rp), c.reshape(rp)),
                num_keys=1)
            return jnp.stack([ua, ub, uc], axis=-1)[:r]
    else:
        def unplane3(a, b, c):
            return jnp.stack([a.reshape(rp)[:r], b.reshape(rp)[:r],
                              c.reshape(rp)[:r]], axis=-1)

    normal = unplane3(*aovs[0:3])
    albedo = unplane3(*aovs[3:6])
    position = unplane3(*aovs[6:9])
    return radiance, normal, albedo, position, total_live


def render_pool_sorted(tables, origin, direction, rng, valid, env_rgb,
                       bounces: int, presort: bool = False,
                       interpret: bool | None = None, env_state=None,
                       lighting_type: int = 0, atmos_samples: int = 16,
                       atmos_samples_light: int = 8,
                       chunk: int = TRI_CHUNK):
    """Public entry; signature mirrors pallas_fused.render_pool_fused
    (Scene/Skydome lighting — SLS is single-segment and stays fused).
    ``presort`` groups the pool before the FIRST trace too — for
    workloads whose primaries are already incoherent (probe pools).
    ``env_state`` (an EnvironmentState) switches miss shading to the
    per-segment XLA hook: cubemap Scene and Nishita Skydome environments
    run on this fast path, which the monolithic fused kernel cannot do
    (texture/sky gathers have no Mosaic lowering)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    env_vec = jnp.zeros((16,), jnp.float32)
    env_vec = env_vec.at[: env_rgb.shape[0]].set(env_rgb)
    table, sub_aabbs, chunk_aabbs, mat_table = tables
    return _render_pool_sorted(
        table, sub_aabbs, chunk_aabbs, mat_table, origin, direction, rng,
        valid, env_vec, bounces=bounces, presort=bool(presort),
        interpret=bool(interpret), env_state=env_state,
        lighting_type=int(lighting_type), atmos_samples=int(atmos_samples),
        atmos_samples_light=int(atmos_samples_light),
        sort_block=int(os.environ.get("RTF_TPU_SORT_BLOCK",
                                      SORT_BLOCK_DEFAULT)),
        chunk=int(chunk),
        trace_window=os.environ.get("RTF_TPU_TRACE_WINDOW",
                                    TRACE_WINDOW_DEFAULT) == "1",
        group_rows=int(os.environ.get("RTF_TPU_SEG_GROUP",
                                      SEG_GROUP_DEFAULT)),
        bperm_rows=int(os.environ.get("RTF_TPU_SEG_BPERM", BPERM_DEFAULT)),
        bperm_from=int(os.environ.get("RTF_TPU_SEG_BPERM_FROM",
                                      BPERM_FROM_DEFAULT)),
        bperm_exact=int(os.environ.get("RTF_TPU_SEG_BPERM_EXACT",
                                       BPERM_EXACT_DEFAULT)),
        wdepth=int(os.environ.get("RTF_TPU_SEG_WDEPTH", WDEPTH_DEFAULT)),
        subbits=os.environ.get("RTF_TPU_SEG_SUBBITS",
                               SUBBITS_DEFAULT) == "1",
        subiv=int(os.environ.get("RTF_TPU_SEG_SUBIV", SUBIV_DEFAULT)),
        split=int(os.environ.get("RTF_TPU_SEG_SPLIT", SPLIT_DEFAULT)),
        vdepth=int(os.environ.get("RTF_TPU_SEG_VDEPTH", VDEPTH_DEFAULT)),
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _trace_sorted(table, sub_aabbs, chunk_aabbs, origin, direction, tmin,
                  tmax, interpret=False):
    from raytracerfacility_tpu.ops.pallas_brute import _trace

    r = origin.shape[0]
    # scene bounds for the reorder key, from the chunk AABB table (pad
    # chunks carry inverted boxes; mask them out) — same derivation as
    # _render_pool_sorted above
    cvalid = chunk_aabbs[:, 0] < 1e37
    big = 3.4e38
    lo = jnp.min(jnp.where(cvalid[:, None], chunk_aabbs[:, 0:3], big), axis=0)
    hi = jnp.max(jnp.where(cvalid[:, None], chunk_aabbs[:, 3:6], -big), axis=0)
    inv_extent = 1.0 / jnp.maximum(hi - lo, 1e-6)

    # a lane can only accept a hit in (tmin, tmax): lanes outside that
    # window (wavefront dead lanes carry tmax = -3e38) compact to the
    # pool tail exactly like the segmented engine's dead rays
    act = (tmax > tmin).astype(jnp.float32)
    key = _morton_key(origin[:, 0], origin[:, 1], origin[:, 2],
                      direction[:, 0], direction[:, 1], direction[:, 2],
                      act, lo, inv_extent)
    idx = jnp.arange(r, dtype=jnp.int32)
    outs = jax.lax.sort(
        (key, origin[:, 0], origin[:, 1], origin[:, 2],
         direction[:, 0], direction[:, 1], direction[:, 2],
         tmin, tmax, idx),
        num_keys=1)
    o_s = jnp.stack(outs[1:4], axis=-1)
    d_s = jnp.stack(outs[4:7], axis=-1)
    t, prim, u, v = _trace(table, sub_aabbs, chunk_aabbs, o_s, d_s,
                           outs[7], outs[8], interpret=interpret)
    # unsort: sorting by the carried original index IS the inverse
    # permutation (see the engine's final unsort above for why this beats
    # an XLA scatter/gather)
    _, t, prim, u, v = jax.lax.sort((outs[9], t, prim, u, v), num_keys=1)
    return t, prim, u, v


def trace_closest_sorted(tri_table, origin, direction, tmin, tmax,
                         interpret: bool | None = None):
    """Coherence-sorted closest-hit trace: one multi-operand lax.sort
    groups rays by (direction octant, origin Morton cell) and compacts
    dead lanes to the tail, the streaming brute kernel traces the sorted
    pool (its per-tile front-to-back chunk culling now sees coherent
    tiles), and a second sort restores original order.

    BIT-IDENTICAL to ops.pallas_brute.trace_closest_pallas: the per-pair
    Möller-Trumbore/curve math is lane-independent and the best-hit
    record is a lexicographic (t, original-prim-id) min, so results are
    visit-order (and therefore permutation) independent.

    This is the wavefront engine's traversal upgrade for feature-rich
    pools (textures/BTF/alpha — the shading the reference runs inside its
    one OptiX pipeline, RayFunctions.cuh:25-258, which here runs as XLA
    between trace segments): bounce segments regain the tile-coherent
    culling the segmented Default-material engine gets from its in-loop
    reorder (ops/pallas_seg._render_pool_sorted)."""
    from raytracerfacility_tpu.ops.intersect import TraceResult
    from raytracerfacility_tpu.ops.pallas_brute import _flatten

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    batch, origin, direction, tmin_f, tmax_f = _flatten(
        origin, direction, tmin, tmax)
    table, sub_aabbs, chunk_aabbs = tri_table
    t, prim, u, v = _trace_sorted(table, sub_aabbs, chunk_aabbs, origin,
                                  direction, tmin_f, tmax_f,
                                  interpret=bool(interpret))
    prim_i = prim.astype(jnp.int32)
    return TraceResult(
        t=t.reshape(batch),
        prim=prim_i.reshape(batch),
        u=u.reshape(batch),
        v=v.reshape(batch),
        hit=(prim_i >= 0).reshape(batch),
    )


def sorted_trace_dispatch(rays: int) -> bool:
    """Should a wavefront trace call use trace_closest_sorted?
    RTF_TPU_SORTED_TRACE=1/0 forces; unset -> auto (pools big enough
    that the two lax.sorts amortize against the culling they unlock)."""
    flag = os.environ.get("RTF_TPU_SORTED_TRACE")
    if flag is not None:
        return flag == "1"
    return rays >= (1 << 15)


def sorted_dispatch(tables, incoherent: bool, rays: int = 0,
                    chunk: int = TRI_CHUNK) -> bool:
    """Should this pool run the segmented+reordered engine instead of the
    fused mega-kernel? RTF_TPU_SORTED=1/0 forces; unset -> auto.

    Segmented wins when the lax.sort reorder (~9 ms net at 2M rays,
    PERF.md round 3) amortizes: big pools — 1080p camera pools measured
    21.5 vs 9.5 Mrays/s fused — or scenes with many chunk windows,
    especially incoherent probe pools (5.3x coherent-vs-random culling
    gap on the 111k-tri canopy)."""
    flag = os.environ.get("RTF_TPU_SORTED")
    if flag is not None:
        return flag == "1"
    if rays >= (1 << 19):
        return True
    nchunks = tables[0].shape[0] // chunk
    return nchunks >= (8 if incoherent else 32)
