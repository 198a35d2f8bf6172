"""Per-tile chunk visitation order for the streaming trace kernels.

Both streaming engines (ops/pallas_brute.py, ops/pallas_seg.py) walk the
Morton-packed triangle table in TRI_CHUNK windows on a grid axis, with a
tile-granular level-1 AABB slab test inside the kernel. That in-kernel
test still pays the window's HBM->SMEM DMA (measured 5.3 us per 41 KB
fill on the v5e — the dominant per-step floor on many-chunk scenes) and
a grid step (~2.1 us) for every chunk, hit or not.

This module computes, XLA-side per segment, a per-tile (order, skip)
pair consumed through scalar prefetch:

* ``order[t, c]`` — the chunk to visit at step ``c`` of tile ``t``.
  Chunks that MAY be hit by some live ray of the tile come first,
  sorted by a lower bound on their slab entry distance (front-to-back:
  early near hits shrink best-t, and the kernel's per-ray
  ``near <= best_t`` slab term then culls most of the far scene — the
  occlusion win an RT core gets from near-to-far BVH order).
* Steps for chunks PROVABLY missed by every live ray repeat the last
  accepted chunk's index — Pallas elides the repeated window's DMA —
  and carry ``skip[t, c] == 1`` so the kernel's trace body never runs
  for them. (Re-visiting a chunk would be harmless anyway: the best-hit
  update is idempotent.)

Results are bit-identical under any visit order: the best-hit record is
a lexicographic (t, original-prim-id) min — commutative across visit
order — and the in-kernel per-ray slab test still guards every visited
chunk. This is the TPU-idiomatic stand-in for the front-to-back BVH
traversal order the reference gets from OptiX RT cores
(ref RayTracer.cu:355-366 optixLaunch -> hardware IAS/GAS walk).

The cull proof is interval arithmetic over the tile's live-ray bundle:
per-axis origin range [olo, ohi] and direction range [dlo, dhi]. For
each chunk, the slab times t1 = (lo - o) * (1/d) and t2 = (hi - o) *
(1/d) are bounded by the four endpoint products; per-ray
near = max_axis min(t1, t2) is then >= near_lb = max_axis min(t1_lb,
t2_lb) and far = min_axis max(t1, t2) <= far_ub = min_axis max(t1_ub,
t2_ub), so (near_lb <= far_ub) & (far_ub > 0) is implied by ANY ray
hitting the slab — rejecting its negation is safe. An axis whose
direction range straddles zero contributes no constraint (it costs only
looseness, never correctness). Pad chunks (inverted AABBs over
zero-filled rows no ray can hit) are always rejected. Cost:
(tiles, nchunks) interval math + one argsort — micro-work next to the
trace.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def _bundle_ranges(ox, oy, oz, dx, dy, dz, act, tiles):
    """Per-tile live-ray bundle intervals: origin box, inverse-direction
    interval, and the sign-straddle mask (see module docstring)."""
    big = jnp.float32(3.4e38)
    w = act.reshape(tiles, -1)

    def rng_of(p):
        v = p.reshape(tiles, -1)
        return (jnp.min(jnp.where(w, v, big), axis=1),
                jnp.max(jnp.where(w, v, -big), axis=1))

    o_lo = jnp.stack([rng_of(p)[0] for p in (ox, oy, oz)], -1)  # (T,3)
    o_hi = jnp.stack([rng_of(p)[1] for p in (ox, oy, oz)], -1)
    d_lo = jnp.stack([rng_of(p)[0] for p in (dx, dy, dz)], -1)
    d_hi = jnp.stack([rng_of(p)[1] for p in (dx, dy, dz)], -1)

    # inverse-direction interval; a sign-straddling axis is unbounded
    straddle = (d_lo <= 0.0) & (d_hi >= 0.0)
    i_a = 1.0 / jnp.where(straddle, 1.0, d_lo)
    i_b = 1.0 / jnp.where(straddle, 1.0, d_hi)
    inv_lo = jnp.minimum(i_a, i_b)[:, None]   # (T,1,3)
    inv_hi = jnp.maximum(i_a, i_b)[:, None]
    return w, o_lo, o_hi, inv_lo, inv_hi, straddle[:, None]


def _bundle_slab(o_lo, o_hi, inv_lo, inv_hi, str_b, aabbs):
    """(near_lb, far_ub, pad) of the bundle against each AABB row —
    conservative: any live ray hitting the slab implies
    near_lb <= far_ub and far_ub > 0."""
    big = jnp.float32(3.4e38)
    lo = aabbs[None, :, 0:3]  # (1, C, 3)
    hi = aabbs[None, :, 3:6]

    def prod_iv(a_lo, a_hi):
        cands = (a_lo * inv_lo, a_lo * inv_hi, a_hi * inv_lo, a_hi * inv_hi)
        return (jnp.minimum(jnp.minimum(cands[0], cands[1]),
                            jnp.minimum(cands[2], cands[3])),
                jnp.maximum(jnp.maximum(cands[0], cands[1]),
                            jnp.maximum(cands[2], cands[3])))

    t1_lb, t1_ub = prod_iv(lo - o_hi[:, None], lo - o_lo[:, None])
    t2_lb, t2_ub = prod_iv(hi - o_hi[:, None], hi - o_lo[:, None])
    tmin_lb = jnp.where(str_b, -big, jnp.minimum(t1_lb, t2_lb))
    tmax_ub = jnp.where(str_b, big, jnp.maximum(t1_ub, t2_ub))
    near_lb = jnp.max(tmin_lb, axis=-1)  # (T, C)
    far_ub = jnp.min(tmax_ub, axis=-1)
    pad = (aabbs[:, 0] > aabbs[:, 3])[None]  # inverted AABB
    return near_lb, far_ub, pad


def sub_run_bits(ox, oy, oz, dx, dy, dz, act, sub_aabbs, block_rows,
                 nchunks: int):
    """Per-(tile, chunk) int32 bitmask of sub-runs the tile's live-ray
    bundle MAY hit (bit j = sub-run j of that chunk). The kernel gates
    each sub-run's vector slab test on its scalar bit, so provably-
    missed runs skip the ~30-op slab + cross-lane any-reduce entirely.
    Conservative-only (no best-t occlusion term — the in-kernel slab
    still guards every passing run), so any bit pattern that is a
    superset of the truly-hittable runs is bit-identically correct.
    Requires sub-runs-per-chunk <= 32 (caller guards)."""
    tiles = ox.shape[0] // block_rows
    nsub = sub_aabbs.shape[0] // nchunks
    w, o_lo, o_hi, inv_lo, inv_hi, str_b = _bundle_ranges(
        ox, oy, oz, dx, dy, dz, act, tiles)
    near_lb, far_ub, padm = _bundle_slab(o_lo, o_hi, inv_lo, inv_hi,
                                         str_b, sub_aabbs)
    has_live = jnp.any(w, axis=1)[:, None]
    acc = (near_lb <= far_ub) & (far_ub > 0.0) & ~padm & has_live
    acc = acc.reshape(tiles, nchunks, nsub)
    weights = (jnp.uint32(1) << jnp.arange(nsub, dtype=jnp.uint32))
    bits = jnp.sum(jnp.where(acc, weights[None, None], jnp.uint32(0)),
                   axis=-1, dtype=jnp.uint32)
    return jax.lax.bitcast_convert_type(bits, jnp.int32)


def sub_run_interval(ox, oy, oz, dx, dy, dz, act, sub_aabbs, block_rows,
                     nchunks: int):
    """Per-(tile, chunk) [lo, hi) sub-run visitation bounds: the hull of
    the sub-runs the tile's live-ray bundle MAY hit (same conservative
    interval slab test as :func:`sub_run_bits`). The kernel runs its
    per-chunk sub loop as ``fori_loop(lo, hi)`` — provably-missed runs
    OUTSIDE the hull cost nothing at all (no slab, no any-reduce, no
    cond), and because Morton packing lays sub-runs out spatially, the
    hull of hittable runs is usually tight. Conservative-only (no best-t
    term; the in-kernel per-sub slab still guards every visited run), so
    any [lo, hi) superset of the truly-hittable runs is bit-identically
    correct; chunks with no hittable run get lo == hi == 0 (empty loop).
    No sub-run-count cap (unlike the int32 bitmask of sub_run_bits).

    Returns a (2, tiles, nchunks) int32: ``[0]`` = lo, ``[1]`` = hi."""
    tiles = ox.shape[0] // block_rows
    nsub = sub_aabbs.shape[0] // nchunks
    w, o_lo, o_hi, inv_lo, inv_hi, str_b = _bundle_ranges(
        ox, oy, oz, dx, dy, dz, act, tiles)
    near_lb, far_ub, padm = _bundle_slab(o_lo, o_hi, inv_lo, inv_hi,
                                         str_b, sub_aabbs)
    has_live = jnp.any(w, axis=1)[:, None]
    acc = (near_lb <= far_ub) & (far_ub > 0.0) & ~padm & has_live
    acc = acc.reshape(tiles, nchunks, nsub)
    any_acc = jnp.any(acc, axis=-1)
    first = jnp.argmax(acc, axis=-1).astype(jnp.int32)
    last = (nsub - 1 - jnp.argmax(acc[..., ::-1], axis=-1)).astype(jnp.int32)
    lo = jnp.where(any_acc, first, 0)
    hi = jnp.where(any_acc, last + 1, 0)
    return jnp.stack([lo, hi])


def chunk_order(ox, oy, oz, dx, dy, dz, act, chunk_aabbs, block_rows):
    """(order, skip), both (tiles, nchunks) int32.

    ``ox..dz`` are (rows, 128) ray planes, ``act`` a boolean plane of
    live lanes (dead lanes are excluded from the bundle intervals; an
    all-dead tile skips every chunk), ``chunk_aabbs`` the (C, >=6) chunk
    AABB table. Pad chunks (inverted AABBs) may be included: they are
    never accepted, so ``order`` never emits a pad index at a non-skipped
    step — when no chunk is accepted the repeated index degenerates to
    ``argsort(all-inf)[0] == 0``, a real chunk. Callers whose grid is
    shorter than C simply read the first grid-extent columns.
    """
    tiles = ox.shape[0] // block_rows
    nchunks = chunk_aabbs.shape[0]

    w, o_lo, o_hi, inv_lo, inv_hi, str_b = _bundle_ranges(
        ox, oy, oz, dx, dy, dz, act, tiles)
    near_lb, far_ub, pad = _bundle_slab(o_lo, o_hi, inv_lo, inv_hi,
                                        str_b, chunk_aabbs)
    has_live = jnp.any(w, axis=1)[:, None]  # all-dead tiles skip everything
    accepted = (near_lb <= far_ub) & (far_ub > 0.0) & ~pad & has_live

    key = jnp.where(accepted, jnp.maximum(near_lb, 0.0), jnp.inf)
    sidx = jnp.argsort(key, axis=1).astype(jnp.int32)  # (T, C)
    if os.environ.get("RTF_TPU_SEG_CULL", "1") != "1":
        return sidx, jnp.zeros_like(sidx)  # f2b only, no culled steps
    count = jnp.sum(accepted, axis=1).astype(jnp.int32)  # (T,)
    last = jnp.take_along_axis(
        sidx, jnp.maximum(count - 1, 0)[:, None], axis=1)  # (T, 1)
    pos = jnp.arange(nchunks, dtype=jnp.int32)[None]
    culled = pos >= count[:, None]
    return (jnp.where(culled, last, sidx),
            culled.astype(jnp.int32))
