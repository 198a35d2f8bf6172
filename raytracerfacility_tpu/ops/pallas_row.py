"""Row-bundle streaming trace: vector-broadcast triangles, 128-ray bundles.

The measured wall of the scalar-broadcast engines (ops/pallas_brute.py,
ops/pallas_fused.py) is twofold (PERF.md):

* every triangle costs 10-20 *scalar* SMEM loads that serialize against
  the tile's vector math (the kernels run at ~25-40% of VPU peak), and
* the culling bundle is the whole 8192-ray tile: one slab test per
  SUB run against the union frustum of 8192 rays, which goes blind the
  moment bounce directions diverge.

This engine restructures the hot loop so both costs fall out:

* **Triangles ride sublanes.** The packed (N, 12) table is replicated
  on-device into a lane-broadcast layout (``build_row_tables``): for each
  group of 8 triangles, each of the 10 constants (v0, e1, e2, prim id)
  becomes one (8, 128) block — sublane s = triangle s of the group, all
  128 lanes equal. The kernel fetches a whole group's constant with ONE
  aligned vector load from the chunk's VMEM window instead of 8 scalar
  loads, so the Möller-Trumbore math (bit-identical op order to
  pallas_brute._tri_test) streams at vector-load bandwidth. The 128x
  lane replication costs HBM capacity (5 KB/triangle) and window DMA
  (2.6 MB per 512-triangle chunk vs 41 KB) but HBM->VMEM is the fast
  path (~100x the SMEM fill rate measured at 5.3 us / 41 KB), and the
  window is double-buffered behind ~256 us of per-chunk compute.

* **Rays ride lanes, 128 per bundle.** Each (8, 128) op tests 8
  triangles against one 128-ray row. Culling is per ROW: a chunk-level
  slab per row plus a bundle-level slab of 8 group AABBs at once
  (sublane s = group s, again one vector load per bound). A 128-ray
  bundle's frustum is 64x tighter than the 8192-ray tile's, so
  bounce-segment culling keeps biting long after tile-granular tests
  go blind — the TPU-shaped stand-in for the reference's per-thread
  RT-core BVH walk (ref RayTracer.cu:355-366 optixLaunch).

Results are bit-identical to pallas_brute: same accept window, same
Möller-Trumbore operation order, and the same lexicographic
(t, original-prim-id) best-hit rule — the 8 sublane slots each keep an
independent best and a commutative cross-slot reduction picks the
global one per ray. Dead lanes (tmax <= tmin, including the fused
path's -3e38 poison) fall out of every slab test at row granularity.

Triangle-only (curve scenes stay on pallas_brute; the builder gates on
``has_curves``). Front-to-back culled chunk visitation via scalar
prefetch is shared with the other engines (ops/chunk_order.py).
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
from raytracerfacility_tpu.ops.pallas_brute import TRI_CHUNK, _flatten

# rays per kernel tile, in (BLOCK_ROWS, 128) f32 planes
BLOCK_ROWS = int(os.environ.get("RTF_TPU_ROW_ROWS", "64"))
GRP = 8          # triangles per vector-broadcast group (sublane count)
BUNDLE = 8       # groups per bundle-level slab test (one (8,128) op)
NCONST = 10      # v0(3) e1(3) e2(3) original-prim(1)
_LANES = 128
_DET_EPS = 1e-12
_DEAD = -3.0e38
_BIGP = 3.4e38


@functools.partial(jax.jit, static_argnames=())
def build_row_tables(table: jax.Array):
    """Device-side replication of a pack_tri_table (N, 12) table into the
    row engine's lane-broadcast layouts.

    Returns (tri_rep, grp_rep):

    * ``tri_rep`` (N * NCONST, 128): rows [(g*NCONST + c)*8 + s] carry
      constant c of triangle g*8+s, replicated across lanes.
    * ``grp_rep`` (N // GRP // BUNDLE * 48, 128): rows
      [(b*6 + c)*8 + s] carry AABB bound c (lo.xyz, hi.xyz) of group
      b*8+s. Pad rows (zero triangles) get inverted AABBs so bundle
      slabs reject them.

    One XLA broadcast at scene build / trace trace-time — fused, and
    tiny next to a frame (the N*10*128 write is ~20 us/frame at 3k
    triangles on HBM bandwidth).
    """
    n = table.shape[0]
    consts = table[:, :NCONST]  # (N, 10)
    tri_rep = jnp.broadcast_to(
        consts.reshape(n // GRP, GRP, NCONST).transpose(0, 2, 1)
        .reshape(n * NCONST, 1),
        (n * NCONST, _LANES),
    )

    v0 = table[:, 0:3]
    e1 = table[:, 3:6]
    e2 = table[:, 6:9]
    c1 = v0 + e1
    c2 = v0 + e2
    pmin = jnp.minimum(jnp.minimum(v0, c1), c2)
    pmax = jnp.maximum(jnp.maximum(v0, c1), c2)
    # pad rows are all-zero (degenerate); give them inverted AABBs
    degenerate = jnp.all((e1 == 0.0) & (e2 == 0.0), axis=1, keepdims=True)
    pmin = jnp.where(degenerate, _BIGP, pmin)
    pmax = jnp.where(degenerate, -_BIGP, pmax)
    glo = pmin.reshape(n // GRP, GRP, 3).min(axis=1)  # (G, 3)
    ghi = pmax.reshape(n // GRP, GRP, 3).max(axis=1)
    gaabb = jnp.concatenate([glo, ghi], axis=1)  # (G, 6)
    ng = n // GRP
    grp_rep = jnp.broadcast_to(
        gaabb.reshape(ng // BUNDLE, BUNDLE, 6).transpose(0, 2, 1)
        .reshape(ng * 6, 1),
        (ng * 6, _LANES),
    )
    return tri_rep, grp_rep


def _make_kernel(any_hit: bool):
    nbun = TRI_CHUNK // (GRP * BUNDLE)  # bundles per chunk

    def _kernel(order_ref, skip_ref, trip_ref, grp_ref, chunk_ref,
                ox, oy, oz, dx, dy, dz, tmn, tmx,
                t_ref, prim_ref, u_ref, v_ref):
        i = pl.program_id(0)
        step = pl.program_id(1)
        chunk_id = order_ref[i, step]
        do_step = skip_ref[i, step] == 0

        @pl.when(step == 0)
        def _init():
            t_ref[...] = tmx[...]
            prim_ref[...] = jnp.full_like(tmx[...], -1.0)
            u_ref[...] = jnp.zeros_like(tmx[...])
            v_ref[...] = jnp.zeros_like(tmx[...])

        cb = [chunk_ref[chunk_id, k] for k in range(6)]
        si = jax.lax.broadcasted_iota(jnp.int32, (GRP, _LANES), 0)

        @pl.when(do_step)
        def _visit():
            def rowblock(kb, z):
                r0 = kb * 8
                oxb = ox[pl.ds(r0, 8), :]
                oyb = oy[pl.ds(r0, 8), :]
                ozb = oz[pl.ds(r0, 8), :]
                dxb = dx[pl.ds(r0, 8), :]
                dyb = dy[pl.ds(r0, 8), :]
                dzb = dz[pl.ds(r0, 8), :]
                tmnb = tmn[pl.ds(r0, 8), :]
                tb = t_ref[pl.ds(r0, 8), :]
                pb = prim_ref[pl.ds(r0, 8), :]
                ub = u_ref[pl.ds(r0, 8), :]
                vb = v_ref[pl.ds(r0, 8), :]
                t_acc, p_acc, u_acc, v_acc = tb, pb, ub, vb

                for j in range(8):
                    o_x = oxb[j:j + 1, :]  # (1, 128) row slices
                    o_y = oyb[j:j + 1, :]
                    o_z = ozb[j:j + 1, :]
                    d_x = dxb[j:j + 1, :]
                    d_y = dyb[j:j + 1, :]
                    d_z = dzb[j:j + 1, :]
                    tmin_v = tmnb[j:j + 1, :]
                    bt0 = tb[j:j + 1, :]
                    bp0 = pb[j:j + 1, :]
                    bu0 = ub[j:j + 1, :]
                    bv0 = vb[j:j + 1, :]

                    eps = 1e-20
                    ivx = 1.0 / jnp.where(jnp.abs(d_x) < eps,
                                          jnp.where(d_x < 0, -eps, eps), d_x)
                    ivy = 1.0 / jnp.where(jnp.abs(d_y) < eps,
                                          jnp.where(d_y < 0, -eps, eps), d_y)
                    ivz = 1.0 / jnp.where(jnp.abs(d_z) < eps,
                                          jnp.where(d_z < 0, -eps, eps), d_z)

                    def slab(bx0, by0, bz0, bx1, by1, bz1, best):
                        t1x = (bx0 - o_x) * ivx
                        t2x = (bx1 - o_x) * ivx
                        t1y = (by0 - o_y) * ivy
                        t2y = (by1 - o_y) * ivy
                        t1z = (bz0 - o_z) * ivz
                        t2z = (bz1 - o_z) * ivz
                        near = jnp.maximum(
                            jnp.maximum(jnp.minimum(t1x, t2x),
                                        jnp.minimum(t1y, t2y)),
                            jnp.minimum(t1z, t2z))
                        far = jnp.minimum(
                            jnp.minimum(jnp.maximum(t1x, t2x),
                                        jnp.maximum(t1y, t2y)),
                            jnp.maximum(t1z, t2z))
                        # <= so exact-tie candidates on run boundaries are
                        # still visited (same rule as pallas_brute)
                        return (near <= far) & (far > tmin_v) & (near <= best)

                    def group_body(g, carry):
                        bt, bp, bu, bv = carry
                        base = g * (NCONST * GRP)

                        def c(k):
                            return trip_ref[pl.ds(base + k * GRP, GRP), :]

                        v0x, v0y, v0z = c(0), c(1), c(2)
                        e1x, e1y, e1z = c(3), c(4), c(5)
                        e2x, e2y, e2z = c(6), c(7), c(8)
                        # Moller-Trumbore, op-for-op the order of
                        # pallas_brute._tri_test (bit-identical accepts)
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
                        jf = c(9)
                        ok = (
                            ok_det & (u >= 0.0) & (v >= 0.0)
                            & (u + v <= 1.0) & (t > tmin_v)
                            & ((t < bt) | ((t == bt) & (jf < bp)))
                        )
                        if any_hit:
                            # first-hit exit: poison the slot's best-t so
                            # every later slab culls it (only the hit
                            # boolean is meaningful for occlusion queries)
                            return (
                                jnp.where(ok, _DEAD, bt),
                                jnp.where(ok, jf, bp),
                                bu,
                                bv,
                            )
                        return (
                            jnp.where(ok, t, bt),
                            jnp.where(ok, jf, bp),
                            jnp.where(ok, u, bu),
                            jnp.where(ok, v, bv),
                        )

                    def bundle_body(b, carry):
                        base = b * (6 * BUNDLE)

                        def gb(k):
                            return grp_ref[pl.ds(base + k * BUNDLE, BUNDLE), :]

                        rowbest = jnp.min(carry[0], axis=0, keepdims=True)
                        enter = slab(gb(0), gb(1), gb(2), gb(3), gb(4), gb(5),
                                     rowbest)

                        def run(c2):
                            return jax.lax.fori_loop(
                                b * BUNDLE, b * BUNDLE + BUNDLE,
                                group_body, c2)

                        return jax.lax.cond(jnp.any(enter), run,
                                            lambda c2: c2, carry)

                    enter_row = slab(cb[0], cb[1], cb[2], cb[3], cb[4], cb[5],
                                     bt0)
                    carry = (jnp.broadcast_to(bt0, (GRP, _LANES)),
                             jnp.broadcast_to(bp0, (GRP, _LANES)),
                             jnp.broadcast_to(bu0, (GRP, _LANES)),
                             jnp.broadcast_to(bv0, (GRP, _LANES)))

                    def run_chunk(c2):
                        return jax.lax.fori_loop(0, nbun, bundle_body, c2)

                    bt, bp, bu, bv = jax.lax.cond(
                        jnp.any(enter_row), run_chunk, lambda c2: c2, carry)

                    # cross-slot lexicographic (t, prim) reduction: each
                    # slot improved independently from the shared baseline,
                    # so the reduce is the global best including baseline
                    rt = jnp.min(bt, axis=0, keepdims=True)
                    is_t = bt == rt
                    rp = jnp.min(jnp.where(is_t, bp, _BIGP), axis=0,
                                 keepdims=True)
                    sel = is_t & (bp == rp)
                    smin = jnp.min(jnp.where(sel, si, GRP), axis=0,
                                   keepdims=True)
                    sel2 = sel & (si == smin)
                    ru = jnp.sum(jnp.where(sel2, bu, 0.0), axis=0,
                                 keepdims=True)
                    rv = jnp.sum(jnp.where(sel2, bv, 0.0), axis=0,
                                 keepdims=True)
                    t_acc = jnp.where(si == j, rt, t_acc)
                    p_acc = jnp.where(si == j, rp, p_acc)
                    u_acc = jnp.where(si == j, ru, u_acc)
                    v_acc = jnp.where(si == j, rv, v_acc)

                t_ref[pl.ds(r0, 8), :] = t_acc
                prim_ref[pl.ds(r0, 8), :] = p_acc
                u_ref[pl.ds(r0, 8), :] = u_acc
                v_ref[pl.ds(r0, 8), :] = v_acc
                return z

            jax.lax.fori_loop(0, BLOCK_ROWS // 8, rowblock, 0)

    return _kernel


_kernel_closest = _make_kernel(any_hit=False)
_kernel_any = _make_kernel(any_hit=True)


@functools.partial(jax.jit, static_argnames=("interpret", "any_hit"))
def _trace(tri_table, chunk_aabbs, origin, direction, tmin, tmax,
           interpret=False, any_hit=False):
    tri_rep, grp_rep = build_row_tables(tri_table)
    num_tris = tri_table.shape[0]
    r = origin.shape[0]
    block = BLOCK_ROWS * _LANES
    pad = (-r) % block
    if pad:
        origin = jnp.concatenate(
            [origin, jnp.zeros((pad, 3), jnp.float32)], axis=0)
        direction = jnp.concatenate(
            [direction, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32),
                                 (pad, 1))], axis=0)
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
    nchunks = num_tris // TRI_CHUNK
    grid = (rows // BLOCK_ROWS, nchunks)
    order, skip = chunk_order(
        ray_ins[0], ray_ins[1], ray_ins[2], ray_ins[3], ray_ins[4],
        ray_ins[5], ray_ins[7] > ray_ins[6], chunk_aabbs[:nchunks],
        BLOCK_ROWS)
    ray_spec = pl.BlockSpec((BLOCK_ROWS, _LANES), lambda i, c, o, s: (i, 0))
    trip_spec = pl.BlockSpec((TRI_CHUNK * NCONST, _LANES),
                             lambda i, c, o, s: (o[i, c], 0))
    grp_spec = pl.BlockSpec((TRI_CHUNK // GRP * 6, _LANES),
                            lambda i, c, o, s: (o[i, c], 0))
    chunk_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shape = jax.ShapeDtypeStruct((rows, _LANES), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[trip_spec, grp_spec, chunk_spec] + [ray_spec] * 8,
        out_specs=[ray_spec] * 4,
    )
    t, prim, u, v = pl.pallas_call(
        _kernel_any if any_hit else _kernel_closest,
        grid_spec=grid_spec,
        out_shape=(out_shape,) * 4,
        interpret=interpret,
    )(order, skip, tri_rep, grp_rep, chunk_aabbs, *ray_ins)

    def unplane(x):
        return x.reshape(rp)[:r]

    return unplane(t), unplane(prim), unplane(u), unplane(v)


def trace_closest_row(tri_table, origin, direction, tmin, tmax,
                      interpret=None) -> TraceResult:
    """Drop-in for pallas_brute.trace_closest_pallas (triangle-only
    scenes). ``tri_table`` is the same (table, sub_aabbs, chunk_aabbs)
    triple from pack_tri_table; sub_aabbs is unused here (culling is
    bundle-granular instead)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    batch, origin, direction, tmin_f, tmax_f = _flatten(
        origin, direction, tmin, tmax)
    table, _, chunk_aabbs = tri_table
    t, prim, u, v = _trace(table, chunk_aabbs, origin, direction,
                           tmin_f, tmax_f, interpret=interpret)
    prim_i = prim.astype(jnp.int32)
    return TraceResult(
        t=t.reshape(batch),
        prim=prim_i.reshape(batch),
        u=u.reshape(batch),
        v=v.reshape(batch),
        hit=(prim_i >= 0).reshape(batch),
    )


def trace_any_row(tri_table, origin, direction, tmin, tmax,
                  interpret=None) -> jax.Array:
    """Occlusion query with per-slot first-hit poisoning (same accept
    window as closest-hit; only the boolean is meaningful)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    batch, origin, direction, tmin_f, tmax_f = _flatten(
        origin, direction, tmin, tmax)
    table, _, chunk_aabbs = tri_table
    _, prim, _, _ = _trace(table, chunk_aabbs, origin, direction,
                           tmin_f, tmax_f, interpret=interpret, any_hit=True)
    return (prim.astype(jnp.int32) >= 0).reshape(batch)
