"""Shared-geometry instanced trace: object-space tables + per-step
inverse-transformed rays — the TPU-native analog of the reference's
two-level IAS/GAS acceleration with BLAS sharing.

The reference stores ONE GAS per geometry and N lightweight instance
records carrying a 3x4 transform (ref RayTracer.cu:1618-1715, instance
array :1663-1670); OptiX's IAS walk transforms each ray into instance
space and traverses the shared BLAS. The denormalized engines here
(ops/pallas_fused.py, ops/pallas_seg.py) instead bake every instance's
triangles into one world-space table — O(instances x triangles) HBM
(~80 B/tri), which caps heavy-instancing scenes (a 1,000-instance x
1M-tri forest is 80 GB there; it fits the reference).

This module removes that memory ceiling the TPU way:

* ONE object-space triangle table per unique geometry (Morton-ordered
  within the geometry, padded to chunk multiples), concatenated —
  O(unique triangles) HBM regardless of instance count.
* A per-instance SMEM record: the 3x4 INVERSE transform (world->object)
  — 16 floats, the analog of the reference's OptixInstance record.
* The visit-step axis enumerates (instance, object-chunk) pairs. The
  per-tile front-to-back culled order (ops/chunk_order.py, shared with
  the other engines) runs over per-step WORLD AABBs (the object chunk
  AABB's corners pushed through the instance transform, XLA-side), so
  step visitation culls and orders across instances exactly like chunks.
* In-kernel, each step transforms the ray block into the instance's
  object space — o' = A.o + c, d' = A.d with A = M^-1 UNNORMALIZED, so
  the t parameterization is preserved under any affine instance
  transform and best-t/occlusion compares stay valid in either space —
  then runs the standard two-level (chunk/sub) object-space slab culling
  and the Moller-Trumbore row loop from the shared window.

A TPU-specific bonus falls out of the window index map: steps of
DIFFERENT instances that visit the SAME object chunk land on the same
HBM->SMEM window, and Pallas elides the repeated DMA — the shared-BLAS
cache behavior of an RT core, for free.

Tie rule: lexicographic (t, instance id, original-prim id) — the exact
analog of the denormalized engines' lowest-original-world-index rule
under instance-major concatenation, and what keeps results visit-order
independent (the invariant all the culling relies on).

Scaling note (measured in PERF.md round 5): the visit-step grid is
O(instances x chunks-per-geometry) per tile; provably-missed steps cost
a ~2.1 us grid step each, so very large instance counts want few, large
object chunks. The MEMORY ceiling — the reference-parity gap this
module closes — is gone: HBM holds unique geometry only.

SMEM discipline (the v5e has ~1 MB of SMEM, scalar-prefetch operands
live there whole, and SMEM rows pad to 128 lanes / 512 B): the per-tile
visit order is dispatched in fixed (TILE_BATCH x W_STEPS) windows — two
i32 order tables per call, 256 KB at the defaults. The instance records
and object-chunk AABBs are fully SMEM-resident but DENSELY PACKED into
128-f32 rows (8 records / 16 AABBs per row; Mosaic rejects sub-(8, 128)
blocked windows, so per-step (1, 16)/(1, 8) windows only legalize in
interpret mode, and unpacked (I, 16) layouts burn 512 B per record) —
~80 KB at 1k instances, bounded by the 8192-instance pack limit. The
chunk table window is SMEM's largest tenant at 512 B/row x 2 buffering
levels, which caps chunk at 512. Tiles whose visit count exceeds one
window CONTINUE across passes: the best-hit planes chain through carry
inputs, bit-identically (tests/test_instanced.py multipass test).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracerfacility_tpu.ops.chunk_order import chunk_order
from raytracerfacility_tpu.ops.intersect import TraceResult

_LANES = 128
_DET_EPS = 1e-12
_COLS = 12  # v0(3) e1(3) e2(3) original-prim(1) pad(2)

BLOCK_ROWS = 64
TRI_CHUNK = 256
SUB = 32


def _inverse_3x4(m):
    """f32 3x4 inverse of a 4x4 affine instance matrix (numpy, host)."""
    m = np.asarray(m, np.float64)
    a = np.linalg.inv(m[:3, :3])
    c = -a @ m[:3, 3]
    out = np.zeros((3, 4), np.float32)
    out[:, :3] = a.astype(np.float32)
    out[:, 3] = c.astype(np.float32)
    return out


def pack_instanced_tables(geoms, instance_geom, instance_matrices,
                          chunk: int = TRI_CHUNK, sub: int = SUB):
    """Build the shared-geometry tables.

    ``geoms``: list of (v0, e1, e2) object-space triangle arrays, one
    per unique geometry. ``instance_geom``: (I,) geometry index per
    instance. ``instance_matrices``: (I, 4, 4) object->world transforms.

    Returns a dict of arrays:
      table        (N, 12)  shared object-space triangle table (SMEM
                            windows; col 9 = geometry-base + original
                            pre-Morton prim index, exact as f32)
      sub_aabbs    (N/sub, 8)   object-space sub-run AABBs
      obj_chunks   (C8, 8)      object-space chunk AABBs (per-step
                                (1, 8) SMEM window)
      inst         (I, 16)      per-instance world->object 3x4 (rows
                                0..8 = A, 9..11 = c), rest zero
      step_chunk   (S,) i32     object chunk row of each visit step
      step_inst    (S,) i32     instance id of each visit step
      step_aabbs   (S8, 8)      WORLD AABB of each step (chunk_order)
    """
    if chunk % sub != 0 or (chunk // sub) % 8 != 0:
        raise ValueError(
            f"chunk={chunk} must be a multiple of sub={sub} with "
            f"chunk//sub a multiple of 8 (TPU sub-AABB window shape)")
    n_inst = int(np.asarray(instance_geom).shape[0])
    if n_inst > 8192:
        # the (I, 16) instance-record table is fully SMEM-resident in
        # the trace kernel (see _trace_instanced) — 8192 records =
        # 512 KB of the ~1 MB core budget
        raise ValueError(
            f"{n_inst} instance records exceed the SMEM-resident bound "
            "(8192); split the scene into multiple instanced groups")
    from raytracerfacility_tpu.ops.bvh import morton_codes

    big = 3.4e38
    tables, pmins, pmaxs = [], [], []
    geom_chunk0 = []  # first chunk row of each geometry
    geom_nchunks = []
    base = 0  # global original-prim base of the geometry
    rows = 0
    for (v0, e1, e2) in geoms:
        v0 = jnp.asarray(v0, jnp.float32)
        e1 = jnp.asarray(e1, jnp.float32)
        e2 = jnp.asarray(e2, jnp.float32)
        n = v0.shape[0]
        centroid = v0 + (e1 + e2) / 3.0
        lo = jnp.min(centroid, axis=0)
        hi = jnp.max(centroid, axis=0)
        order = jnp.argsort(morton_codes(centroid, lo, hi))
        v0o, e1o, e2o = v0[order], e1[order], e2[order]
        pad = (-n) % chunk
        t = jnp.zeros((n + pad, _COLS), jnp.float32)
        t = t.at[:n, 0:3].set(v0o)
        t = t.at[:n, 3:6].set(e1o)
        t = t.at[:n, 6:9].set(e2o)
        t = t.at[:n, 9].set(order.astype(jnp.float32) + float(base))
        pmin = jnp.minimum(v0o, jnp.minimum(v0o + e1o, v0o + e2o))
        pmax = jnp.maximum(v0o, jnp.maximum(v0o + e1o, v0o + e2o))
        pmin = jnp.concatenate(
            [pmin, jnp.full((pad, 3), big, jnp.float32)], axis=0)
        pmax = jnp.concatenate(
            [pmax, jnp.full((pad, 3), -big, jnp.float32)], axis=0)
        tables.append(t)
        pmins.append(pmin)
        pmaxs.append(pmax)
        geom_chunk0.append(rows // chunk)
        geom_nchunks.append((n + pad) // chunk)
        base += n
        rows += n + pad

    table = jnp.concatenate(tables, axis=0)
    pmin = jnp.concatenate(pmins, axis=0)
    pmax = jnp.concatenate(pmaxs, axis=0)
    nsub = rows // sub
    sub_aabbs = jnp.zeros((nsub, 8), jnp.float32)
    sub_aabbs = sub_aabbs.at[:, 0:3].set(
        jnp.min(pmin.reshape(nsub, sub, 3), axis=1))
    sub_aabbs = sub_aabbs.at[:, 3:6].set(
        jnp.max(pmax.reshape(nsub, sub, 3), axis=1))
    nchunks = rows // chunk
    clo = jnp.min(pmin.reshape(nchunks, chunk, 3), axis=1)
    chi = jnp.max(pmax.reshape(nchunks, chunk, 3), axis=1)
    cpad = (-nchunks) % 8
    obj_chunks = jnp.zeros((nchunks + cpad, 8), jnp.float32)
    obj_chunks = obj_chunks.at[:, 0:3].set(big).at[:, 3:6].set(-big)
    obj_chunks = obj_chunks.at[:nchunks, 0:3].set(clo)
    obj_chunks = obj_chunks.at[:nchunks, 3:6].set(chi)

    instance_geom = np.asarray(instance_geom, np.int32)
    n_inst = instance_geom.shape[0]
    inst = np.zeros((n_inst, 16), np.float32)
    mats = [np.asarray(m, np.float32).reshape(4, 4)
            for m in instance_matrices]
    for i, m in enumerate(mats):
        inv = _inverse_3x4(m)
        inst[i, 0:9] = inv[:, :3].reshape(9)
        inst[i, 9:12] = inv[:, 3]

    # visit steps: instance-major (instance, object chunk) pairs, with
    # the step's WORLD AABB = the object chunk AABB's 8 corners pushed
    # through the instance's forward transform (affine => corner hull is
    # a valid conservative world box)
    clo_np = np.asarray(clo)
    chi_np = np.asarray(chi)
    step_chunk, step_inst, slo, shi = [], [], [], []
    for i in range(n_inst):
        g = int(instance_geom[i])
        c0, nc = geom_chunk0[g], geom_nchunks[g]
        m = mats[i]
        a, t3 = m[:3, :3], m[:3, 3]
        lo_g = clo_np[c0:c0 + nc]
        hi_g = chi_np[c0:c0 + nc]
        # corner hull via per-axis split: w_lo/hi = t + sum_j min/max of
        # (a[:, j] * lo_j, a[:, j] * hi_j)
        w_lo = np.full((nc, 3), 0.0, np.float32)
        w_hi = np.full((nc, 3), 0.0, np.float32)
        for j in range(3):
            pj = a[:, j][None] * lo_g[:, j:j + 1]
            qj = a[:, j][None] * hi_g[:, j:j + 1]
            w_lo += np.minimum(pj, qj)
            w_hi += np.maximum(pj, qj)
        step_chunk.append(np.arange(c0, c0 + nc, dtype=np.int32))
        step_inst.append(np.full(nc, i, np.int32))
        slo.append(w_lo + t3[None])
        shi.append(w_hi + t3[None])
    step_chunk = np.concatenate(step_chunk)
    step_inst = np.concatenate(step_inst)
    slo = np.concatenate(slo)
    shi = np.concatenate(shi)
    s = step_chunk.shape[0]
    spad = (-s) % 8
    step_aabbs = np.zeros((s + spad, 8), np.float32)
    step_aabbs[:, 0:3] = big
    step_aabbs[:, 3:6] = -big
    step_aabbs[:s, 0:3] = slo
    step_aabbs[:s, 3:6] = shi

    return {
        "table": table,
        "sub_aabbs": sub_aabbs,
        "obj_chunks": obj_chunks,
        "inst": jnp.asarray(inst),
        "step_chunk": jnp.asarray(step_chunk),
        "step_inst": jnp.asarray(step_inst),
        "step_aabbs": jnp.asarray(step_aabbs),
        "chunk": chunk,
        "sub": sub,
    }


def _make_inst_kernel(unroll: int, chunk: int, sub: int):
    def _kernel(oc_ref, oi_ref, cnt_ref,
                tris_ref, sub_ref, ochunk_ref, inst_ref,
                ox, oy, oz, dx, dy, dz, tmn, tmx,
                t_in, p_in, i_in, u_in, v_in,
                t_ref, prim_ref, iid_ref, u_ref, v_ref):
        i = pl.program_id(0)
        step = pl.program_id(1)
        do_step = step < cnt_ref[i]
        tmin_v = tmn[...]

        # pass-carry init: the first step copies the incoming best-hit
        # planes (tmax / -1 on the first pass; the previous pass's
        # outputs on continuation passes — see the multi-pass dispatch)
        @pl.when(step == 0)
        def _init():
            t_ref[...] = t_in[...]
            prim_ref[...] = p_in[...]
            iid_ref[...] = i_in[...]
            u_ref[...] = u_in[...]
            v_ref[...] = v_in[...]

        # world->object: o' = A.o + c, d' = A.d. The instance record and
        # the object-chunk AABB live as FULL SMEM-resident arrays indexed
        # by the step's dynamic row (the seg engine's chunk-AABB pattern:
        # Mosaic rejects sub-(8,128) blocked windows, so (1,16)/(1,8)
        # windows only legalize in interpret mode). SMEM cost is
        # O(instances + object chunks) — 80 KB at 1k instances/512
        # chunks; pack_instanced_tables enforces the ~8k-instance bound.
        # Scalar broadcasts; evaluation order matches the XLA oracle in
        # tests/test_instanced.py term for term.
        # SMEM rows pad to 128 lanes (512 B), so the resident tables are
        # DENSELY PACKED: 8 instance records (16 f32 each) or 16 chunk
        # AABBs (8 f32 each) per 128-wide row — measured 1.52 M SMEM at
        # (I, 16)/(C, 8) layouts vs ~860 K packed (1024 x 262144 bench)
        ii = oi_ref[i, step]
        ci = oc_ref[i, step]
        ir, ib = ii >> 3, (ii & 7) << 4

        def irec(k):
            return inst_ref[ir, ib + k]

        a00, a01, a02 = irec(0), irec(1), irec(2)
        a10, a11, a12 = irec(3), irec(4), irec(5)
        a20, a21, a22 = irec(6), irec(7), irec(8)
        c0, c1, c2 = irec(9), irec(10), irec(11)
        wox, woy, woz = ox[...], oy[...], oz[...]
        wdx, wdy, wdz = dx[...], dy[...], dz[...]
        o_x = a00 * wox + a01 * woy + a02 * woz + c0
        o_y = a10 * wox + a11 * woy + a12 * woz + c1
        o_z = a20 * wox + a21 * woy + a22 * woz + c2
        d_x = a00 * wdx + a01 * wdy + a02 * wdz
        d_y = a10 * wdx + a11 * wdy + a12 * wdz
        d_z = a20 * wdx + a21 * wdy + a22 * wdz
        iid_f = oi_ref[i, step].astype(jnp.float32)

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
            return (near <= far) & (far > tmin_v) & (near <= best_t)

        def tri_body(j, carry):
            best_t, best_prim, best_iid, best_u, best_v = carry

            def col(c):
                return tris_ref[j, c]

            v0x, v0y, v0z = col(0), col(1), col(2)
            e1x, e1y, e1z = col(3), col(4), col(5)
            e2x, e2y, e2z = col(6), col(7), col(8)
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
            jf = col(9)
            # lexicographic (t, instance, original prim) min: the
            # instance-major analog of the denormalized engines' lowest
            # original WORLD index rule (visit-order independent)
            ok = (
                ok_det & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                & (t > tmin_v)
                & ((t < best_t)
                   | ((t == best_t)
                      & ((iid_f < best_iid)
                         | ((iid_f == best_iid) & (jf < best_prim)))))
            )
            return (
                jnp.where(ok, t, best_t),
                jnp.where(ok, jf, best_prim),
                jnp.where(ok, iid_f, best_iid),
                jnp.where(ok, u, best_u),
                jnp.where(ok, v, best_v),
            )

        def sub_body(si, carry):
            enter = slab(sub_ref[si, 0], sub_ref[si, 1], sub_ref[si, 2],
                         sub_ref[si, 3], sub_ref[si, 4], sub_ref[si, 5],
                         carry[0])

            def run(c):
                return jax.lax.fori_loop(
                    0, sub, lambda k, cc2: tri_body(si * sub + k, cc2), c,
                    unroll=unroll)

            return jax.lax.cond(jnp.any(enter), run, lambda c: c, carry)

        carry = (t_ref[...], prim_ref[...], iid_ref[...],
                 u_ref[...], v_ref[...])
        entered = slab(
            ochunk_ref[ci >> 4, ((ci & 15) << 3) + 0],
            ochunk_ref[ci >> 4, ((ci & 15) << 3) + 1],
            ochunk_ref[ci >> 4, ((ci & 15) << 3) + 2],
            ochunk_ref[ci >> 4, ((ci & 15) << 3) + 3],
            ochunk_ref[ci >> 4, ((ci & 15) << 3) + 4],
            ochunk_ref[ci >> 4, ((ci & 15) << 3) + 5],
            carry[0])

        def run_chunk(c):
            return jax.lax.fori_loop(0, chunk // sub, sub_body, c)

        best = jax.lax.cond(do_step & jnp.any(entered), run_chunk,
                            lambda c: c, carry)
        t_ref[...] = best[0]
        prim_ref[...] = best[1]
        iid_ref[...] = best[2]
        u_ref[...] = best[3]
        v_ref[...] = best[4]

    return _kernel


def _pad_rays(origin, direction, tmin, tmax):
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

    return (
        plane(origin[:, 0]), plane(origin[:, 1]), plane(origin[:, 2]),
        plane(direction[:, 0]), plane(direction[:, 1]),
        plane(direction[:, 2]), plane(tmin), plane(tmax),
    )


@jax.jit
def _step_order(ray_ins, step_aabbs, step_chunk, step_inst):
    """Per-tile front-to-back culled STEP order over the world step
    AABBs — culling and near-to-far ordering across instances and
    chunks at once (a provably-missed step repeats the previous step's
    object window, and same-chunk steps of different instances share
    windows: both elide the HBM->SMEM DMA). Accepted steps are compacted
    to the order's FRONT (chunk_order), so the kernel only needs each
    tile's ``counts`` leading columns — the step axis is DATA-ADAPTIVE.
    The step id itself never reaches the kernel: the order is folded
    through the step->(chunk, instance) tables HERE, so SMEM holds two
    (tile-batch, window) i32 tables instead of O(steps) lookup tables."""
    order, skip = chunk_order(
        ray_ins[0], ray_ins[1], ray_ins[2], ray_ins[3], ray_ins[4],
        ray_ins[5], ray_ins[7] > ray_ins[6], step_aabbs,
        BLOCK_ROWS)
    counts = jnp.sum(1 - skip, axis=1).astype(jnp.int32)
    return (jnp.take(step_chunk, order, axis=0),
            jnp.take(step_inst, order, axis=0), counts)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "chunk", "sub"))
def _trace_instanced(table, sub_aabbs, obj_chunks, inst,
                     order_chunk, order_inst, counts, ray_ins, carry_ins,
                     interpret=False, chunk=TRI_CHUNK, sub=SUB):
    """One (tile-batch, step-window) pass. ``order_chunk``/``order_inst``
    are (tiles_b, W) i32, ``counts`` the batch's per-tile remaining visit
    counts clipped to [0, W]; ``carry_ins`` the 5 best-hit planes from
    the previous pass (or the tmax/-1 init). SMEM footprint is bounded
    by the batch shape alone: the triangle/sub-AABB windows plus ONE
    instance record and ONE object-chunk row per step (both picked by
    the order tables' index maps), independent of instance count, chunk
    count, and total step count."""
    rows = ray_ins[0].shape[0]
    grid = (rows // BLOCK_ROWS, order_chunk.shape[1])
    # dense-pack the SMEM-resident tables (see kernel comment): 8
    # records / 16 AABBs per 128-f32 row; pad rows are never indexed
    ipad = (-inst.shape[0]) % 8
    if ipad:
        inst = jnp.concatenate(
            [inst, jnp.zeros((ipad, 16), jnp.float32)])
    inst = inst.reshape(-1, 128)
    cpad = (-obj_chunks.shape[0]) % 16
    if cpad:
        obj_chunks = jnp.concatenate(
            [obj_chunks, jnp.zeros((cpad, 8), jnp.float32)])
    obj_chunks = obj_chunks.reshape(-1, 128)
    ray_spec = pl.BlockSpec((BLOCK_ROWS, _LANES),
                            lambda i, c, oc, oi, cnt: (i, 0))
    tri_spec = pl.BlockSpec((chunk, _COLS),
                            lambda i, c, oc, oi, cnt: (oc[i, c], 0),
                            memory_space=pltpu.SMEM)
    sub_spec = pl.BlockSpec((chunk // sub, 8),
                            lambda i, c, oc, oi, cnt: (oc[i, c], 0),
                            memory_space=pltpu.SMEM)
    # full-array SMEM residency (seg-engine pattern): Mosaic's block
    # rule rejects (1, 8)/(1, 16) windows (second-to-minor dim must be
    # a multiple of 8 or the array dim), so the kernel picks rows
    # dynamically from the whole array instead
    chunk_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    inst_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shape = jax.ShapeDtypeStruct((rows, _LANES), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[tri_spec, sub_spec, chunk_spec, inst_spec]
        + [ray_spec] * 13,
        out_specs=[ray_spec] * 5,
    )
    unroll = 1 if interpret else sub
    return pl.pallas_call(
        _make_inst_kernel(unroll, chunk, sub),
        grid_spec=grid_spec,
        out_shape=(out_shape,) * 5,
        interpret=interpret,
    )(order_chunk, order_inst, counts, table, sub_aabbs, obj_chunks,
      inst, *ray_ins, *carry_ins)


# Step-window width per pass and tiles per pallas_call: together they
# bound the order tables' SMEM cost at 2 * TILE_BATCH * W_STEPS * 4 B
# (256 KB at the defaults) regardless of scene scale. Tiles whose visit
# count exceeds W_STEPS CONTINUE across passes (the best-hit planes
# chain through carry inputs), so no count is too large — the grid work
# stays proportional to the per-batch max count, rounded up to a pass.
# RTF_TPU_INST_W / RTF_TPU_INST_TB override (sweeps + the multi-pass
# bit-exactness test).
W_STEPS = 4096
TILE_BATCH = 8


def _window_params():
    import os

    return (int(os.environ.get("RTF_TPU_INST_W", W_STEPS)),
            int(os.environ.get("RTF_TPU_INST_TB", TILE_BATCH)))


def trace_closest_instanced(tables, origin, direction, tmin, tmax,
                            interpret: bool | None = None):
    """Closest-hit trace over shared instanced geometry.

    ``tables`` from :func:`pack_instanced_tables`. Returns a
    :class:`TraceResult` whose ``prim`` is the GLOBAL original prim id
    (geometry base + pre-Morton index — identifies the unique triangle,
    shared across instances) plus an ``inst`` array of hit instance ids
    (-1 on miss) as a second return value.

    Dispatch: one ``chunk_order`` pass over the world step AABBs, one
    (tiles,) count readback, then tile batches of TILE_BATCH x W_STEPS
    passes. Each pass is a fixed-shape program (the compile cache sees
    at most two shapes per scene), and a batch stops after the pass
    covering its own max count — camera-coherent neighbors have similar
    counts, so the rounding waste is one part-pass per batch.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    from raytracerfacility_tpu.ops.pallas_brute import _flatten

    batch, origin, direction, tmin_f, tmax_f = _flatten(
        origin, direction, tmin, tmax)
    ray_ins = _pad_rays(origin, direction, tmin_f, tmax_f)
    r = origin.shape[0]
    rp = ray_ins[0].size
    rows = ray_ins[0].shape[0]
    tiles = rows // BLOCK_ROWS

    nsteps = int(tables["step_chunk"].shape[0])
    order_chunk, order_inst, counts = _step_order(
        ray_ins, tables["step_aabbs"][:nsteps],
        tables["step_chunk"], tables["step_inst"])
    counts_np = np.asarray(counts)  # one small (tiles,) readback

    w_steps, tile_batch = _window_params()
    w = min(w_steps, nsteps)
    # pad the order columns to a pass multiple with edge repeats: the
    # repeated index elides the window DMA and count-gating skips the
    # step, so pad columns cost (almost) nothing
    padw = (-nsteps) % w
    if padw:
        order_chunk = jnp.concatenate(
            [order_chunk, jnp.repeat(order_chunk[:, -1:], padw, axis=1)],
            axis=1)
        order_inst = jnp.concatenate(
            [order_inst, jnp.repeat(order_inst[:, -1:], padw, axis=1)],
            axis=1)

    init_t = ray_ins[7]
    init_p = jnp.full((rows, _LANES), -1.0, jnp.float32)
    init_i = jnp.full((rows, _LANES), 3.4e38, jnp.float32)
    init_u = jnp.zeros((rows, _LANES), jnp.float32)
    init_v = jnp.zeros((rows, _LANES), jnp.float32)

    outs = [[] for _ in range(5)]
    static_args = dict(interpret=bool(interpret), chunk=tables["chunk"],
                       sub=tables["sub"])
    for t0 in range(0, tiles, tile_batch):
        t1 = min(t0 + tile_batch, tiles)
        r0, r1 = t0 * BLOCK_ROWS, t1 * BLOCK_ROWS
        rays_b = tuple(p[r0:r1] for p in ray_ins)
        carry = (init_t[r0:r1], init_p[r0:r1], init_i[r0:r1],
                 init_u[r0:r1], init_v[r0:r1])
        bmax = int(counts_np[t0:t1].max(initial=0))
        passes = max(1, -(-bmax // w))
        for p in range(passes):
            c0 = p * w
            oc = order_chunk[t0:t1, c0:c0 + w]
            oi = order_inst[t0:t1, c0:c0 + w]
            cnt = jnp.clip(counts[t0:t1] - c0, 0, w).astype(jnp.int32)
            carry = _trace_instanced(
                tables["table"], tables["sub_aabbs"],
                tables["obj_chunks"], tables["inst"],
                oc, oi, cnt, rays_b, carry, **static_args)
        for k in range(5):
            outs[k].append(carry[k])
    t, prim, iid, u, v = (x[0] if len(x) == 1 else
                          jnp.concatenate(x, axis=0) for x in outs)

    def unplane(x):
        return x.reshape(rp)[:r]

    t, prim, iid, u, v = (unplane(x) for x in (t, prim, iid, u, v))
    prim_i = prim.astype(jnp.int32)
    hit = prim_i >= 0
    inst_i = jnp.where(hit, iid.astype(jnp.int32), -1)
    res = TraceResult(
        t=t.reshape(batch),
        prim=prim_i.reshape(batch),
        u=u.reshape(batch),
        v=v.reshape(batch),
        hit=hit.reshape(batch),
    )
    return res, inst_i.reshape(batch)
