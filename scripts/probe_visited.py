"""Culling-efficiency probe: per-segment VISITED-PAIR accounting.

For the real 1080p/8-bounce frame state (segment 0 = camera rays,
segment 1 = first bounce after the production reorder), compute in XLA:

* per-RAY entered sub-runs (exact per-ray slab over every SUB AABB) —
  the per-lane-traversal ideal a BVH walk would approach;
* per-TILE entered sub-runs (the bundle-interval slab the kernel's
  tile-granular culling actually achieves, sub granularity);
* per-TILE entered chunks (level-1).

The tile/ray ratio is the conservatism cost of SIMD tile-granular
culling; (tile subs x SUB x tile rays) is the kernel's visited-pair
count. This is measurement, not simulation: the state, the reorder, and
the block geometry are exactly the production engine's.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_visited.py
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_rtf")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp


def main():
    from __graft_entry__ import _bench_scene
    from raytracerfacility_tpu.models.pathtracer import (
        generate_camera_rays, lcg_init)
    from raytracerfacility_tpu.ops import pallas_seg as seg

    W, H = 1920, 1080
    scene, camprops, envprops = _bench_scene(W, H)
    compiled = scene.build()
    cam = camprops.state()
    table, sub_aabbs, chunk_aabbs, mat_table = compiled.fused
    chunk = compiled.fused_chunk or seg.TRI_CHUNK
    sub = table.shape[0] // sub_aabbs.shape[0]

    iy, ix = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    pixel_index = (ix + W * iy).astype(jnp.uint32)
    rng0 = lcg_init(pixel_index[None],
                    jnp.broadcast_to(jnp.uint32(0), (1, H, W)))
    rng0, origin, direction = generate_camera_rays(
        cam, rng0, ix[None], iy[None], W, H)
    r = W * H
    origin = origin.reshape(r, 3)
    direction = direction.reshape(r, 3)
    rng = rng0.reshape(r)
    valid = jnp.ones((r,), jnp.float32)
    env_vec = jnp.zeros((16,), jnp.float32).at[0:3].set(0.3)

    block_rows = seg._pick_block_rows((r + 127) // 128)
    block = block_rows * 128
    pad = (-r) % block
    if pad:
        origin = jnp.concatenate([origin, jnp.zeros((pad, 3))], 0)
        direction = jnp.concatenate(
            [direction, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (pad, 1))],
            0)
        rng = jnp.concatenate([rng, jnp.zeros((pad,), jnp.uint32)])
        valid = jnp.concatenate([valid, jnp.zeros((pad,), jnp.float32)])
    rp = r + pad
    rows = rp // 128

    def plane(x):
        return x.reshape(rows, 128)

    zero = jnp.zeros((rows, 128), jnp.float32)
    one = zero + 1.0
    state = (plane(origin[:, 0]), plane(origin[:, 1]), plane(origin[:, 2]),
             plane(direction[:, 0]), plane(direction[:, 1]),
             plane(direction[:, 2]),
             plane(jax.lax.bitcast_convert_type(rng, jnp.int32)),
             plane(valid), one, one, one, zero, zero, zero)

    cvalid = chunk_aabbs[:, 0] < 1e37
    big = 3.4e38
    lo = jnp.min(jnp.where(cvalid[:, None], chunk_aabbs[:, 0:3], big), 0)
    hi = jnp.max(jnp.where(cvalid[:, None], chunk_aabbs[:, 3:6], -big), 0)
    inv_extent = 1.0 / jnp.maximum(hi - lo, 1e-6)
    orig_idx = jnp.arange(rp, dtype=jnp.int32).reshape(rows, 128)

    nsub = sub_aabbs.shape[0]
    nchunks = table.shape[0] // chunk

    @jax.jit
    def visited_stats(state):
        ox, oy, oz = state[0], state[1], state[2]
        dx, dy, dz = state[3], state[4], state[5]
        act = state[7] > 0.0
        o = jnp.stack([ox.reshape(rp), oy.reshape(rp), oz.reshape(rp)], -1)
        d = jnp.stack([dx.reshape(rp), dy.reshape(rp), dz.reshape(rp)], -1)
        a = act.reshape(rp)
        eps = 1e-20
        inv = 1.0 / jnp.where(jnp.abs(d) < eps,
                              jnp.where(d < 0, -eps, eps), d)

        def per_ray_entered_total(boxes):
            # total entered boxes over live rays, scanned in ray blocks so
            # the (B, nb, 3) slab intermediates stay small
            B = 65536
            nb = rp // B if rp % B == 0 else 1
            o_b = o[: nb * B].reshape(nb, -1, 3)
            inv_b = inv[: nb * B].reshape(nb, -1, 3)
            a_b = a[: nb * B].reshape(nb, -1)

            def body(tot, blk):
                ob, ib, ab = blk
                t1 = (boxes[None, :, 0:3] - ob[:, None, :]) * ib[:, None, :]
                t2 = (boxes[None, :, 3:6] - ob[:, None, :]) * ib[:, None, :]
                near = jnp.max(jnp.minimum(t1, t2), axis=-1)
                far = jnp.min(jnp.maximum(t1, t2), axis=-1)
                ok = (near <= far) & (far > 0.0) & ab[:, None]
                return tot + jnp.sum(ok.astype(jnp.float32)), None

            tot, _ = jax.lax.scan(body, jnp.float32(0.0),
                                  (o_b, inv_b, a_b))
            return tot

        ray_subs_total = per_ray_entered_total(sub_aabbs)

        # tile-bundle entered subs (the kernel's level-2 granularity):
        # interval slab of each tile's (o, inv) bounds vs each box
        to = o.reshape(-1, block, 3)
        tinv = inv.reshape(-1, block, 3)
        ta = a.reshape(-1, block)
        neg = jnp.where(ta[..., None], to, jnp.inf)
        pos = jnp.where(ta[..., None], to, -jnp.inf)
        o_lo = jnp.min(neg, axis=1)
        o_hi = jnp.max(pos, axis=1)
        i_lo = jnp.min(jnp.where(ta[..., None], tinv, jnp.inf), axis=1)
        i_hi = jnp.max(jnp.where(ta[..., None], tinv, -jnp.inf), axis=1)
        any_live = jnp.any(ta, axis=1)

        def tile_entered(boxes):
            lo_b = boxes[None, :, 0:3]
            hi_b = boxes[None, :, 3:6]
            # interval arithmetic: (lo_b - o) * inv over o in [o_lo, o_hi],
            # inv in [i_lo, i_hi] — min/max over the 4 corner products
            def corners(b):
                d1 = b - o_lo[:, None, :]
                d2 = b - o_hi[:, None, :]
                c = jnp.stack([d1 * i_lo[:, None, :], d1 * i_hi[:, None, :],
                               d2 * i_lo[:, None, :], d2 * i_hi[:, None, :]])
                return jnp.min(c, 0), jnp.max(c, 0)
            lo1, hi1 = corners(lo_b)
            lo2, hi2 = corners(hi_b)
            tmin_ax = jnp.minimum(jnp.minimum(lo1, lo2), jnp.minimum(hi1, hi2))
            tmax_ax = jnp.maximum(jnp.maximum(lo1, lo2), jnp.maximum(hi1, hi2))
            near = jnp.max(tmin_ax, axis=-1)
            far = jnp.min(tmax_ax, axis=-1)
            ok = (near <= far) & (far > 0.0) & any_live[:, None]
            return jnp.sum(ok, axis=1)

        tile_subs = tile_entered(sub_aabbs)
        tile_chunks = tile_entered(chunk_aabbs[:nchunks])
        live = jnp.sum(a)
        return (ray_subs_total, live,
                jnp.sum(tile_subs), jnp.sum(tile_chunks),
                jnp.float32(tile_subs.shape[0]))

    @jax.jit
    def reorder(state, oi):
        key = seg._morton_key(state[0], state[1], state[2], state[3],
                              state[4], state[5], state[7], lo, inv_extent)
        f32s = [p.reshape(rp) for p in state[:6] + state[8:]]
        i32s = [state[6].reshape(rp), oi.reshape(rp)]
        outs = jax.lax.sort(tuple([key.reshape(rp)] + f32s + i32s),
                            num_keys=1)
        key_s = outs[0].reshape(rp)
        act = plane((key_s != jnp.int32(2147483647)).astype(jnp.float32))
        p6 = [plane(x.reshape(rp)) for x in outs[1:7]]
        rest = [plane(x.reshape(rp)) for x in outs[7:13]]
        rng_p = plane(outs[13].reshape(rp))
        return (*p6, rng_p, act, *rest), plane(outs[14].reshape(rp))

    def report(tag, st):
        rs, live, ts, tc, ntiles = [float(x) for x in visited_stats(st)]
        live = max(live, 1.0)
        pairs_ray = rs * sub
        pairs_tile = ts * sub * block
        print(f"{tag}: live {live/1e6:.2f} M | per-ray subs {rs/live:6.2f} "
              f"({pairs_ray/live:7.1f} tris/ray ideal) | per-tile subs "
              f"{ts/ntiles:6.1f}/{nsub} | tile-granular tris/ray "
              f"{pairs_tile/live:8.1f} | conservatism x"
              f"{pairs_tile/max(pairs_ray,1):5.1f} | chunks/tile "
              f"{tc/ntiles:5.2f}/{nchunks}", flush=True)

    report("seg0 (camera)", state)

    # run segment 0 for real, then the production reorder, then segment 1
    order, skip = seg._chunk_order(state, chunk_aabbs, block_rows)
    state, aovs, live0, miss = seg._segment_call(
        table, sub_aabbs, chunk_aabbs, mat_table, env_vec, order, skip,
        state, is_first=True, has_cont=True, rows=rows, interpret=False,
        xla_env=False, block_rows=block_rows, chunk=chunk)
    state, orig_idx = reorder(state, orig_idx)
    report("seg1 (sorted)", state)
    for s in range(2, 5):
        order, skip = seg._chunk_order(state, chunk_aabbs, block_rows)
        state, _, _, _ = seg._segment_call(
            table, sub_aabbs, chunk_aabbs, mat_table, env_vec, order, skip,
            state, is_first=False, has_cont=True, rows=rows,
            interpret=False, xla_env=False, block_rows=block_rows,
            chunk=chunk)
        state, orig_idx = reorder(state, orig_idx)
        report(f"seg{s} (sorted)", state)


if __name__ == "__main__":
    main()
