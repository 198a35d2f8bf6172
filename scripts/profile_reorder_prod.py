"""Per-segment cost of the PRODUCTION reorder (liveness-windowed cascade)
on a real evolving 1080p/8-bounce frame, vs (a) the full 15-operand sort
and (b) a 9-operand "lean" sort (key + o + d + rng + idx, no
throughput/radiance payloads — semantically incomplete, measured only
for operand-count scaling). profile_seg_frame.py times full sorts only,
which overstates the production reorder share (PERF.md round-4 ledger:
wdepth=4 was neutral at the headline, suggesting the cost concentrates
in the high-liveness early segments).

All outputs of every timed sort are returned from the jit (nothing for
XLA to dead-code-eliminate); every reading is fenced by a dependent
device-scalar readback per PERF.md measurement rules.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_reorder_prod.py
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_rtf")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp


def fence(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].reshape(-1)[:1]))


def tm(fn, *args, n=3):
    fence(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        fence(fn(*args))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    from __graft_entry__ import _bench_scene
    from raytracerfacility_tpu.models.pathtracer import (
        RenderConfig, generate_camera_rays, lcg_init)
    from raytracerfacility_tpu.ops import pallas_seg as seg

    W, H, BOUNCES = 1920, 1080, 8
    scene, camprops, envprops = _bench_scene(W, H)
    compiled = scene.build()
    cam = camprops.state()
    table, sub_aabbs, chunk_aabbs, mat_table = compiled.fused

    base = jnp.zeros((4,), jnp.float32)
    fence_ms = tm(lambda x: x + 1.0, base, n=5)
    print(f"fence overhead: {fence_ms:.1f} ms", flush=True)

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
    env_vec = jnp.zeros((16,), jnp.float32)
    env_vec = env_vec.at[0:3].set(0.3)

    block_rows = seg._pick_block_rows((r + 127) // 128)
    block = block_rows * 128
    pad = (-r) % block
    if pad:
        origin = jnp.concatenate([origin, jnp.zeros((pad, 3))], 0)
        direction = jnp.concatenate(
            [direction, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (pad, 1))], 0)
        rng = jnp.concatenate([rng, jnp.zeros((pad,), jnp.uint32)])
        valid = jnp.concatenate([valid, jnp.zeros((pad,), jnp.float32)])
    rp = r + pad
    rows = rp // 128
    chunk = compiled.fused_chunk or seg.TRI_CHUNK
    wdepth = int(os.environ.get("RTF_TPU_SEG_WDEPTH", seg.WDEPTH_DEFAULT))
    print(f"rows={rows} block_rows={block_rows} wdepth={wdepth}", flush=True)

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

    def sort_window(w, ops_n):
        def f(o):
            sub = o if w == rp else tuple(x[:w] for x in o)
            outs = jax.lax.sort(sub, num_keys=1)
            if w == rp:
                return outs
            return tuple(jnp.concatenate([s, full[w:]])
                         for s, full in zip(outs, o))
        return f

    def make_reorder(nops):
        # nops = number of f32 payload planes taken from state[:6]+state[8:]
        @jax.jit
        def reorder(state, orig_idx, prev_live):
            key = seg._morton_key(state[0], state[1], state[2], state[3],
                                  state[4], state[5], state[7], lo,
                                  inv_extent)
            f32s = [p.reshape(rp) for p in (state[:6] + state[8:])[:nops]]
            i32s = [state[6].reshape(rp), orig_idx.reshape(rp)]
            ops = [key.reshape(rp)] + f32s + i32s

            def cascade(k):
                if k == 0:
                    return sort_window(rp, len(ops))
                return lambda o: jax.lax.cond(
                    prev_live <= float(rp >> k),
                    sort_window(rp >> k, len(ops)), cascade(k - 1), o)

            return cascade(wdepth)(tuple(ops))

        return reorder

    @jax.jit
    def reorder_full_nowin(state, orig_idx, prev_live):
        key = seg._morton_key(state[0], state[1], state[2], state[3],
                              state[4], state[5], state[7], lo, inv_extent)
        f32s = [p.reshape(rp) for p in state[:6] + state[8:]]
        i32s = [state[6].reshape(rp), orig_idx.reshape(rp)]
        return jax.lax.sort(tuple([key.reshape(rp)] + f32s + i32s),
                            num_keys=1)

    @jax.jit
    def key_only(state):
        return seg._morton_key(state[0], state[1], state[2], state[3],
                               state[4], state[5], state[7], lo, inv_extent)

    r_prod = make_reorder(12)   # production: key + 12 f32 + rng + idx = 15
    r_lean = make_reorder(6)    # lean: key + o3 d3 + rng + idx = 9

    @jax.jit
    def corder(state):
        return seg._chunk_order(state, chunk_aabbs, block_rows)

    def run_segment(state, order, skip, is_first, has_cont):
        out, aovs, live, _ = seg._segment_call(
            table, sub_aabbs, chunk_aabbs, mat_table, env_vec, order, skip,
            state, is_first=is_first, has_cont=has_cont, rows=rows,
            interpret=False, xla_env=False, block_rows=block_rows,
            chunk=chunk)
        return out

    tkey = tm(key_only, state)
    print(f"morton key alone: {tkey - fence_ms:5.1f} ms", flush=True)

    prev_live = float(rp)
    tot_prod = tot_full = tot_lean = 0.0
    for s in range(BOUNCES + 1):
        if s > 0:
            t_prod = tm(r_prod, state, orig_idx, prev_live)
            t_full = tm(reorder_full_nowin, state, orig_idx, prev_live)
            t_lean = tm(r_lean, state, orig_idx, prev_live)
            tot_prod += t_prod - fence_ms
            tot_full += t_full - fence_ms
            tot_lean += t_lean - fence_ms
            win = rp
            for k in range(wdepth, 0, -1):
                if prev_live <= float(rp >> k):
                    win = rp >> k
                    break
            print(f"  seg {s}: prev_live {prev_live / rp * 100:5.1f}% "
                  f"win 1/{rp // win:<2d} | prod {t_prod - fence_ms:6.1f} "
                  f"| full {t_full - fence_ms:6.1f} "
                  f"| lean9 {t_lean - fence_ms:6.1f} ms", flush=True)
            # apply the production reorder to advance the real state
            outs = r_prod(state, orig_idx, prev_live)
            key_s = outs[0].reshape(rp)
            act = plane((key_s != jnp.int32(2147483647)).astype(jnp.float32))
            p6 = [plane(o.reshape(rp)) for o in outs[1:7]]
            rest = [plane(o.reshape(rp)) for o in outs[7:13]]
            rng_p = plane(outs[13].reshape(rp))
            state = (*p6, rng_p, act, *rest)
            orig_idx = plane(outs[14].reshape(rp))
        order, skip = corder(state)
        prev_live = float(jnp.sum(state[7]))
        state = run_segment(state, order, skip, s == 0, s < BOUNCES)
    print(f"reorder totals: prod {tot_prod:.0f} ms | full {tot_full:.0f} ms"
          f" | lean9 {tot_lean:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
