"""Decompose the segmented engine's 1080p/8-bounce frame on the real
chip: whole frame, reorder-only, chunk_order-only, and per-segment trace
cost at representative live fractions. Fenced per PERF.md rules.

Run: python scripts/profile_seg.py
"""

import time

import jax
import jax.numpy as jnp


def fence(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].reshape(-1)[:1]))


def tm(fn, *args, n=5):
    fence(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        fence(fn(*args))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    from __graft_entry__ import _bench_scene
    from raytracerfacility_tpu.models.pathtracer import (
        RenderConfig, init_frame, render_frame_counted_jit)
    from raytracerfacility_tpu.ops import pallas_seg as seg
    from raytracerfacility_tpu.ops.pallas_fused import pack_fused_tables

    scene, camprops, env = _bench_scene(1920, 1080)
    compiled = scene.build()
    cam_state, env_state = camprops.state(), env.state()
    config = RenderConfig(width=1920, height=1080, bounces=8, samples=1,
                          enable_textures=False, enable_vertex_color=False)
    frame = init_frame(1920, 1080)

    import os
    os.environ["RTF_TPU_SORTED"] = "1"

    # fence round-trip at this pool shape, for net-of-fence readings
    base = jnp.zeros((4,), jnp.float32)
    print("fence overhead:", tm(lambda x: x + 1.0, base), "ms", flush=True)

    if os.environ.get("RTF_PROBE_SKIP_FRAME") != "1":
        def whole(frame):
            f, rays = render_frame_counted_jit(compiled, cam_state,
                                               env_state, config, frame)
            return f.color

        print("frame (segmented):", tm(whole, frame), "ms", flush=True)

    # per-segment live counts, one real render
    tables = compiled.fused
    table, sub_aabbs, chunk_aabbs, mat_table = tables
    print("table rows:", table.shape[0],
          "chunks:", chunk_aabbs.shape[0], flush=True)

    r = 1920 * 1080
    rows = (r + 127) // 128
    block_rows = seg._pick_block_rows(rows)
    rows += (-rows) % block_rows  # engine pads pools to a tile multiple
    print("block_rows:", block_rows, "rows:", rows, flush=True)

    key = jax.random.PRNGKey(0)
    zero = jnp.zeros((rows, 128), jnp.float32)
    ox = zero + 0.1
    oy = zero + 1.0
    oz = zero + 2.0
    d = jax.random.normal(key, (rows, 128, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    dx, dy, dz = d[..., 0], d[..., 1], d[..., 2]
    rngp = jnp.zeros((rows, 128), jnp.int32)
    one = zero + 1.0

    # state with a configurable live fraction (dead rays compacted last,
    # as after a reorder)
    def mk_state(live_frac):
        idx = jnp.arange(rows * 128, dtype=jnp.float32).reshape(rows, 128)
        act = (idx < live_frac * rows * 128).astype(jnp.float32)
        return (ox, oy, oz, dx, dy, dz, rngp, act,
                one, one, one, zero, zero, zero)

    env_vec = jnp.zeros((16,), jnp.float32).at[0:3].set(0.3)

    @jax.jit
    def one_reorder(state):
        # mirror of _render_pool_sorted's reorder, at frame shapes
        cvalid = chunk_aabbs[:, 0] < 1e37
        big = 3.4e38
        lo = jnp.min(jnp.where(cvalid[:, None], chunk_aabbs[:, 0:3], big), 0)
        hi = jnp.max(jnp.where(cvalid[:, None], chunk_aabbs[:, 3:6], -big), 0)
        inv = 1.0 / jnp.maximum(hi - lo, 1e-6)
        keyv = seg._morton_key(state[0], state[1], state[2], state[3],
                               state[4], state[5], state[7], lo, inv)
        rp = rows * 128
        f32s = [p.reshape(rp) for p in state[:6] + state[7:]]
        i32s = [state[6].reshape(rp)]
        outs = jax.lax.sort(tuple([keyv.reshape(rp)] + f32s + i32s),
                            num_keys=1)
        return outs[1]

    st = mk_state(1.0)
    print("reorder (sort 15 operands):", tm(one_reorder, st), "ms",
          flush=True)

    @jax.jit
    def corder(state):
        return seg._chunk_order(state, chunk_aabbs, block_rows)

    print("chunk_order:", tm(corder, st), "ms", flush=True)

    for frac in (1.0, 0.5, 0.25, 0.1):
        stf = mk_state(frac)
        order, skip = jax.jit(corder)(stf)

        def trace(state, order=order, skip=skip):
            out, _, live, _ = seg._segment_call(
                table, sub_aabbs, chunk_aabbs, mat_table, env_vec, order,
                skip, state, is_first=False, has_cont=True, rows=rows,
                interpret=False, xla_env=False, block_rows=block_rows,
                chunk=compiled.fused_chunk or seg.TRI_CHUNK)
            return out[11]

        print(f"segment trace live={frac}:", tm(trace, stf), "ms",
              flush=True)


if __name__ == "__main__":
    main()
