"""Decompose BENCH config 4 (111k-tri canopy illumination, 222k probe
rays, 3 segments) on the real chip: whole estimate, reorder, chunk_order,
and per-segment trace cost at representative live fractions. Fenced per
PERF.md rules (dependent device scalar readback).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_config4.py
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_rtf")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

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
    from raytracerfacility_tpu.models.illumination import (
        TriangleIlluminationEstimator)
    from raytracerfacility_tpu.models.pathtracer import RenderConfig
    from raytracerfacility_tpu.models.renderer import EnvironmentProperties
    from raytracerfacility_tpu.ops import pallas_seg as seg
    from raytracerfacility_tpu.scene.procedural import (
        build_canopy_scene, make_canopy_instances, make_sorghum_plant)

    base = jnp.zeros((4,), jnp.float32)
    print("fence overhead:", tm(lambda x: x + 1.0, base), "ms", flush=True)

    rows_c = cols_c = 17
    scene = build_canopy_scene(rows=rows_c, cols=cols_c)
    compiled = scene.build()
    plants = [make_sorghum_plant(seed=v) for v in range(4)]
    mats = make_canopy_instances(rows_c, cols_c, seed=0)
    per = (rows_c * cols_c + 3) // 4
    items = []
    for v in range(4):
        for m in mats[v * per:(v + 1) * per]:
            items.append((plants[v], m))
    est = TriangleIlluminationEstimator()
    probes = est.prepare_light_probe_group(items)
    env = EnvironmentProperties(skylight_intensity=1.0).state()
    config = RenderConfig(bounces=2, samples=1, enable_textures=False,
                          enable_vertex_color=False)

    def whole(seed):
        est.sample_light_probe_group(compiled, env, config, seed=seed)
        return est.probes.energy

    import numpy as np
    # individual call times (bench --config 4 times exactly call #2;
    # check whether it is an outlier vs steady state)
    fence(whole(1))
    for i in range(2, 7):
        t0 = time.perf_counter()
        fence(whole(i))
        print(f"  estimate call #{i}: "
              f"{(time.perf_counter() - t0) * 1e3:.0f} ms", flush=True)

    # component costs at the estimator pool shape
    table, sub_aabbs, chunk_aabbs, mat_table = compiled.fused
    print("fused_chunk:", compiled.fused_chunk, flush=True)
    r = probes.num_probes * 2
    rows = (r + 127) // 128
    block_rows = seg._pick_block_rows(rows)
    rows += (-rows) % block_rows
    nchunks = chunk_aabbs.shape[0]
    print("table rows:", table.shape[0], "chunks:", nchunks,
          "pool rays:", r, "block_rows:", block_rows, "tiles:",
          rows // block_rows, flush=True)

    key = jax.random.PRNGKey(0)
    # origins spread over the canopy extent, random hemisphere directions
    lo3 = jnp.min(chunk_aabbs[:, 0:3], axis=0)
    hi3 = jnp.max(jnp.where(chunk_aabbs[:, 3:4] > -1e37,
                            chunk_aabbs[:, 3:6], -3.4e38), axis=0)
    o = jax.random.uniform(key, (rows, 128, 3)) * (hi3 - lo3) + lo3
    d = jax.random.normal(jax.random.fold_in(key, 1), (rows, 128, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    zero = jnp.zeros((rows, 128), jnp.float32)
    one = zero + 1.0
    rngp = jnp.zeros((rows, 128), jnp.int32)

    def mk_state(live_frac):
        idx = jnp.arange(rows * 128, dtype=jnp.float32).reshape(rows, 128)
        act = (idx < live_frac * rows * 128).astype(jnp.float32)
        return (o[..., 0], o[..., 1], o[..., 2],
                d[..., 0], d[..., 1], d[..., 2], rngp, act,
                one, one, one, zero, zero, zero)

    env_vec = jnp.zeros((16,), jnp.float32).at[0:3].set(0.3)
    st = mk_state(1.0)

    cvalid = chunk_aabbs[:, 0] < 1e37
    big = 3.4e38
    lo = jnp.min(jnp.where(cvalid[:, None], chunk_aabbs[:, 0:3], big), 0)
    hi = jnp.max(jnp.where(cvalid[:, None], chunk_aabbs[:, 3:6], -big), 0)
    inv = 1.0 / jnp.maximum(hi - lo, 1e-6)

    @jax.jit
    def one_reorder(state):
        keyv = seg._morton_key(state[0], state[1], state[2], state[3],
                               state[4], state[5], state[7], lo, inv)
        rp = rows * 128
        f32s = [p.reshape(rp) for p in state[:6] + state[8:]]
        i32s = [state[6].reshape(rp)]
        outs = jax.lax.sort(tuple([keyv.reshape(rp)] + f32s + i32s),
                            num_keys=1)
        return outs[1]

    print("reorder (sort 14 operands):", tm(one_reorder, st), "ms",
          flush=True)

    @jax.jit
    def corder(state):
        return seg._chunk_order(state, chunk_aabbs, block_rows)

    print("chunk_order:", tm(corder, st), "ms", flush=True)

    for frac in (1.0, 0.5, 0.25):
        stf = mk_state(frac)
        order, skip = corder(stf)
        n_steps = float(jnp.mean(jnp.sum(1 - skip, axis=1)))
        print(f"  mean visited chunks/tile at live={frac}: {n_steps:.1f}"
              f" of {nchunks}", flush=True)

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
