"""Decompose the windowed reorder's cost at 1080p pool size: raw
truncated multi-operand sorts (the theoretical window cost) vs the
production window path (cond cascade + tail concatenate) vs a
dynamic_update_slice tail variant. Fenced per PERF.md rules (dependent
device-scalar readback).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_reorder_window.py
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_rtf")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np


def fence(x):
    return float(jax.tree.leaves(x)[0].reshape(-1)[0])


def tm(fn, *args, n=5):
    fence(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        fence(fn(*args))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    rp = 16224 * 128  # headline pool (2.08M rays)
    key = jax.random.PRNGKey(0)
    # keys: ~live_frac live (small int keys), rest INT32_MAX
    planes = [jax.random.normal(jax.random.fold_in(key, i), (rp,),
                                jnp.float32) for i in range(12)]
    i32 = jax.random.randint(jax.random.fold_in(key, 50), (rp,), 0, 1 << 20)
    idx = jnp.arange(rp, dtype=jnp.int32)

    base = jnp.zeros((4,), jnp.float32)
    f_ms = tm(lambda x: x + 1.0, base, n=8)
    print(f"fence overhead: {f_ms:.1f} ms", flush=True)

    def mkkey(live_n):
        k = jax.random.randint(jax.random.fold_in(key, 99), (rp,), 0,
                               1 << 16).astype(jnp.int32)
        return jnp.where(idx < live_n, k, jnp.int32(2147483647))

    # --- raw truncated sorts (no window machinery) ---
    for frac, nm in ((1, "full"), (2, "1/2"), (4, "1/4"), (8, "1/8")):
        w = rp // frac

        @jax.jit
        def raw(k, *ps, w=w):
            ops = (k[:w],) + tuple(p[:w] for p in ps)
            return jax.lax.sort(ops, num_keys=1)

        t = tm(raw, mkkey(w // 2), *(planes + [i32, idx]))
        print(f"raw sort {nm} ({w} rays, 15 ops): {t - f_ms:6.1f} ms",
              flush=True)

    # --- production-style window path: cond cascade + tail concat ---
    def windowed(concat: bool):
        @jax.jit
        def run(k, live, *ps):
            ops = (k,) + ps

            def sort_window(w):
                def f(o):
                    if w == rp:
                        return jax.lax.sort(o, num_keys=1)
                    sub = tuple(x[:w] for x in o)
                    outs = jax.lax.sort(sub, num_keys=1)
                    if concat:
                        return tuple(jnp.concatenate([s, full[w:]])
                                     for s, full in zip(outs, o))
                    return tuple(
                        jax.lax.dynamic_update_slice(full, s, (0,))
                        for s, full in zip(outs, o))
                return f

            return jax.lax.cond(
                live <= float(rp // 8), sort_window(rp // 8),
                lambda o: jax.lax.cond(
                    live <= float(rp // 4), sort_window(rp // 4),
                    lambda o2: jax.lax.cond(
                        live <= float(rp // 2), sort_window(rp // 2),
                        sort_window(rp), o2),
                    o),
                ops)
        return run

    for concat in (True, False):
        nm = "concat" if concat else "dus"
        run = windowed(concat)
        for frac in (1, 2, 4, 8):
            live = jnp.float32(rp // frac // 2)  # triggers window rp//frac
            t = tm(run, mkkey(rp // frac // 2), live,
                   *(planes + [i32, idx]))
            print(f"window[{nm}] 1/{frac}: {t - f_ms:6.1f} ms", flush=True)

    # --- plane-shaped state: (rows,128) reshape round-trip cost ---
    rows = rp // 128
    planes2d = [p.reshape(rows, 128) for p in planes]

    @jax.jit
    def flat_sort(k, *ps):
        ops = (k,) + tuple(p.reshape(rp) for p in ps)
        outs = jax.lax.sort(ops, num_keys=1)
        return tuple(o.reshape(rows, 128) for o in outs)

    t = tm(flat_sort, mkkey(rp), *(planes2d + [i32.reshape(rows, 128),
                                               idx.reshape(rows, 128)]))
    print(f"full sort w/ (rows,128) reshape round-trip: {t - f_ms:6.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
