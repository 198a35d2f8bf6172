"""Verify the axon plugin's persistent compile-cache sidechannel.

The plugin (axon/register/ifrt.py) installs a fingerprint-keyed
executable cache keyed through JAX's `jax_compilation_cache_dir`, but
the cache is inert unless that config is set — and every remote Mosaic
compile costs 30-300 s (PERF.md "known inefficiencies" 3). This probe
compiles a small Pallas kernel twice in the same process config and
prints the cold/warm compile wall times; run it TWICE (two processes)
to check cross-process persistence:

    JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_rtf \
        python scripts/probe_cache.py
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_rtf")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] * 2.0 + 1.0


def main():
    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)

    t0 = time.perf_counter()
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
    )(x)
    _ = float(out[0, 0])
    print(f"pallas compile+run: {time.perf_counter() - t0:.2f} s",
          flush=True)

    # a plain XLA jit for comparison
    t0 = time.perf_counter()
    y = jax.jit(lambda a: jnp.tanh(a) @ jnp.ones((128, 8)))(x)
    _ = float(y[0, 0])
    print(f"xla jit compile+run: {time.perf_counter() - t0:.2f} s",
          flush=True)

    cache_dir = os.environ["JAX_COMPILATION_CACHE_DIR"]
    if os.path.isdir(cache_dir):
        n = sum(len(fs) for _, _, fs in os.walk(cache_dir))
        print(f"cache entries under {cache_dir}: {n}", flush=True)


if __name__ == "__main__":
    main()
