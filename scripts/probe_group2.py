"""Bisect the row-group SIGABRT with the REAL segmented kernel: compile
seg._segment_call at bench-like static shapes with group_rows 0/8 on the
chip, is_first both ways.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_group2.py
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_rtf")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp

from raytracerfacility_tpu.ops import pallas_seg as seg


def main():
    n, chunk, sub_sz = 2816, 256, 16
    npad = -(-n // chunk) * chunk
    key = jax.random.PRNGKey(0)
    v0 = jax.random.uniform(key, (npad, 3), jnp.float32, -1.0, 1.0)
    table = jnp.zeros((npad, 20), jnp.float32)
    table = table.at[:, 0:3].set(v0)
    table = table.at[:, 3:6].set(0.1)
    table = table.at[:, 6:9].set(0.05)
    table = table.at[:, 9].set(jnp.arange(npad, dtype=jnp.float32))
    table = table.at[:, 10].set(1.0)
    sub_aabbs = jnp.zeros((npad // sub_sz, 8), jnp.float32)
    sub_aabbs = sub_aabbs.at[:, 0:3].set(-1.0).at[:, 3:6].set(1.2)
    nchunks = npad // chunk
    chunk_aabbs = jnp.zeros((max(8, nchunks), 8), jnp.float32)
    chunk_aabbs = chunk_aabbs.at[:, 0:3].set(-1.0).at[:, 3:6].set(1.2)
    mat_table = jnp.zeros((8, 8), jnp.float32).at[:, 0:3].set(0.5)
    env_vec = jnp.zeros((16,), jnp.float32).at[0:3].set(0.3)

    rows, block_rows = 512, 32
    tiles = rows // block_rows
    zero = jnp.zeros((rows, 128), jnp.float32)
    one = zero + 1.0
    state = (zero, zero + 0.1, zero, one * 0.3, one * 0.5, one * 0.8,
             jnp.zeros((rows, 128), jnp.int32), one,
             one, one, one, zero, zero, zero)
    order = jnp.tile(jnp.arange(nchunks, dtype=jnp.int32)[None],
                     (tiles, 1))
    skip = jnp.zeros((tiles, nchunks), jnp.int32)

    for is_first in (False, True):
        for g in (0, 8, 16):
            tag = f"is_first={is_first} group={g}"
            try:
                out, aovs, live, miss = seg._segment_call(
                    table, sub_aabbs, chunk_aabbs, mat_table, env_vec,
                    order, skip, state, is_first=is_first, has_cont=True,
                    rows=rows, interpret=False, xla_env=False,
                    block_rows=block_rows, chunk=chunk, group_rows=g)
                print(f"{tag}: OK live={float(live):.0f} "
                      f"rr={float(out[11][0, 0]):.4f}", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{tag}: FAIL {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
