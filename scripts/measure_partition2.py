"""Decompose the inter-segment reorder cost at 2M rays (fenced scalar
readbacks; see measure_partition.py for the np.asarray fencing trap).

Pieces: the argsort itself, the packed-matrix gather, the packed-matrix
scatter, permutation inversion, and sort-free bucket-partition position
computation in PLANE layout ((ROWS,128) f32 planes — a (R, nb) one-hot
pads nb up to 128 lanes in XLA, a 14x traffic blowup that made the
first partition attempt 4x WORSE than the argsort it replaced).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

R = 2_073_600
ROWS = R // 128
NPLANES = 15


def tm(fn, *args, n=5):
    def fence(out):
        leaf = jax.tree.leaves(out)[0]
        return float(jnp.sum(leaf.reshape(-1)[:1]))

    fence(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        fence(fn(*args))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    key = jax.random.PRNGKey(0)
    keys_u = jax.random.randint(key, (R,), 0, 9, dtype=jnp.int32)
    packed = jax.random.uniform(jax.random.fold_in(key, 1), (R, NPLANES))
    perm = jax.random.permutation(jax.random.fold_in(key, 2),
                                  jnp.arange(R, dtype=jnp.int32))

    print("argsort only:",
          f"{tm(jax.jit(lambda k: jnp.argsort(k, stable=True)), keys_u):.2f} ms",
          flush=True)
    print("gather packed (R,15):",
          f"{tm(jax.jit(lambda m, p: m[p]), packed, perm):.2f} ms",
          flush=True)
    print("scatter packed (R,15):",
          f"{tm(jax.jit(lambda m, p: jnp.zeros_like(m).at[p].set(m)), packed, perm):.2f} ms",
          flush=True)
    print("invert perm (scatter iota):",
          f"{tm(jax.jit(lambda p: jnp.zeros_like(p).at[p].set(jnp.arange(R, dtype=jnp.int32))), perm):.2f} ms",
          flush=True)
    print("gather 15 separate planes:",
          f"{tm(jax.jit(lambda m, p: tuple(m[:, i][p] for i in range(NPLANES))), packed, perm):.2f} ms",
          flush=True)

    # plane-layout bucket partition: per-bucket boolean planes, lane-dim
    # cumsum for in-row rank, tiny row-dim cumsum for row offsets
    def make_pos(nb):
        @jax.jit
        def pos_fn(k):
            kr = k.reshape(ROWS, 128)
            pos = jnp.zeros((ROWS, 128), jnp.int32)
            offset = jnp.int32(0)
            for b in range(nb):
                isb = (kr == b)
                f = isb.astype(jnp.float32)
                inrow = jnp.cumsum(f, axis=1)  # (ROWS,128) lane scan
                rowtot = inrow[:, -1]
                rowoff = jnp.cumsum(rowtot) - rowtot
                rank = (inrow - 1.0 + rowoff[:, None]).astype(jnp.int32)
                pos = jnp.where(isb, offset + rank, pos)
                offset = offset + rowtot[-1].astype(jnp.int32) + jnp.int32(
                    rowoff[-1])
            return pos
        return pos_fn

    for nb in (2, 9):
        print(f"plane-partition pos nb={nb}:",
              f"{tm(make_pos(nb), keys_u % nb):.2f} ms", flush=True)

    # end-to-end: plane pos + scatter packed
    def make_full(nb):
        posf = make_pos(nb)

        @jax.jit
        def f(k, m):
            pos = posf(k).reshape(R)
            return jnp.zeros_like(m).at[pos].set(m)
        return f

    for nb in (2, 9):
        print(f"plane-partition+scatter nb={nb}:",
              f"{tm(make_full(nb), keys_u % nb, packed):.2f} ms", flush=True)


if __name__ == "__main__":
    main()
