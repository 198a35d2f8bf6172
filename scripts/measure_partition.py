"""On-chip cost of inter-segment reorder primitives at 2M rays (fenced).

Compares the segmented engine's current argsort-based reorder against a
cumsum-based stable BUCKET PARTITION (counting sort over a small key
alphabet): the reorder only needs tile-granular grouping (8192-ray tiles
share a frustum), not a total order, so a 9-bucket (8 octants + dead) or
73-bucket (octant x 3 morton bits + dead) partition preserves the whole
compaction + coherence win at O(buckets * n) cumsum cost instead of
XLA's O(n log^2 n) comparator sort.

Each variant runs in-process (pure XLA, no Mosaic); every sample fences
on a scalar readback (PERF.md measurement rule).
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
    """Fence on a DEPENDENT SCALAR readback. NOT np.asarray(leaf): that
    materializes the whole output on host, and through the axon tunnel a
    120 MB transfer costs ~10 s — the round-3 measure_reorder.py numbers
    taken that way measured the transfer, not the compute."""
    def fence(out):
        leaf = jax.tree.leaves(out)[0]
        return float(jnp.sum(leaf[:1]))

    fence(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        fence(fn(*args))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    key = jax.random.PRNGKey(0)
    keys_u = jax.random.randint(key, (R,), 0, 65, dtype=jnp.int32)
    packed = jax.random.uniform(jax.random.fold_in(key, 1), (R, NPLANES))

    @jax.jit
    def argsort_reorder(k, m):
        perm = jnp.argsort(k, stable=True)
        return m[perm]

    @jax.jit
    def lax_sort_reorder(k, m):
        idx = jnp.arange(R, dtype=jnp.int32)
        _, perm = jax.lax.sort((k, idx), num_keys=1, is_stable=True)
        return m[perm]

    def make_partition(nb):
        @jax.jit
        def partition_reorder(k, m):
            onehot = jax.nn.one_hot(k, nb, dtype=jnp.int32)
            ranks = jnp.cumsum(onehot, axis=0)
            rank = jnp.take_along_axis(ranks, k[:, None], axis=1)[:, 0] - 1
            totals = ranks[-1]
            offsets = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32), jnp.cumsum(totals)[:-1]])
            pos = offsets[k] + rank
            return jnp.zeros_like(m).at[pos].set(m)
        return partition_reorder

    def make_partition_seg(nb):
        # segmented variant: rank via sort-free two-pass — per-row
        # histogram then hierarchical cumsum (rows x buckets is small)
        @jax.jit
        def partition_reorder(k, m):
            kr = k.reshape(ROWS, 128)
            onehot = jax.nn.one_hot(kr, nb, dtype=jnp.int32)  # (ROWS,128,nb)
            inrow = jnp.cumsum(onehot, axis=1)                # rank in row
            rowtot = inrow[:, -1, :]                          # (ROWS, nb)
            rowoff = jnp.cumsum(rowtot, axis=0) - rowtot      # excl, per bucket
            totals = rowtot.sum(axis=0)
            offsets = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32), jnp.cumsum(totals)[:-1]])
            rank = (jnp.take_along_axis(
                inrow, kr[..., None], axis=2)[..., 0] - 1
                + jnp.take_along_axis(rowoff, kr, axis=1))
            pos = (offsets[kr] + rank).reshape(R)
            return jnp.zeros_like(m).at[pos].set(m)
        return partition_reorder

    print("argsort+gather 15 planes:",
          f"{tm(argsort_reorder, keys_u, packed):.2f} ms", flush=True)
    print("lax.sort(key,idx)+gather:",
          f"{tm(lax_sort_reorder, keys_u, packed):.2f} ms", flush=True)
    for nb in (9, 65):
        print(f"partition nb={nb} flat cumsum:",
              f"{tm(make_partition(nb), keys_u % nb, packed):.2f} ms",
              flush=True)
        print(f"partition nb={nb} row-segmented:",
              f"{tm(make_partition_seg(nb), keys_u % nb, packed):.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
