"""On-chip measurement of ray-reorder primitives (round 3).

Decides the inter-segment reorder design: the fused bucket transpose
needs a permutation of ~8-24 state planes at 2M rays per bounce segment
for < ~10 ms. Candidates:
  A. multi-operand jax.lax.sort (all planes as operands)
  B. argsort keys + per-plane gathers
  C. argsort keys + ONE row-gather of state packed as (R, C)
  D. cumsum-based counting-rank (K buckets) + row-gather
Run on the real chip: python scripts/measure_reorder.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

R = 2_073_600  # 1080p rays


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    key = jax.random.PRNGKey(0)
    keys_u = jax.random.randint(key, (R,), 0, 64, dtype=jnp.int32)
    planes = [jax.random.uniform(jax.random.fold_in(key, i), (R,))
              for i in range(8)]
    packed8 = jnp.stack(planes, axis=-1)  # (R, 8)
    packed24 = jnp.concatenate([packed8] * 3, axis=-1)  # (R, 24)
    perm = jax.random.permutation(key, R)

    # A: multi-operand sort, 8 payload planes
    @jax.jit
    def sort_multi(k, *ps):
        return jax.lax.sort((k,) + ps, num_keys=1)

    print("A  sort key + 8 planes:", timeit(sort_multi, keys_u, *planes), "ms")

    # argsort alone
    @jax.jit
    def argsort_only(k):
        return jnp.argsort(k)

    print("B0 argsort keys:", timeit(argsort_only, keys_u), "ms")

    # B: 8 separate plane gathers
    @jax.jit
    def gather_planes(p, *ps):
        return tuple(x[p] for x in ps)

    print("B1 8 plane gathers:", timeit(gather_planes, perm, *planes), "ms")

    # C: one row gather (R, 8) and (R, 24)
    @jax.jit
    def gather_rows(p, m):
        return m[p]

    print("C8  row gather (R,8):", timeit(gather_rows, perm, packed8), "ms")
    print("C24 row gather (R,24):", timeit(gather_rows, perm, packed24), "ms")

    # C': take_along_axis form
    @jax.jit
    def gather_rows_ta(p, m):
        return jnp.take(m, p, axis=0)

    print("C24t take axis0 (R,24):", timeit(gather_rows_ta, perm, packed24), "ms")

    # D: counting-rank via cumsum of one-hot (K=64)
    @jax.jit
    def counting_rank(k):
        oh = jax.nn.one_hot(k, 64, dtype=jnp.int32)  # (R, 64)
        within = jnp.cumsum(oh, axis=0) - oh  # exclusive intra-bucket rank
        totals = jnp.sum(oh, axis=0)
        starts = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                  jnp.cumsum(totals)[:-1]])
        dest = jnp.sum(oh * (starts[None, :] + within), axis=-1)
        return dest

    print("D  counting rank K=64:", timeit(counting_rank, keys_u), "ms")

    # D2: rank via 2x sort trick is just argsort(argsort) -- skip.

    # E: scatter rows (inverse permutation apply) -- needed if we compute
    # dest[i] instead of src[i]
    @jax.jit
    def scatter_rows(p, m):
        return jnp.zeros_like(m).at[p].set(m)

    print("E  row scatter (R,24):", timeit(scatter_rows, perm, packed24), "ms")

    # F: pack/unpack cost: 24 planes <-> (R, 24)
    planes24 = [jax.random.uniform(jax.random.fold_in(key, 100 + i), (R,))
                for i in range(24)]

    @jax.jit
    def pack(*ps):
        return jnp.stack(ps, axis=-1)

    @jax.jit
    def unpack(m):
        return tuple(m[:, i] for i in range(24))

    print("F  pack 24 planes:", timeit(pack, *planes24), "ms")
    print("F' unpack 24 planes:", timeit(unpack, packed24), "ms")

    # G: fused pack+gather+unpack (what the real pipeline would do)
    @jax.jit
    def fused_reorder(p, *ps):
        m = jnp.stack(ps, axis=-1)
        m = m[p]
        return tuple(m[:, i] for i in range(len(ps)))

    print("G  stack+rowgather+unstack 24:", timeit(fused_reorder, perm, *planes24), "ms")

    # H: sort with packed payload: key + iota + ... can lax.sort take a
    # matrix operand? operands must have equal shapes; R,24 vs R no.
    # H: argsort then fused_reorder end to end
    @jax.jit
    def end_to_end(k, *ps):
        p = jnp.argsort(k)
        m = jnp.stack(ps, axis=-1)
        m = m[p]
        return tuple(m[:, i] for i in range(len(ps)))

    print("H  argsort+reorder24 e2e:", timeit(end_to_end, keys_u, *planes24), "ms")


if __name__ == "__main__":
    main()
