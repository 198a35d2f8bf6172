"""On-chip measurement of ray-reorder primitives (round 3).

MEASUREMENT RULE (learned the hard way): on the axon-tunneled runtime,
``jax.block_until_ready`` does NOT reliably fence execution — timings
taken with it can read 100x too fast. Every sample below fences on a
scalar device->host readback of a value derived from the output.

Run on the real chip: python scripts/measure_reorder.py
(expect several minutes of remote Mosaic/XLA compiles first).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

R = 2_073_600  # 1080p rays
ROWS = R // 128


def tm(fn, *args, n=5):
    # fence on a DEPENDENT DEVICE SCALAR: np.asarray(leaf) (the original
    # version of this fence) pulls the whole array through the tunnel
    # (~10 s / 120 MB) and measures the transfer, not the compute —
    # PERF.md "second fencing trap"
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
    keys_u = jax.random.randint(key, (R,), 0, 4096, dtype=jnp.int32)
    planes = [jax.random.uniform(jax.random.fold_in(key, i), (ROWS, 128))
              for i in range(13)]

    print("fence overhead:",
          tm(jax.jit(lambda x: x * 1.000001), planes[0]), "ms", flush=True)

    @jax.jit
    def copy13(*ps):
        return tuple(x * 1.000001 for x in ps)

    print("copy 13 planes (208 MB rw):", tm(copy13, *planes), "ms",
          flush=True)

    @jax.jit
    def argsort_only(k):
        return jnp.argsort(k, stable=True)

    print("argsort 2M keys:", tm(argsort_only, keys_u), "ms", flush=True)

    @jax.jit
    def full_reorder(k, *ps):
        p = jnp.argsort(k, stable=True)
        m = jnp.stack([x.reshape(R) for x in ps], axis=-1)[p]
        return tuple(m[:, i].reshape(ROWS, 128) for i in range(len(ps)))

    print("argsort + 13-plane row-gather reorder:",
          tm(full_reorder, keys_u, *planes), "ms", flush=True)

    @jax.jit
    def multisort(k, *ps):
        return jax.lax.sort((k,) + tuple(x.reshape(R) for x in ps),
                            num_keys=1)

    print("lax.sort key + 13 payload planes:",
          tm(multisort, keys_u, *planes), "ms", flush=True)

    perm = jax.jit(lambda k: jnp.argsort(k, stable=True))(keys_u)
    perm = jax.block_until_ready(perm)

    @jax.jit
    def gather_only(p, *ps):
        m = jnp.stack([x.reshape(R) for x in ps], axis=-1)[p]
        return tuple(m[:, i].reshape(ROWS, 128) for i in range(len(ps)))

    print("13-plane gather by precomputed perm:",
          tm(gather_only, perm, *planes), "ms", flush=True)

    # block-local sort: tiles only need coherence WITHIN a sort block,
    # so sort B independent blocks (XLA batches row-wise sorts) instead
    # of one global 2M-row sort
    for nb in (8, 32, 128):
        L = R // nb

        @jax.jit
        def block_reorder(k, *ps, nb=nb, L=L):
            local = jnp.argsort(k.reshape(nb, L), axis=1, stable=True)
            p = (local
                 + (jnp.arange(nb, dtype=jnp.int32) * L)[:, None]).reshape(R)
            m = jnp.stack([x.reshape(R) for x in ps], axis=-1)[p]
            return tuple(m[:, i].reshape(ROWS, 128) for i in range(len(ps)))

        @jax.jit
        def block_argsort(k, nb=nb, L=L):
            return jnp.argsort(k.reshape(nb, L), axis=1, stable=True)

        print(f"block argsort nb={nb} (L={L}):",
              tm(block_argsort, keys_u), "ms", flush=True)
        print(f"block argsort+gather nb={nb}:",
              tm(block_reorder, keys_u, *planes), "ms", flush=True)


if __name__ == "__main__":
    main()
