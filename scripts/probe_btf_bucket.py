"""Isolate _btf_colors dense vs bucketed on-chip at the bench's lane
count (65536), sweeping the decode-lane fraction. Fenced per PERF.md.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_btf_bucket.py
"""

import os
import time
import types

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_rtf")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np


def fence(x):
    return float(jnp.sum(x.reshape(-1)[:1]))


def tm(fn, *args, n=5):
    fence(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        fence(fn(*args))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import raytracerfacility_tpu.models.pathtracer as pt
    from raytracerfacility_tpu.mlvq.btf import table_from_data
    from raytracerfacility_tpu.mlvq.synthetic import synthetic_btf

    R = 65536
    rng = np.random.default_rng(0)
    unit = lambda a: a / np.linalg.norm(a, axis=-1, keepdims=True)
    nrm = unit(rng.normal(size=(R, 3)))
    tex = jnp.asarray(rng.uniform(0, 1, (R, 2)), jnp.float32)
    view = jnp.asarray(unit(rng.normal(size=(R, 3))), jnp.float32)
    illum = jnp.asarray(unit(rng.normal(size=(R, 3))), jnp.float32)
    normal = jnp.asarray(nrm, jnp.float32)
    tangent = jnp.asarray(unit(np.cross(nrm, np.roll(nrm, 1, -1))),
                          jnp.float32)
    bidx = jnp.zeros(R, jnp.int32)
    scene = types.SimpleNamespace(btf=(table_from_data(synthetic_btf(seed=2)),))

    base = tm(jax.jit(lambda x: x + 1.0), tex)
    print(f"fence baseline {base:.1f} ms", flush=True)

    K = 32  # amplify above fence noise: K chained decodes in one jit

    def chain(m):
        def body(c, _):
            # vary uv with the carry so XLA cannot hoist the decode
            val = pt._btf_colors(scene, m, bidx,
                                 jnp.mod(tex + c[:, :2] * 1e-6, 1.0),
                                 view, illum, normal, tangent)
            return val, None
        out, _ = jax.lax.scan(body, jnp.zeros((R, 3), jnp.float32),
                              None, length=K)
        return out

    for frac in (1.0, 0.5, 0.2, 0.05):
        mask = jnp.asarray(rng.uniform(size=R) < frac)
        f = jax.jit(chain)
        pt._BTF_BUCKET = False
        jax.clear_caches()
        d = tm(f, mask)
        pt._BTF_BUCKET = True
        jax.clear_caches()
        b = tm(f, mask)
        print(f"frac {frac:4.2f}: dense {(d - base) / K:7.2f} ms/call   "
              f"bucketed {(b - base) / K:7.2f} ms/call", flush=True)


if __name__ == "__main__":
    main()
