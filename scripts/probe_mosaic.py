"""Probe which Mosaic lowerings the row-bundle trace kernel can rely on.

Each probe is one tiny pallas kernel compiled + executed on the real chip
in its own subprocess (a Mosaic HTTP 500 poisons the client that hit it —
PERF.md). Results print PROBE <name> OK/FAIL <detail>.

Probes (written for the retired row-bundle engine — measured 0.58-0.73x
of the scalar-broadcast engine and removed, see PERF.md — but the
lowering facts remain the constraints every future kernel designs to):
  p1_dynrow    — unaligned (1,128) sublane slice load/store at a dynamic
                 row index on a VMEM window ref
  p2_valslice  — static (1,128) slice of a loaded (8,128) value +
                 iota-select merge + aligned dynamic (8,128) load/store
  p3_repload   — (8,128) load from a big VMEM window at a dynamic
                 sublane offset (multiple of 8), i.e. the replicated
                 triangle-constant fetch
  p4_nest      — fori { cond { fori { cond { fori } } } } legalization
  p6_subred    — sublane min-reduce + broadcasted-iota slot select
"""

from __future__ import annotations

import os
import subprocess
import sys

PROBES = {}

COMMON = """
import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
"""

PROBES["p1_dynrow"] = COMMON + """
def kern(x_ref, o_ref):
    def body(j, acc):
        row = x_ref[pl.ds(j, 1), :]            # (1,128) dynamic row load
        o_ref[pl.ds(j, 1), :] = row * 2.0      # dynamic row store
        return acc + jnp.sum(row)
    jax.lax.fori_loop(0, 8, body, 0.0)

x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
out = pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(x)
np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2.0)
print("VALUE-OK")
"""

PROBES["p2_valslice"] = COMMON + """
def kern(x_ref, o_ref):
    def body(kb, acc):
        blk = x_ref[pl.ds(kb * 8, 8), :]       # aligned dynamic (8,128) load
        accblk = jnp.zeros((8, 128), jnp.float32)
        si = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        for j in range(8):                      # static row unroll
            row = blk[j:j + 1, :]               # static (1,128) value slice
            r2 = jnp.broadcast_to(row * 3.0, (8, 128))
            accblk = jnp.where(si == j, r2, accblk)
        o_ref[pl.ds(kb * 8, 8), :] = accblk    # aligned dynamic store
        return acc
    jax.lax.fori_loop(0, 4, body, 0.0)

x = jnp.arange(32 * 128, dtype=jnp.float32).reshape(32, 128)
out = pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32))(x)
np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 3.0)
print("VALUE-OK")
"""

PROBES["p3_repload"] = COMMON + """
def kern(tab_ref, o_ref):
    def body(g, acc):
        blk = tab_ref[pl.ds(g * 16, 8), :]     # (8,128) at dynamic offset
        return acc + blk
    o_ref[...] = jax.lax.fori_loop(0, 8, body, jnp.zeros((8, 128), jnp.float32))

tab = jnp.arange(128 * 128, dtype=jnp.float32).reshape(128, 128)
out = pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(tab)
ref = sum(np.asarray(tab)[g * 16:g * 16 + 8] for g in range(8))
np.testing.assert_allclose(np.asarray(out), ref)
print("VALUE-OK")
"""

PROBES["p4_nest"] = COMMON + """
def kern(x_ref, o_ref):
    def outer(kb, acc):
        def mid(b, a2):
            def run(a3):
                def inner(g, a4):
                    def run2(a5):
                        def core(t, a6):
                            return a6 + x_ref[0, 0]
                        return jax.lax.fori_loop(0, 2, core, a5)
                    return jax.lax.cond(a4 < 1e9, run2, lambda z: z, a4)
                return jax.lax.fori_loop(0, 2, inner, a3)
            return jax.lax.cond(a2 < 1e9, run, lambda z: z, a2)
        return jax.lax.fori_loop(0, 2, mid, acc)
    r = jax.lax.fori_loop(0, 2, outer, 0.0)
    o_ref[...] = jnp.zeros((8, 128), jnp.float32) + r

x = jnp.ones((8, 128), jnp.float32)
out = pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(x)
np.testing.assert_allclose(np.asarray(out), np.full((8, 128), 16.0))
print("VALUE-OK")
"""

PROBES["p6_subred"] = COMMON + """
def kern(x_ref, p_ref, o_ref, q_ref):
    x = x_ref[...]
    p = p_ref[...]
    tmin = jnp.min(x, axis=0, keepdims=True)            # sublane reduce
    is_t = x == tmin
    pmin = jnp.min(jnp.where(is_t, p, 3.4e38), axis=0, keepdims=True)
    sel = is_t & (p == pmin)
    si = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    smin = jnp.min(jnp.where(sel, si, 8), axis=0, keepdims=True)
    sel2 = sel & (si == smin)
    u = jnp.sum(jnp.where(sel2, p * 2.0, 0.0), axis=0, keepdims=True)
    o_ref[...] = jnp.broadcast_to(tmin, (8, 128))
    q_ref[...] = jnp.broadcast_to(u, (8, 128))

key = jax.random.PRNGKey(0)
x = jax.random.uniform(key, (8, 128))
p = jnp.asarray(np.random.RandomState(1).permutation(8 * 128).reshape(8, 128), jnp.float32)
out, q = pl.pallas_call(kern, out_shape=(jax.ShapeDtypeStruct((8, 128), jnp.float32),) * 2)(x, p)
xm = np.asarray(x).min(axis=0)
np.testing.assert_allclose(np.asarray(out)[0], xm)
print("VALUE-OK")
"""


def main() -> None:
    names = sys.argv[1:] or list(PROBES)
    for name in names:
        proc = subprocess.run(
            [sys.executable, "-c", PROBES[name]],
            capture_output=True, text=True, timeout=900,
        )
        if proc.returncode == 0 and "VALUE-OK" in proc.stdout:
            print(f"PROBE {name} OK")
        else:
            tail = (proc.stderr.strip().splitlines() or ["?"])[-1][:200]
            print(f"PROBE {name} FAIL {tail}")


if __name__ == "__main__":
    main()
