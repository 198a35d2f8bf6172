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


PROBES["p7_smem3d"] = COMMON + """
# 3-D int32 scalar-prefetch array indexed [k, i, j] (the SUBIV hull
# table shape) — isolates whether the subiv Mosaic crash is the SMEM
# array rank rather than the dynamic loop bounds
def kern(tab_ref, x_ref, o_ref):
    lo = tab_ref[0, pl.program_id(0), 1]
    hi = tab_ref[1, pl.program_id(0), 1]
    o_ref[...] = x_ref[...] * (hi - lo).astype(jnp.float32)

tab = jnp.tile(jnp.asarray([[[1, 2, 3]], [[4, 6, 8]]], jnp.int32), (1, 4, 1))
x = jnp.ones((32, 128), jnp.float32)
grid_spec = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=1, grid=(4,),
    in_specs=[pl.BlockSpec((8, 128), lambda i, t: (i, 0))],
    out_specs=pl.BlockSpec((8, 128), lambda i, t: (i, 0)))
out = pl.pallas_call(kern, grid_spec=grid_spec,
                     out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32))(tab, x)
np.testing.assert_allclose(np.asarray(out), 4.0)
print("VALUE-OK")
"""

PROBES["p8_dynfori"] = COMMON + """
# fori_loop with BOTH bounds dynamic (SMEM scalars), trivial body —
# isolates the dynamic-trip-count lowering
def kern(tab_ref, x_ref, o_ref):
    lo = tab_ref[pl.program_id(0), 0]
    hi = tab_ref[pl.program_id(0), 1]
    def body(j, acc):
        return acc + x_ref[...] * jnp.float32(1.0)
    o_ref[...] = jax.lax.fori_loop(lo, hi, body, jnp.zeros((8, 128), jnp.float32))

tab = jnp.tile(jnp.asarray([[1, 4]], jnp.int32), (4, 1))
x = jnp.ones((32, 128), jnp.float32)
grid_spec = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=1, grid=(4,),
    in_specs=[pl.BlockSpec((8, 128), lambda i, t: (i, 0))],
    out_specs=pl.BlockSpec((8, 128), lambda i, t: (i, 0)))
out = pl.pallas_call(kern, grid_spec=grid_spec,
                     out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32))(tab, x)
np.testing.assert_allclose(np.asarray(out), 3.0)
print("VALUE-OK")
"""

PROBES["p9_dynfori_unroll"] = COMMON + """
# dynamic-bound fori whose body contains cond + a fully-unrolled static
# inner fori with SMEM scalar loads at a dynamic base — the exact subiv
# run_chunk structure in miniature
def kern(tab_ref, sm_ref, x_ref, o_ref):
    lo = tab_ref[pl.program_id(0), 0]
    hi = tab_ref[pl.program_id(0), 1]
    x = x_ref[...]
    def sub_body(si, acc):
        v = sm_ref[si, 0]
        enter = x * v > -1.0
        def run(a):
            def tri(k, a2):
                return a2 + x * sm_ref[si, k]
            return jax.lax.fori_loop(0, 4, tri, a, unroll=4)
        return jax.lax.cond(jnp.any(enter), run, lambda a: a, acc)
    o_ref[...] = jax.lax.fori_loop(lo, hi, sub_body,
                                   jnp.zeros((8, 128), jnp.float32))

tab = jnp.tile(jnp.asarray([[1, 3]], jnp.int32), (4, 1))
sm = jnp.ones((8, 4), jnp.float32)
x = jnp.ones((32, 128), jnp.float32)
grid_spec = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=1, grid=(4,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
              pl.BlockSpec((8, 128), lambda i, t: (i, 0))],
    out_specs=pl.BlockSpec((8, 128), lambda i, t: (i, 0)))
out = pl.pallas_call(kern, grid_spec=grid_spec,
                     out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32))(tab, sm, x)
np.testing.assert_allclose(np.asarray(out), 8.0)
print("VALUE-OK")
"""


PROBES["p10_statfori_cond"] = COMMON + """
# STATIC-bound fori whose body gates on a scalar hull compare (the
# subiv fallback: keeps the loop static, adds one cond level keyed on
# (si >= lo) & (si < hi) — no dynamic shift, no dynamic trip count)
def kern(tab_ref, sm_ref, x_ref, o_ref):
    lo = tab_ref[pl.program_id(0), 0]
    hi = tab_ref[pl.program_id(0), 1]
    x = x_ref[...]
    def sub_body(si, acc):
        inb = (si >= lo) & (si < hi)
        def run(a):
            def tri(k, a2):
                return a2 + x * sm_ref[si, k]
            return jax.lax.fori_loop(0, 4, tri, a, unroll=4)
        return jax.lax.cond(inb, run, lambda a: a, acc)
    o_ref[...] = jax.lax.fori_loop(0, 8, sub_body,
                                   jnp.zeros((8, 128), jnp.float32))

tab = jnp.tile(jnp.asarray([[1, 3]], jnp.int32), (4, 1))
sm = jnp.ones((8, 4), jnp.float32)
x = jnp.ones((32, 128), jnp.float32)
grid_spec = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=1, grid=(4,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
              pl.BlockSpec((8, 128), lambda i, t: (i, 0))],
    out_specs=pl.BlockSpec((8, 128), lambda i, t: (i, 0)))
out = pl.pallas_call(kern, grid_spec=grid_spec,
                     out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32))(tab, sm, x)
np.testing.assert_allclose(np.asarray(out), 8.0)
print("VALUE-OK")
"""

PROBES["p11_dynshift"] = COMMON + """
# dynamic scalar shift inside a static fori (the SUBBITS bitmask gate)
def kern(tab_ref, sm_ref, x_ref, o_ref):
    bits = tab_ref[pl.program_id(0), 0]
    x = x_ref[...]
    def sub_body(si, acc):
        bit = jax.lax.shift_right_logical(bits, si) & 1
        def run(a):
            def tri(k, a2):
                return a2 + x * sm_ref[si, k]
            return jax.lax.fori_loop(0, 4, tri, a, unroll=4)
        return jax.lax.cond(bit != 0, run, lambda a: a, acc)
    o_ref[...] = jax.lax.fori_loop(0, 8, sub_body,
                                   jnp.zeros((8, 128), jnp.float32))

tab = jnp.tile(jnp.asarray([[6]], jnp.int32), (4, 1))  # bits 1,2 set
sm = jnp.ones((8, 4), jnp.float32)
x = jnp.ones((32, 128), jnp.float32)
grid_spec = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=1, grid=(4,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
              pl.BlockSpec((8, 128), lambda i, t: (i, 0))],
    out_specs=pl.BlockSpec((8, 128), lambda i, t: (i, 0)))
out = pl.pallas_call(kern, grid_spec=grid_spec,
                     out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32))(tab, sm, x)
np.testing.assert_allclose(np.asarray(out), 8.0)
print("VALUE-OK")
"""


PROBES["p12_cond_dynfori"] = COMMON + """
# dynamic-bound fori INSIDE a lax.cond branch (the subiv run_chunk
# nesting: cond(any(entered)) -> fori(lo, hi)) — p9 tested the inverse
def kern(tab_ref, sm_ref, x_ref, o_ref):
    lo = tab_ref[pl.program_id(0), 0]
    hi = tab_ref[pl.program_id(0), 1]
    x = x_ref[...]
    def sub_body(si, acc):
        def run(a):
            def tri(k, a2):
                return a2 + x * sm_ref[si, k]
            return jax.lax.fori_loop(0, 4, tri, a, unroll=4)
        return jax.lax.cond(jnp.any(x * sm_ref[si, 0] > -1.0), run,
                            lambda a: a, acc)
    def run_chunk(b):
        return jax.lax.fori_loop(lo, hi, sub_body, b)
    o_ref[...] = jax.lax.cond(jnp.any(x > 0.0), run_chunk, lambda b: b,
                              jnp.zeros((8, 128), jnp.float32))

tab = jnp.tile(jnp.asarray([[1, 3]], jnp.int32), (4, 1))
sm = jnp.ones((8, 4), jnp.float32)
x = jnp.ones((32, 128), jnp.float32)
grid_spec = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=1, grid=(4,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
              pl.BlockSpec((8, 128), lambda i, t: (i, 0))],
    out_specs=pl.BlockSpec((8, 128), lambda i, t: (i, 0)))
out = pl.pallas_call(kern, grid_spec=grid_spec,
                     out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32))(tab, sm, x)
np.testing.assert_allclose(np.asarray(out), 8.0)
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
