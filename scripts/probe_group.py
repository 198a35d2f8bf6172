"""Minimal Mosaic probes for the row-group kernel constructs: which
construct SIGABRTs the remote compiler? Each probe is one tiny
pallas_call compiled in this process (compile success is the signal).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_group.py
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_rtf")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, LANES, GR = 32, 128, 8
SUB = 16


def probe(name, groups, unroll, conds_per_group):
    """groups sibling passes, each: cond -> fori(4 subs, cond -> fori(SUB
    tris, unroll)) over value slices + concat merge."""

    def kernel(tbl, x_ref, o_ref):
        x = x_ref[...]
        outs = []
        for g in range(groups):
            sl = slice(g * (ROWS // groups), (g + 1) * (ROWS // groups))
            xg = x[sl, :]

            def tri(j, c, xg=xg):
                return c + xg * tbl[j, 0] - tbl[j, 1]

            def sub_body(si, c, xg=xg, tri=tri):
                def run(cc):
                    return jax.lax.fori_loop(
                        0, SUB, lambda k, b: tri(si * SUB + k, b), cc,
                        unroll=unroll)
                if conds_per_group:
                    return jax.lax.cond(jnp.any(xg + si > 0.0), run,
                                        lambda cc: cc, c)
                return run(c)

            def chunk(c, xg=xg, sub_body=sub_body):
                return jax.lax.fori_loop(0, 4, sub_body, c)

            out = jax.lax.cond(jnp.any(xg > 0.0), chunk, lambda c: c, xg)
            outs.append(out)
        o_ref[...] = (outs[0] if groups == 1
                      else jnp.concatenate(outs, axis=0))

    tbl = jnp.arange(4 * SUB * 2, dtype=jnp.float32).reshape(4 * SUB, 2)
    x = jnp.ones((ROWS, LANES), jnp.float32)
    try:
        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec((ROWS, LANES), lambda: (0, 0))],
            out_specs=pl.BlockSpec((ROWS, LANES), lambda: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.float32),
        )(tbl, x)
        print(f"{name}: OK {float(out[0, 0]):.1f}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    probe("1 group, unroll16, conds", 1, SUB, True)
    probe("2 groups, unroll1, no sub conds", 2, 1, False)
    probe("2 groups, unroll1, conds", 2, 1, True)
    probe("2 groups, unroll16, conds", 2, SUB, True)
    probe("4 groups, unroll16, conds", 4, SUB, True)
