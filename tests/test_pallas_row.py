"""Parity of the row-bundle trace engine (ops/pallas_row.py, interpret
mode on CPU) against the XLA oracle and pallas_brute — the row engine
claims BIT-IDENTICAL results (same Moller-Trumbore op order, same
lexicographic tie rule), so the asserts are exact."""

import numpy as np
import jax.numpy as jnp

from raytracerfacility_tpu.ops.intersect import trace_closest_bruteforce
from raytracerfacility_tpu.ops.pallas_brute import (
    pack_tri_table,
    trace_closest_pallas,
)
from raytracerfacility_tpu.ops.pallas_row import (
    trace_any_row,
    trace_closest_row,
)


def _random_tris(n, seed=0):
    rng = np.random.default_rng(seed)
    v0 = (rng.standard_normal((n, 3)) * 2).astype(np.float32)
    e1 = rng.standard_normal((n, 3)).astype(np.float32)
    e2 = rng.standard_normal((n, 3)).astype(np.float32)
    return jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2)


def _random_rays(r, seed=1, spread=3.0):
    rng = np.random.default_rng(seed)
    o = jnp.asarray((rng.standard_normal((r, 3)) * spread).astype(np.float32))
    d = jnp.asarray(rng.standard_normal((r, 3)).astype(np.float32))
    return o, d


def test_row_closest_parity_multichunk():
    v0, e1, e2 = _random_tris(1300)  # pads to 3 chunks
    o, d = _random_rays(700)
    tmin = jnp.full(700, 1e-3, jnp.float32)
    tmax = jnp.full(700, 100.0, jnp.float32)

    table = pack_tri_table(v0, e1, e2)
    ref = trace_closest_bruteforce(v0, e1, e2, o, d, tmin, tmax)
    got = trace_closest_row(table, o, d, tmin, tmax)
    assert int(ref.hit.sum()) > 100
    np.testing.assert_array_equal(np.asarray(ref.hit), np.asarray(got.hit))
    np.testing.assert_array_equal(np.asarray(ref.prim), np.asarray(got.prim))
    # bit-identical to the scalar-broadcast engine, not just close
    brute = trace_closest_pallas(table, o, d, tmin, tmax)
    np.testing.assert_array_equal(np.asarray(brute.t), np.asarray(got.t))
    np.testing.assert_array_equal(np.asarray(brute.u), np.asarray(got.u))
    np.testing.assert_array_equal(np.asarray(brute.v), np.asarray(got.v))
    np.testing.assert_array_equal(np.asarray(brute.prim),
                                  np.asarray(got.prim))

    occ = trace_any_row(table, o, d, tmin, tmax)
    np.testing.assert_array_equal(np.asarray(ref.hit), np.asarray(occ))


def test_row_shared_edge_exact_ties():
    """Shared mesh edges tie exactly on t; the winner must be the lowest
    ORIGINAL primitive index, matching every other engine."""
    # a quad split into two triangles sharing the diagonal, hit ON the edge
    v0 = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 1.0, 1.0]], jnp.float32)
    e1 = jnp.asarray([[1.0, 0.0, 0.0], [-1.0, 0.0, 0.0]], jnp.float32)
    e2 = jnp.asarray([[0.0, 1.0, 0.0], [0.0, -1.0, 0.0]], jnp.float32)
    o = jnp.asarray([[0.5, 0.5, 0.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    tmin = jnp.full(1, 1e-3, jnp.float32)
    tmax = jnp.full(1, 10.0, jnp.float32)
    table = pack_tri_table(v0, e1, e2)
    got = trace_closest_row(table, o, d, tmin, tmax)
    ref = trace_closest_bruteforce(v0, e1, e2, o, d, tmin, tmax)
    assert int(got.prim[0]) == int(ref.prim[0]) == 0
    assert float(got.t[0]) == float(ref.t[0]) == 1.0


def test_row_dead_lanes_and_padding():
    """Poisoned windows (tmax = -3e38) must report misses, and the padded
    ray tail must not disturb live lanes; mixed live/dead rows exercise
    the row-level cull."""
    v0, e1, e2 = _random_tris(600, seed=5)
    o, d = _random_rays(333, seed=6)
    rng = np.random.default_rng(7)
    dead = rng.random(333) < 0.5
    tmin = jnp.full(333, 1e-3, jnp.float32)
    tmax = jnp.where(jnp.asarray(dead), jnp.float32(-3.0e38),
                     jnp.float32(100.0))
    table = pack_tri_table(v0, e1, e2)
    got = trace_closest_row(table, o, d, tmin, tmax)
    ref = trace_closest_bruteforce(v0, e1, e2, o, d, tmin,
                                   jnp.full(333, 100.0, jnp.float32))
    assert not np.asarray(got.hit)[dead].any()
    live = ~dead
    np.testing.assert_array_equal(np.asarray(ref.hit)[live],
                                  np.asarray(got.hit)[live])
    np.testing.assert_array_equal(np.asarray(ref.prim)[live],
                                  np.asarray(got.prim)[live])
