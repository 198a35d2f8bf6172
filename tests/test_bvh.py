"""LBVH build + threaded traversal vs the brute-force oracle
(SURVEY.md section 4 test pyramid item (c))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracerfacility_tpu.ops.bvh import build_bvh, morton_codes
from raytracerfacility_tpu.ops.intersect import (
    trace_any_bruteforce,
    trace_closest_bruteforce,
)
from raytracerfacility_tpu.ops.traverse import trace_any_bvh, trace_closest_bvh


def random_soup(n, seed=0, spread=4.0):
    rng = np.random.default_rng(seed)
    v0 = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.7, (n, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.7, (n, 3)).astype(np.float32)
    return jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2)


def random_rays(r, seed=1, spread=6.0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-spread, spread, (r, 3)).astype(np.float32)
    d = rng.normal(0, 1, (r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.parametrize("n,leaf", [(1, 4), (2, 1), (7, 2), (63, 4), (500, 4)])
def test_closest_matches_oracle(n, leaf):
    v0, e1, e2 = random_soup(n, seed=n)
    o, d = random_rays(256, seed=n + 1)
    tmin = jnp.float32(0.0)
    tmax = jnp.float32(1e20)
    oracle = trace_closest_bruteforce(v0, e1, e2, o, d, tmin, tmax)
    bvh = build_bvh(v0, e1, e2, leaf_size=leaf)
    got = trace_closest_bvh(bvh, None, o, d, tmin, tmax)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(oracle.hit))
    hits = np.asarray(oracle.hit)
    np.testing.assert_allclose(
        np.asarray(got.t)[hits], np.asarray(oracle.t)[hits], rtol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(got.prim)[hits], np.asarray(oracle.prim)[hits]
    )


def test_any_matches_oracle():
    v0, e1, e2 = random_soup(300, seed=7)
    o, d = random_rays(512, seed=8)
    tmin = jnp.float32(1e-3)
    tmax = jnp.float32(1e20)
    oracle = trace_any_bruteforce(v0, e1, e2, o, d, tmin, tmax)
    bvh = build_bvh(v0, e1, e2, leaf_size=4)
    got = trace_any_bvh(bvh, None, o, d, tmin, tmax)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(oracle))


def test_duplicate_positions_no_hang():
    """Instanced-canopy pathology: many identical Morton codes must still
    give a shallow tree (index tie-break) and correct results."""
    v0, e1, e2 = random_soup(16, seed=3)
    v0 = jnp.tile(v0, (16, 1))  # 256 tris, 16x duplicated
    e1 = jnp.tile(e1, (16, 1))
    e2 = jnp.tile(e2, (16, 1))
    o, d = random_rays(128, seed=4)
    oracle = trace_closest_bruteforce(v0, e1, e2, o, d, 0.0, 1e20)
    bvh = build_bvh(v0, e1, e2, leaf_size=4)
    got = trace_closest_bvh(bvh, None, o, d, jnp.float32(0.0), jnp.float32(1e20))
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(oracle.hit))
    hits = np.asarray(oracle.hit)
    np.testing.assert_allclose(
        np.asarray(got.t)[hits], np.asarray(oracle.t)[hits], rtol=1e-4
    )


def test_degenerate_padding_triangles():
    """Zero-area padding triangles (scene builder pad) never produce hits."""
    v0, e1, e2 = random_soup(60, seed=9)
    pad = jnp.zeros((68, 3))
    v0 = jnp.concatenate([v0, pad])
    e1 = jnp.concatenate([e1, pad])
    e2 = jnp.concatenate([e2, pad])
    o, d = random_rays(128, seed=10)
    bvh = build_bvh(v0, e1, e2, leaf_size=4)
    got = trace_closest_bvh(bvh, None, o, d, jnp.float32(0.0), jnp.float32(1e20))
    assert np.all(np.asarray(got.prim)[np.asarray(got.hit)] < 60)


def test_morton_order():
    pts = jnp.array([[0.1, 0.1, 0.1], [0.9, 0.9, 0.9], [0.1, 0.9, 0.1]])
    lo = jnp.zeros(3)
    hi = jnp.ones(3)
    codes = morton_codes(pts, lo, hi)
    assert codes[0] < codes[1]  # near origin sorts first


def test_jit_build():
    v0, e1, e2 = random_soup(128, seed=11)
    built = jax.jit(lambda a, b, c: build_bvh(a, b, c, leaf_size=4))(v0, e1, e2)
    assert built.num_nodes == 255
