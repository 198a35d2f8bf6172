"""Pallas traversal kernel: parity vs the XLA walker (interpreter mode).

The kernel is experimental (see ops/pallas_trace.py): CPU tests validate
its semantics through the Pallas interpreter; TPU execution is exercised
manually (Mosaic lowering of this kernel is still being qualified).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import raytracerfacility_tpu.ops.pallas_trace as pt
from raytracerfacility_tpu.ops.bvh import build_bvh
from raytracerfacility_tpu.ops.traverse import trace_closest_bvh


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def interp(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pt.pl, "pallas_call", interp)
    # separate jit cache per mode
    pt._run.clear_cache()
    yield
    pt._run.clear_cache()


def test_pallas_matches_xla_walker():
    rng = np.random.default_rng(0)
    n = 300
    v0 = jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32))
    e1 = jnp.asarray(rng.normal(0, 0.5, (n, 3)).astype(np.float32))
    e2 = jnp.asarray(rng.normal(0, 0.5, (n, 3)).astype(np.float32))
    bvh = build_bvh(v0, e1, e2, leaf_size=4)
    nodes_f, tris_f = pt.pack_meta_tables(bvh)

    r = 2 * pt.BLOCK
    o = jnp.asarray(rng.uniform(-3, 3, (r, 3)).astype(np.float32))
    d = rng.normal(size=(r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)

    got = pt.trace_closest_pallas(bvh, nodes_f, tris_f, o, d, 0.0, 1e20)
    want = trace_closest_bvh(bvh, None, o, d, 0.0, 1e20)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(want.hit))
    h = np.asarray(want.hit)
    np.testing.assert_array_equal(
        np.asarray(got.prim)[h], np.asarray(want.prim)[h]
    )
    np.testing.assert_allclose(
        np.asarray(got.t)[h], np.asarray(want.t)[h], rtol=1e-4
    )


def test_meta_roundtrip_exact():
    """Exact-integer float encoding must survive for all representable
    skip/start/count values."""
    rng = np.random.default_rng(1)
    n = 4000
    v0 = jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32))
    e1 = jnp.asarray(rng.normal(0, 0.5, (n, 3)).astype(np.float32))
    e2 = jnp.asarray(rng.normal(0, 0.5, (n, 3)).astype(np.float32))
    bvh = build_bvh(v0, e1, e2, leaf_size=4)
    nodes_f, _ = pt.pack_meta_tables(bvh)
    m = bvh.num_nodes
    skip_f = np.asarray(nodes_f[:m, 6]).astype(np.int64)
    np.testing.assert_array_equal(skip_f, np.asarray(bvh.skip))
    meta = np.asarray(nodes_f[:m, 7]).astype(np.int64)
    count = meta >> 21
    start = meta & ((1 << 21) - 1)
    ref_meta = np.asarray(bvh.leaf_meta)
    np.testing.assert_array_equal(count, ref_meta >> 27)
    np.testing.assert_array_equal(start, ref_meta & ((1 << 27) - 1))
