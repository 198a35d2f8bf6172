"""Bucketed vs dense BTF lane decode (models/pathtracer._btf_colors).

The bucketed path compacts decode lanes to a prefix with a
multi-operand sort and decodes only a static window. The decode chain is
lanewise (gathers + elementwise), but XLA codegen (FMA contraction /
vectorization) depends on the batch shape, so different window sizes
produce ULP-level input differences — and the decode QUANTIZES
(angle/texel -> table index), so a rare lane whose angle sits within a
ULP of a cell boundary lands in the neighboring cell (amplified near
arccos poles). Assert: non-decode lanes exactly 1, almost all decode
lanes tightly equal, boundary-flip lanes <1%.
"""

import types

import jax.numpy as jnp
import numpy as np

import raytracerfacility_tpu.models.pathtracer as pt
from raytracerfacility_tpu.mlvq.btf import table_from_data
from tests.test_mlvq import synthetic_btf


def _inputs(seed, n):
    rng = np.random.default_rng(seed)
    unit = lambda a: a / np.linalg.norm(a, axis=-1, keepdims=True)
    tex = rng.uniform(0, 1, (n, 2)).astype(np.float32)
    view = unit(rng.normal(size=(n, 3))).astype(np.float32)
    illum = unit(rng.normal(size=(n, 3))).astype(np.float32)
    normal = unit(rng.normal(size=(n, 3))).astype(np.float32)
    tangent = unit(np.cross(normal, np.roll(normal, 1, axis=-1))).astype(
        np.float32)
    mask = rng.uniform(size=n) < 0.2
    bidx = rng.integers(0, 2, n).astype(np.int32)
    return mask, bidx, tex, view, illum, normal, tangent


def test_bucketed_matches_dense(monkeypatch):
    n = 4096  # smallest bucketed size; windows exercise R//16..R//4
    scene = types.SimpleNamespace(btf=(
        table_from_data(synthetic_btf(seed=3)),
        table_from_data(synthetic_btf(seed=4)),
    ))
    args = tuple(jnp.asarray(a) for a in _inputs(7, n))

    monkeypatch.setattr(pt, "_BTF_BUCKET", False)
    dense = np.asarray(pt._btf_colors(scene, *args))
    monkeypatch.setattr(pt, "_BTF_BUCKET", True)
    bucketed = np.asarray(pt._btf_colors(scene, *args))

    mask = np.asarray(args[0])
    assert np.all(bucketed[~mask] == 1.0)
    close = np.isclose(bucketed, dense, rtol=1e-5, atol=1e-4).all(axis=-1)
    n_flip = int((~close[mask]).sum())
    assert n_flip <= 0.01 * mask.sum(), f"{n_flip} boundary flips"


def test_bucketed_full_window(monkeypatch):
    # every lane decodes -> the cascade takes the full-pool window
    n = 4096
    scene = types.SimpleNamespace(btf=(table_from_data(synthetic_btf(seed=5)),))
    mask, bidx, *rest = _inputs(11, n)
    mask = np.ones(n, bool)
    bidx = np.zeros(n, np.int32)
    args = tuple(jnp.asarray(a) for a in (mask, bidx, *rest))

    monkeypatch.setattr(pt, "_BTF_BUCKET", False)
    dense = np.asarray(pt._btf_colors(scene, *args))
    monkeypatch.setattr(pt, "_BTF_BUCKET", True)
    bucketed = np.asarray(pt._btf_colors(scene, *args))
    # same shape as the dense graph, but the sort permutation changes
    # XLA's fusion/vector groupings too -> same rare-boundary-flip bound
    close = np.isclose(bucketed, dense, rtol=1e-5, atol=1e-4).all(axis=-1)
    n_flip = int((~close).sum())
    assert n_flip <= 0.01 * n, f"{n_flip} boundary flips"
