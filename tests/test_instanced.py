"""Parity of the shared-geometry instanced trace kernel
(ops/pallas_inst.py, interpret mode on CPU) against an XLA oracle that
runs the IDENTICAL object-space math per instance, and a cross-check
against the denormalized world-space bake.

The instanced engine is the TPU-native analog of the reference's
IAS/GAS BLAS sharing (ref RayTracer.cu:1618-1715): O(unique triangles)
memory, per-step world->object ray transform in-kernel.
"""

import numpy as np
import jax.numpy as jnp

from raytracerfacility_tpu.ops.intersect import trace_closest_bruteforce
from raytracerfacility_tpu.ops.pallas_inst import (
    pack_instanced_tables,
    trace_closest_instanced,
)


def _geom(n, seed, scale=1.0):
    rng = np.random.default_rng(seed)
    v0 = (rng.standard_normal((n, 3)) * scale).astype(np.float32)
    e1 = (rng.standard_normal((n, 3)) * 0.5 * scale).astype(np.float32)
    e2 = (rng.standard_normal((n, 3)) * 0.5 * scale).astype(np.float32)
    return v0, e1, e2


def _mat(tx, ty, tz, s=1.0, rot=0.0):
    c, sn = np.cos(rot), np.sin(rot)
    m = np.array([
        [s * c, -s * sn, 0.0, tx],
        [s * sn, s * c, 0.0, ty],
        [0.0, 0.0, s, tz],
        [0.0, 0.0, 0.0, 1.0],
    ], np.float32)
    return m


def _scene():
    geoms = [_geom(300, 0), _geom(520, 1, scale=0.7)]
    inst_geom = np.array([0, 0, 1, 0, 1], np.int32)
    mats = [
        _mat(0.0, 0.0, 0.0),
        _mat(3.0, 0.5, -1.0, s=0.6, rot=0.8),
        _mat(-2.5, 1.0, 0.5, s=1.3, rot=-0.4),
        _mat(0.5, -2.0, 2.0, s=0.9, rot=2.1),
        _mat(1.5, 2.5, -2.0, s=1.1, rot=1.3),
    ]
    return geoms, inst_geom, mats


def _rays(r, seed=3):
    rng = np.random.default_rng(seed)
    o = jnp.asarray((rng.standard_normal((r, 3)) * 4).astype(np.float32))
    d = rng.standard_normal((r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, jnp.asarray(d)


def _oracle(geoms, inst_geom, tables, o, d, tmin, tmax):
    """Per-instance object-space trace through the XLA oracle, merged
    with the kernel's lexicographic (t, instance, prim) rule. The ray
    transform reads the SAME f32 inverse rows the kernel does
    (tables['inst']) with the same evaluation order."""
    inst = np.asarray(tables["inst"])
    bases = np.cumsum([0] + [g[0].shape[0] for g in geoms])[:-1]
    r = o.shape[0]
    best_t = jnp.asarray(tmax)
    best_prim = jnp.full((r,), -1, jnp.int32)
    best_iid = jnp.full((r,), -1, jnp.int32)
    best_u = jnp.zeros((r,), jnp.float32)
    best_v = jnp.zeros((r,), jnp.float32)
    for i in range(inst.shape[0]):
        a = inst[i]
        ox = a[0] * o[:, 0] + a[1] * o[:, 1] + a[2] * o[:, 2] + a[9]
        oy = a[3] * o[:, 0] + a[4] * o[:, 1] + a[5] * o[:, 2] + a[10]
        oz = a[6] * o[:, 0] + a[7] * o[:, 1] + a[8] * o[:, 2] + a[11]
        dx = a[0] * d[:, 0] + a[1] * d[:, 1] + a[2] * d[:, 2]
        dy = a[3] * d[:, 0] + a[4] * d[:, 1] + a[5] * d[:, 2]
        dz = a[6] * d[:, 0] + a[7] * d[:, 1] + a[8] * d[:, 2]
        g = int(inst_geom[i])
        v0, e1, e2 = (jnp.asarray(x) for x in geoms[g])
        res = trace_closest_bruteforce(
            v0, e1, e2, jnp.stack([ox, oy, oz], -1),
            jnp.stack([dx, dy, dz], -1), jnp.asarray(tmin),
            jnp.asarray(tmax))
        # strict < keeps the earlier (lower) instance on an exact tie —
        # the kernel's lexicographic (t, iid, prim) order
        better = res.hit & (res.t < best_t)
        best_prim = jnp.where(better, res.prim + int(bases[g]), best_prim)
        best_iid = jnp.where(better, i, best_iid)
        best_u = jnp.where(better, res.u, best_u)
        best_v = jnp.where(better, res.v, best_v)
        best_t = jnp.where(better, res.t, best_t)
    return best_t, best_prim, best_iid, best_u, best_v


def test_instanced_parity_oracle():
    geoms, inst_geom, mats = _scene()
    tables = pack_instanced_tables(geoms, inst_geom, mats,
                                   chunk=128, sub=16)
    r = 900
    o, d = _rays(r)
    tmin = jnp.full(r, 1e-3, jnp.float32)
    tmax = jnp.full(r, 100.0, jnp.float32)

    res, iid = trace_closest_instanced(tables, o, d, tmin, tmax)
    rt, rprim, riid, ru, rv = _oracle(geoms, inst_geom, tables, o, d,
                                      tmin, tmax)
    want_hit = np.asarray(riid) >= 0
    assert want_hit.sum() > 150  # the scene actually hits
    # hits land on more than one instance and both geometries
    assert len(np.unique(np.asarray(riid)[want_hit])) >= 3
    np.testing.assert_array_equal(np.asarray(res.hit), want_hit)
    np.testing.assert_array_equal(np.asarray(res.prim)[want_hit],
                                  np.asarray(rprim)[want_hit])
    np.testing.assert_array_equal(np.asarray(iid), np.asarray(riid))
    # hit DECISIONS (hit/prim/iid) are exactly equal; t agrees to FMA
    # contraction noise in the ray transform (~1 ULP on <1% of lanes —
    # Mosaic and XLA:CPU fuse the a*x + b*y + ... chains differently)
    np.testing.assert_allclose(np.asarray(res.t)[want_hit],
                               np.asarray(rt)[want_hit],
                               rtol=3e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.u)[want_hit],
                               np.asarray(ru)[want_hit],
                               rtol=1e-5, atol=1e-5)


def test_instanced_matches_denormalized_bake():
    """The same scene baked world-space (the denormalized design) agrees
    with the instanced object-space trace on essentially every lane —
    intersection math runs in different spaces, so agreement is
    statistical (silhouette-edge lanes may flip), not bitwise."""
    geoms, inst_geom, mats = _scene()
    tables = pack_instanced_tables(geoms, inst_geom, mats,
                                   chunk=128, sub=16)
    v0w, e1w, e2w = [], [], []
    for i, m in enumerate(mats):
        a, t3 = m[:3, :3], m[:3, 3]
        v0, e1, e2 = geoms[int(inst_geom[i])]
        v0w.append(v0 @ a.T + t3)
        e1w.append(e1 @ a.T)
        e2w.append(e2 @ a.T)
    v0w = jnp.asarray(np.concatenate(v0w).astype(np.float32))
    e1w = jnp.asarray(np.concatenate(e1w).astype(np.float32))
    e2w = jnp.asarray(np.concatenate(e2w).astype(np.float32))

    r = 900
    o, d = _rays(r, seed=5)
    tmin = jnp.full(r, 1e-3, jnp.float32)
    tmax = jnp.full(r, 100.0, jnp.float32)
    res, iid = trace_closest_instanced(tables, o, d, tmin, tmax)
    ref = trace_closest_bruteforce(v0w, e1w, e2w, o, d, tmin, tmax)

    hit_agree = np.asarray(res.hit) == np.asarray(ref.hit)
    assert hit_agree.mean() > 0.995
    both = np.asarray(res.hit) & np.asarray(ref.hit)
    np.testing.assert_allclose(np.asarray(res.t)[both],
                               np.asarray(ref.t)[both],
                               rtol=1e-3, atol=1e-3)


def test_instanced_memory_scaling():
    """The coverage claim itself: table memory is O(unique triangles),
    independent of instance count."""
    geoms = [_geom(256, 9)]
    mats64 = [_mat(float(i % 8), float(i // 8), 0.0) for i in range(64)]
    t64 = pack_instanced_tables(geoms, np.zeros(64, np.int32), mats64,
                                chunk=128, sub=16)
    mats4 = mats64[:4]
    t4 = pack_instanced_tables(geoms, np.zeros(4, np.int32), mats4,
                               chunk=128, sub=16)
    assert t64["table"].shape == t4["table"].shape  # shared geometry
    assert t64["inst"].shape[0] == 64
    assert t64["step_chunk"].shape[0] == 64 * t4["step_chunk"].shape[0] // 4


def test_compile_shared_instanced_from_scene():
    """The public scene API path: an INSTANCED-renderer canopy compiled
    to shared tables traces to the same image-level hits as the
    denormalized build's brute trace."""
    import jax.numpy as jnp
    from raytracerfacility_tpu.scene.builder import compile_shared_instanced
    from raytracerfacility_tpu.scene.procedural import build_canopy_scene

    scene = build_canopy_scene(rows=3, cols=3, variants=2)
    # drop the plain (DEFAULT) ground plane into the shared tables too
    tables = compile_shared_instanced(scene, chunk=256, sub=32)
    n_inst = int(tables["inst"].shape[0])
    assert n_inst >= 9 + 1  # 9 plants + ground
    assert tables["instance_material"].shape == (n_inst,)

    compiled = scene.build()  # denormalized reference
    from raytracerfacility_tpu.ops.intersect import trace_closest_bruteforce

    r = 600
    rng = np.random.default_rng(12)
    o = jnp.asarray(np.array([[0.0, 2.2, 2.2]], np.float32)
                    + np.zeros((r, 3), np.float32))
    d = (rng.standard_normal((r, 3)) * 0.5).astype(np.float32)
    d[:, 1] -= 1.2  # look down into the canopy + ground
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    tmin = jnp.full(r, 1e-3, jnp.float32)
    tmax = jnp.full(r, 100.0, jnp.float32)
    res, iid = trace_closest_instanced(tables, o, d, tmin, tmax)
    g = compiled.geometry
    ref = trace_closest_bruteforce(g.v0, g.e1, g.e2, o, d, tmin, tmax)
    hit_agree = np.asarray(res.hit) == np.asarray(ref.hit)
    assert np.asarray(ref.hit).sum() > 100
    assert hit_agree.mean() > 0.99
    both = np.asarray(res.hit) & np.asarray(ref.hit)
    np.testing.assert_allclose(np.asarray(res.t)[both],
                               np.asarray(ref.t)[both],
                               rtol=2e-3, atol=2e-3)


def test_instanced_multipass_bitexact(monkeypatch):
    """Forced tiny step windows + tile batches (the SMEM-bounded
    dispatch: best-hit planes chain across passes) must be bit-identical
    to the one-shot trace — the pass boundary is just a resumption point
    of the same visit order."""
    geoms, inst_geom, mats = _scene()
    tables = pack_instanced_tables(geoms, inst_geom, mats,
                                   chunk=128, sub=16)
    r = 900
    o, d = _rays(r, seed=11)
    tmin = jnp.full(r, 1e-3, jnp.float32)
    tmax = jnp.full(r, 100.0, jnp.float32)

    res1, iid1 = trace_closest_instanced(tables, o, d, tmin, tmax)

    # windows far below the step count force multi-pass continuation;
    # TB=1 forces one call per tile
    monkeypatch.setenv("RTF_TPU_INST_W", "8")
    monkeypatch.setenv("RTF_TPU_INST_TB", "1")
    res2, iid2 = trace_closest_instanced(tables, o, d, tmin, tmax)

    np.testing.assert_array_equal(np.asarray(res1.hit), np.asarray(res2.hit))
    np.testing.assert_array_equal(np.asarray(res1.prim), np.asarray(res2.prim))
    np.testing.assert_array_equal(np.asarray(iid1), np.asarray(iid2))
    np.testing.assert_array_equal(np.asarray(res1.t), np.asarray(res2.t))
    np.testing.assert_array_equal(np.asarray(res1.u), np.asarray(res2.u))
    np.testing.assert_array_equal(np.asarray(res1.v), np.asarray(res2.v))
