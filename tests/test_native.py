"""Native C++ host runtime vs numpy fallbacks."""

import numpy as np
import pytest

from raytracerfacility_tpu import native
from raytracerfacility_tpu.scene import make_sphere


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no compiler)")
    return lib


def test_parse_numeric_file(tmp_path, lib):
    path = tmp_path / "arr.txt"
    rows, cols = 3, 4
    vals = np.arange(12, dtype=np.float32) * 1.5 - 3.0
    with open(path, "w") as f:
        f.write(f"{rows} {cols} {vals.min()} {vals.max()}\n")
        f.write(" ".join(str(v) for v in vals))
    r, c, data = native.parse_numeric_file(str(path), np.float32)
    assert (r, c) == (rows, cols)
    np.testing.assert_allclose(data, vals)
    # int parse (large values survive the double intermediate)
    ivals = np.array([1 << 30, 123456789, -5, 0], np.int32)
    with open(path, "w") as f:
        f.write(f"1 4 {ivals.min()} {ivals.max()}\n")
        f.write(" ".join(str(v) for v in ivals))
    _, _, idata = native.parse_numeric_file(str(path), np.int32)
    np.testing.assert_array_equal(idata, ivals)


def test_pack_corners_matches_numpy(lib):
    mesh = make_sphere(0.7, rings=6, sectors=8)
    rng = np.random.default_rng(0)
    transform = np.eye(4, dtype=np.float32)
    transform[:3, :3] = rng.normal(0, 1, (3, 3)).astype(np.float32)
    transform[:3, 3] = (1.0, -2.0, 0.5)
    arrays = {
        "positions": mesh.positions,
        "normals": mesh.normals,
        "tangents": mesh.tangents,
        "colors": mesh.colors,
        "tex_coords": mesh.tex_coords,
        "data": mesh.data,
    }
    got = native.pack_corners(arrays, mesh.triangles, transform)
    assert got is not None

    # numpy reference
    pos = mesh.positions @ transform[:3, :3].T + transform[:3, 3]
    nrm = mesh.normals @ transform[:3, :3].T
    tan = mesh.tangents @ transform[:3, :3].T
    t = mesh.triangles
    v0 = pos[t[:, 0]]
    np.testing.assert_allclose(got["v0"], v0, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got["e1"], pos[t[:, 1]] - v0, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got["e2"], pos[t[:, 2]] - v0, rtol=1e-5, atol=1e-5)
    want_n = np.stack([nrm[t[:, 0]], nrm[t[:, 1]], nrm[t[:, 2]]], axis=1)
    np.testing.assert_allclose(got["normal"], want_n, rtol=1e-5, atol=1e-5)
    want_c = np.stack(
        [mesh.colors[t[:, 0]], mesh.colors[t[:, 1]], mesh.colors[t[:, 2]]], axis=1
    )
    np.testing.assert_allclose(got["color"], want_c)
    want_uv = np.stack(
        [mesh.tex_coords[t[:, 0]], mesh.tex_coords[t[:, 1]], mesh.tex_coords[t[:, 2]]],
        axis=1,
    )
    np.testing.assert_allclose(got["tex_coord"], want_uv)
    np.testing.assert_allclose(got["tangent"],
                               np.stack([tan[t[:, 0]], tan[t[:, 1]], tan[t[:, 2]]], axis=1),
                               rtol=1e-5, atol=1e-5)


def test_vertex_normals_match(lib):
    mesh = make_sphere(1.0, rings=8, sectors=12)
    got = native.compute_vertex_normals(mesh.positions, mesh.triangles)
    # numpy reference (same accumulation)
    v0 = mesh.positions[mesh.triangles[:, 0]]
    v1 = mesh.positions[mesh.triangles[:, 1]]
    v2 = mesh.positions[mesh.triangles[:, 2]]
    face_n = np.cross(v1 - v0, v2 - v0)
    want = np.zeros_like(mesh.positions)
    for corner in range(3):
        np.add.at(want, mesh.triangles[:, corner], face_n)
    norm = np.linalg.norm(want, axis=-1, keepdims=True)
    want = want / np.maximum(norm, 1e-12)
    mask = norm[:, 0] > 1e-10
    np.testing.assert_allclose(got[mask], want[mask], rtol=1e-4, atol=1e-4)


def test_skinning_matches_numpy(lib):
    rng = np.random.default_rng(1)
    n, b = 50, 6
    positions = rng.normal(0, 1, (n, 3)).astype(np.float32)
    normals = rng.normal(0, 1, (n, 3)).astype(np.float32)
    tangents = rng.normal(0, 1, (n, 3)).astype(np.float32)
    bone_ids = rng.integers(0, b, (n, 8)).astype(np.int32)
    bone_ids[:, 4:] = -1
    weights = rng.uniform(0, 1, (n, 8)).astype(np.float32)
    weights[:, 4:] = 0.0
    weights /= weights.sum(axis=1, keepdims=True)
    mats = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))
    for i in range(b):
        mats[i, :3, 3] = rng.normal(0, 1, 3)
        mats[i, :3, :3] += rng.normal(0, 0.1, (3, 3))
    got_p, got_n, got_t = native.skin_vertices(
        positions, normals, tangents, bone_ids, weights, mats
    )
    ids = np.maximum(bone_ids, 0)
    blended = np.sum(mats[ids] * weights[..., None, None], axis=1)
    want_p = np.einsum("nij,nj->ni", blended[:, :3, :3], positions) + blended[:, :3, 3]
    want_n = np.einsum("nij,nj->ni", blended[:, :3, :3], normals)
    np.testing.assert_allclose(got_p, want_p, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got_n, want_n, rtol=1e-4, atol=1e-5)
    del got_t
