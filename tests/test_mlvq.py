"""MLVQ CompressedBTF: vectorized decode vs an independent scalar oracle,
plus text-database importer round-trip."""

import numpy as np
import jax.numpy as jnp
import pytest

from raytracerfacility_tpu.mlvq.btf import (
    BTFData,
    btf_get_value,
    compute_angles,
    table_from_data,
)
from raytracerfacility_tpu.mlvq.importer import export_btf_folder, import_btf_folder


# synthetic_btf moved into the package (bench + denoiser scenes use it
# too); re-exported here for its historical import path
from raytracerfacility_tpu.mlvq.synthetic import synthetic_btf  # noqa: E402,F401


def scalar_decode(d: BTFData, uv, i_theta, i_phi, v_theta, v_phi):
    """Independent scalar transcription of the reference decode chain
    (MLVQ/*.cuh), used as the oracle for the vectorized version."""
    if i_theta > 90.0 or v_theta > 90.0:
        return np.zeros(3)
    nb, na, nt, nphi = (
        d.num_of_beta, d.num_of_alpha, d.num_of_theta, d.num_of_phi,
    )
    # PDF6D::GetValDeg2 spatial index
    x = int(uv[0] * d.tex_coord_multiplier * d.num_cols) - d.cols_offset
    y = int(uv[1] * d.tex_coord_multiplier * d.num_rows) - d.rows_offset
    while x < 0:
        x += d.num_cols
    while y < 0:
        y += d.num_rows
    x %= d.num_cols
    y %= d.num_rows
    v_phi = (360.0 - v_phi) % 360.0
    i_phi = ((360.0 - i_phi) - (90.0 + v_phi)) % 360.0
    # ConvertThetaPhiToBetaAlpha (non-codeBtf path)
    ti, pi = np.radians(i_theta), np.radians(i_phi)
    xx = np.cos(pi) * np.sin(ti)
    yy = np.sin(pi) * np.sin(ti)
    beta = np.arcsin(np.clip(xx, -1, 1))
    cos_beta = np.cos(beta)
    alpha = 0.0 if cos_beta < 0.001 else np.arcsin(np.clip(yy / cos_beta, -1, 1))
    beta = np.clip(np.degrees(beta), -90, 90)
    alpha = np.clip(np.degrees(alpha), -90, 90)
    theta = np.clip(v_theta, 0, 90)
    phi = np.clip(v_phi, 0, 360)

    # SetForAngle*
    if d.use_cos_beta:
        ib = int(np.clip(
            int((np.sin(np.radians(beta)) + 1) / 2 * (nb - 1)), 0, nb - 2))
        wb = (beta - d.beta_angles[ib]) / (d.beta_angles[ib + 1] - d.beta_angles[ib])
    else:
        sb = 180.0 / (nb - 1)
        ib = int(np.clip(int((beta + 90) / sb), 0, nb - 2))
        wb = (beta + 90 - ib * sb) / sb
    sa = 180.0 / (na - 1)
    ia = int(np.clip(int((alpha + 90) / sa), 0, na - 2))
    wa = (alpha + 90 - ia * sa) / sa
    stt = 90.0 / (nt - 1)
    it = int(np.clip(int(theta / stt), 0, nt - 2))
    wt = (theta - it * stt) / stt
    sp = 360.0 / nphi
    ip = int(np.clip(int(phi / sp), 0, nphi - 1))
    wp = (phi - ip * sp) / sp

    def pdf1(s):
        p0 = d.pdf1_basis[s * nb + ib]
        p1 = d.pdf1_basis[s * nb + ib + 1]
        m0 = p1 - p0 if ib == 0 else 0.5 * (p1 - d.pdf1_basis[s * nb + ib - 1])
        m1 = p1 - p0 if ib == nb - 2 else 0.5 * (d.pdf1_basis[s * nb + ib + 2] - p0)
        t2, t3 = wb * wb, wb ** 3
        h01 = -2 * t3 + 3 * t2
        return (1 - h01) * p0 + (t3 - 2 * t2 + wb) * m0 + h01 * p1 + (t3 - t2) * m1

    def iab(s):
        c0 = d.index_ab[s * nb + ib]
        c1 = d.index_ab[s * nb + ib + 1]
        return (
            (1 - wb) * d.colors[c0 * 2] + wb * d.colors[c1 * 2],
            (1 - wb) * d.colors[c0 * 2 + 1] + wb * d.colors[c1 * 2 + 1],
        )

    def pdf2(s):
        lum = d.index_lum_color[s * 2]
        col = d.index_lum_color[s * 2 + 1]
        a1, b1 = iab(d.pdf2_colors[col * na + ia])
        a2, b2 = iab(d.pdf2_colors[col * na + ia + 1])
        cb = a1 * (1 - wa) + a2 * wa
        cr = b1 * (1 - wa) + b2 * wa
        l1 = d.pdf2_scales[lum * na + ia] * pdf1(d.pdf2_slices[lum * na + ia])
        l2 = d.pdf2_scales[lum * na + ia + 1] * pdf1(d.pdf2_slices[lum * na + ia + 1])
        yv = (1 - wa) * l1 + wa * l2
        # YCbCr (non-HDR, non-codeBtf) — CIELab.cuh:8-28
        r = yv * 1.1643828 + cr * 1.5960273 - 222.921
        g = yv * 1.1643828 - cb * 0.39176172 - cr * 0.81296875 + 135.576
        b = yv * 1.1643828 + cb * 2.0172344 - 276.836
        return np.maximum([r, g, b], 0.0)

    def pdf3(s):
        o1 = pdf2(d.pdf3_slices[s * nt + it])
        o2 = pdf2(d.pdf3_slices[s * nt + it + 1])
        return (o1 * d.pdf3_scales[s * nt + it] * (1 - wt)
                + o2 * d.pdf3_scales[s * nt + it + 1] * wt)

    p4 = d.pdf6_slices[y * d.num_cols + x] - 1
    hi = 0 if ip == nphi - 1 else ip + 1
    o1 = pdf3(d.pdf4_slices[p4 * nphi + ip])
    o2 = pdf3(d.pdf4_slices[p4 * nphi + hi])
    out = (o1 * d.pdf4_scales[p4 * nphi + ip] * (1 - wp)
           + o2 * d.pdf4_scales[p4 * nphi + hi] * wp)
    out = out * d.pdf6_scales[y * d.num_cols + x]
    out = out * d.multiplier
    if d.hdr:
        out = out / d.hdr_value
    return np.power(np.maximum(out, 0), d.gamma)


def test_decode_matches_scalar_oracle():
    data = synthetic_btf()
    table = table_from_data(data)
    rng = np.random.default_rng(42)
    n = 64
    uv = rng.uniform(0, 1, (n, 2)).astype(np.float32)
    ith = rng.uniform(0, 89, n).astype(np.float32)
    iph = rng.uniform(0, 360, n).astype(np.float32)
    vth = rng.uniform(0, 89, n).astype(np.float32)
    vph = rng.uniform(0, 360, n).astype(np.float32)

    got = np.asarray(
        btf_get_value(
            table, jnp.asarray(uv), jnp.asarray(ith), jnp.asarray(iph),
            jnp.asarray(vth), jnp.asarray(vph),
        )
    )
    for i in range(n):
        want = scalar_decode(data, uv[i], ith[i], iph[i], vth[i], vph[i])
        np.testing.assert_allclose(got[i], want, rtol=2e-4, atol=2e-3,
                                   err_msg=f"sample {i}")


def test_decode_out_of_hemisphere_is_black():
    table = table_from_data(synthetic_btf())
    out = btf_get_value(
        table,
        jnp.array([[0.5, 0.5]]),
        jnp.array([95.0]),
        jnp.array([0.0]),
        jnp.array([10.0]),
        jnp.array([0.0]),
    )
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_importer_roundtrip(tmp_path):
    data = synthetic_btf(seed=3)
    export_btf_folder(data, str(tmp_path), "sample")
    loaded = import_btf_folder(str(tmp_path))
    for field in (
        "pdf6_slices", "pdf6_scales", "pdf1_basis", "colors", "index_ab",
        "pdf2_colors", "pdf2_slices", "pdf2_scales", "index_lum_color",
        "pdf3_scales", "pdf3_slices", "pdf4_scales", "pdf4_slices",
    ):
        np.testing.assert_allclose(
            getattr(loaded, field), getattr(data, field), rtol=1e-6,
            err_msg=field,
        )
    assert loaded.num_of_beta == data.num_of_beta
    assert loaded.use_cos_beta == data.use_cos_beta
    assert loaded.num_rows == data.num_rows
    assert loaded.rows_offset == data.rows_offset

    # decode through the imported copy matches the original
    t0 = table_from_data(data)
    t1 = table_from_data(loaded)
    uv = jnp.array([[0.3, 0.7]])
    args = (jnp.array([30.0]), jnp.array([120.0]), jnp.array([45.0]),
            jnp.array([200.0]))
    np.testing.assert_allclose(
        np.asarray(btf_get_value(t0, uv, *args)),
        np.asarray(btf_get_value(t1, uv, *args)),
        rtol=1e-5,
    )


def test_compute_angles():
    normal = jnp.array([[0.0, 0.0, 1.0]])
    tangent = jnp.array([[1.0, 0.0, 0.0]])
    # straight along the normal
    theta, phi = compute_angles(jnp.array([[0.0, 0.0, 1.0]]), normal, tangent)
    np.testing.assert_allclose(np.asarray(theta), 0.0, atol=1e-4)
    # 45 degrees in the tangent plane x direction
    d = jnp.array([[np.sin(np.pi / 4), 0.0, np.cos(np.pi / 4)]])
    theta, phi = compute_angles(d, normal, tangent)
    np.testing.assert_allclose(np.asarray(theta), 45.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(phi) % 360.0, 0.0, atol=1e-3)
    # below the surface
    theta, phi = compute_angles(jnp.array([[0.0, 0.0, -1.0]]), normal, tangent)
    np.testing.assert_allclose(np.asarray(theta), 90.0)
    np.testing.assert_allclose(np.asarray(phi), 0.0)


def test_btf_render_end_to_end():
    """A mesh with a CompressedBTF material renders through the wavefront
    engine (the BTFMeshRenderer path, ref BTFMeshRenderer.cpp +
    RayTracerLayer.cpp:287-343)."""
    from raytracerfacility_tpu.enums import MaterialType
    from raytracerfacility_tpu.models.renderer import (
        EnvironmentProperties,
        RayProperties,
        RayTracerCamera,
    )
    from raytracerfacility_tpu.scene import MaterialProperties, RayTracerScene, make_plane

    scene = RayTracerScene()
    plane = make_plane(2.0)
    scene.upsert_geometry(1, version=0, mesh=plane)
    scene.upsert_material(
        2, version=0,
        material_type=MaterialType.COMPRESSED_BTF,
        properties=MaterialProperties(),
        btf=synthetic_btf(seed=5),
    )
    scene.upsert_instance(3, version=0, geometry=1, material=2)

    cam = RayTracerCamera(scene)
    cam.camera.resize((24, 24))
    cam.camera.fov = 60.0
    cam.camera.look_at_target((0.0, 1.5, 1.5), (0.0, 0.0, 0.0))
    img = cam.render(EnvironmentProperties(), RayProperties(bounces=2, samples=1))
    assert np.isfinite(img).all()
    # the BTF-lit plane must differ from the white env background somewhere
    assert img[..., :3].std() > 0.01
