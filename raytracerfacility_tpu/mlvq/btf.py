"""MLVQ CompressedBTF decode: the 6-level PDF chain as vectorized gathers.

Ports the reference's device decode hierarchy (SURVEY.md section 2.4):

    BTFBase::GetValueDeg            (MLVQ/BTFBase.cuh:49-81)
    -> PDF6D::GetValDeg2            (MLVQ/PDF6D.cuh:32-95)
    -> PDF4D::GetVal                (MLVQ/PDF4D.cuh:33-63, phi wraparound)
    -> PDF3D::GetVal                (MLVQ/PDF3D.cuh:31-46)
    -> PDF2DSeperate::GetVal        (MLVQ/PDF2D.cuh:123-141)
       -> PDF2DLuminance::GetVal    (MLVQ/PDF2D.cuh:86-102)
       -> PDF2DColor::GetVal        (MLVQ/PDF2D.cuh:46-59)
    -> PDF1D::GetVal (cubic Hermite, MLVQ/PDF1D.cuh:24-69)
       IndexAB::GetVal              (MLVQ/IndexAB.cuh:26-45)
    -> VectorColor::Get             (MLVQ/VectorColor.cuh:25-30)
    -> UserCmToRgb                  (MLVQ/CIELab.cuh:170-186)

The reference's device pointer-chase becomes a tree of integer gathers into
13 flat arrays, evaluated for a whole lane pool at once: the 2 phi x 2 theta
x 2 alpha x 2 beta interpolation lattice is unrolled into explicit masked
gathers (16 PDF1D Hermite evaluations + 8 IndexAB color fetches per shading
event), which XLA fuses into the surrounding shade pass.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@dataclasses.dataclass
class BTFData:
    """Host-side parsed database (one material).

    Array shapes follow the text DB layout (ref CompressedBTF.cpp:339-377):
    rows x cols as stored, flattened C-order.
    """

    # header params (ref BTFBase fields)
    use_cos_beta: bool
    num_of_beta: int
    num_of_alpha: int
    num_of_theta: int
    num_of_phi: int
    hdr: bool = False
    hdr_value: float = 1.0
    multiplier: float = 1.0
    tex_coord_multiplier: float = 1.0
    gamma: float = 2.2
    code_btf_flag: bool = False
    # PDF6 spatial index
    num_rows: int = 0
    num_cols: int = 0
    rows_offset: int = 0
    cols_offset: int = 0
    # the 13 arrays (ref CompressedBTF.cpp:339-377)
    pdf6_slices: np.ndarray = None  # (rows*cols,) int32, 1-based
    pdf6_scales: np.ndarray = None  # (rows*cols,) f32
    pdf1_basis: np.ndarray = None  # (numPdf1D * numOfBeta,) f32
    colors: np.ndarray = None  # (numColors * 2,) f32 (a-b pairs)
    index_ab: np.ndarray = None  # (numIndexSlices * numOfBeta,) int32
    pdf2_colors: np.ndarray = None  # (numPdf2DColor * numOfAlpha,) int32
    pdf2_slices: np.ndarray = None  # (numPdf2DLum * numOfAlpha,) int32
    pdf2_scales: np.ndarray = None  # (numPdf2DLum * numOfAlpha,) f32
    index_lum_color: np.ndarray = None  # (numPdf2D * 2,) int32
    pdf3_scales: np.ndarray = None  # (numPdf3D * numOfTheta,) f32
    pdf3_slices: np.ndarray = None  # (numPdf3D * numOfTheta,) int32
    pdf4_scales: np.ndarray = None  # (numPdf4D * numOfPhi,) f32
    pdf4_slices: np.ndarray = None  # (numPdf4D * numOfPhi,) int32
    beta_angles: np.ndarray = None  # (numOfBeta,) f32 degrees

    @property
    def step_alpha(self) -> float:
        return 180.0 / (self.num_of_alpha - 1)

    @property
    def step_theta(self) -> float:
        return 90.0 / (self.num_of_theta - 1)

    @property
    def step_phi(self) -> float:
        return 360.0 / self.num_of_phi

    def compute_beta_angles(self) -> np.ndarray:
        """Ref CompressedBTF.cpp:162-187."""
        n = self.num_of_beta
        if self.use_cos_beta:
            sin_beta = np.minimum(-1.0 + 2.0 * np.arange(n) / (n - 1), 1.0)
            angles = np.degrees(np.arcsin(sin_beta)).astype(np.float32)
            angles[0] = -90.0
            angles[(n - 1) // 2] = 0.0
            angles[n - 1] = 90.0
        else:
            step = 180.0 / (n - 1)
            angles = (np.arange(n) * step - 90.0).astype(np.float32)
            angles[(n - 1) // 2] = 0.0
            angles[n - 1] = 90.0
        return angles


@struct.dataclass
class BTFTable:
    """Device arrays for one material (static params as aux fields)."""

    pdf6_slices: jax.Array
    pdf6_scales: jax.Array
    pdf1_basis: jax.Array
    colors: jax.Array
    index_ab: jax.Array
    pdf2_colors: jax.Array
    pdf2_slices: jax.Array
    pdf2_scales: jax.Array
    index_lum_color: jax.Array
    pdf3_scales: jax.Array
    pdf3_slices: jax.Array
    pdf4_scales: jax.Array
    pdf4_slices: jax.Array
    beta_angles: jax.Array

    use_cos_beta: bool = struct.field(pytree_node=False, default=True)
    num_of_beta: int = struct.field(pytree_node=False, default=0)
    num_of_alpha: int = struct.field(pytree_node=False, default=0)
    num_of_theta: int = struct.field(pytree_node=False, default=0)
    num_of_phi: int = struct.field(pytree_node=False, default=0)
    num_rows: int = struct.field(pytree_node=False, default=0)
    num_cols: int = struct.field(pytree_node=False, default=0)
    rows_offset: int = struct.field(pytree_node=False, default=0)
    cols_offset: int = struct.field(pytree_node=False, default=0)
    hdr: bool = struct.field(pytree_node=False, default=False)
    hdr_value: float = struct.field(pytree_node=False, default=1.0)
    multiplier: float = struct.field(pytree_node=False, default=1.0)
    tex_coord_multiplier: float = struct.field(pytree_node=False, default=1.0)
    gamma: float = struct.field(pytree_node=False, default=2.2)
    code_btf_flag: bool = struct.field(pytree_node=False, default=False)


def table_from_data(data: BTFData) -> BTFTable:
    beta = (
        data.beta_angles
        if data.beta_angles is not None
        else data.compute_beta_angles()
    )
    # pdf1_basis carries one duplicated element at each end so the
    # decoder's Hermite 4-window gather (base-1 .. base+2, globally
    # clamped in the reference) is always in bounds: new[i] == old[i-1]
    p1b = np.asarray(data.pdf1_basis, np.float32)
    p1b = np.concatenate([p1b[:1], p1b, p1b[-1:]])
    return BTFTable(
        pdf6_slices=jnp.asarray(data.pdf6_slices, jnp.int32),
        pdf6_scales=jnp.asarray(data.pdf6_scales, jnp.float32),
        pdf1_basis=jnp.asarray(p1b, jnp.float32),
        colors=jnp.asarray(data.colors, jnp.float32),
        index_ab=jnp.asarray(data.index_ab, jnp.int32),
        pdf2_colors=jnp.asarray(data.pdf2_colors, jnp.int32),
        pdf2_slices=jnp.asarray(data.pdf2_slices, jnp.int32),
        pdf2_scales=jnp.asarray(data.pdf2_scales, jnp.float32),
        index_lum_color=jnp.asarray(data.index_lum_color, jnp.int32),
        pdf3_scales=jnp.asarray(data.pdf3_scales, jnp.float32),
        pdf3_slices=jnp.asarray(data.pdf3_slices, jnp.int32),
        pdf4_scales=jnp.asarray(data.pdf4_scales, jnp.float32),
        pdf4_slices=jnp.asarray(data.pdf4_slices, jnp.int32),
        beta_angles=jnp.asarray(beta, jnp.float32),
        use_cos_beta=bool(data.use_cos_beta),
        num_of_beta=int(data.num_of_beta),
        num_of_alpha=int(data.num_of_alpha),
        num_of_theta=int(data.num_of_theta),
        num_of_phi=int(data.num_of_phi),
        num_rows=int(data.num_rows),
        num_cols=int(data.num_cols),
        rows_offset=int(data.rows_offset),
        cols_offset=int(data.cols_offset),
        hdr=bool(data.hdr),
        hdr_value=float(data.hdr_value),
        multiplier=float(data.multiplier),
        tex_coord_multiplier=float(data.tex_coord_multiplier),
        gamma=float(data.gamma),
        code_btf_flag=bool(data.code_btf_flag),
    )


def pack_btf_table(btfs: list) -> tuple:
    """Scene-level packing: a tuple of per-material tables (each table's
    static params may differ, so they stay separate pytrees)."""
    out = []
    for b in btfs:
        out.append(b if isinstance(b, BTFTable) else table_from_data(b))
    return tuple(out)


# --------------------------------------------------------------------------
# decode
# --------------------------------------------------------------------------


def _take_win(arr, start, k: int):
    """Gather ``k`` CONTIGUOUS elements per query: one XLA gather with
    slice_sizes=(k,) instead of k scalar gathers. The MLVQ decode chain
    reads almost every table in (base, base+1) or (base-1..base+2)
    windows; on TPU a windowed gather amortizes the per-element address
    work that dominates scalar gathers (config-3 decode measured ~27 ms
    at 65k queries with scalar gathers). Returns start.shape + (k,)."""
    flat = start.reshape(-1)
    out = jax.vmap(lambda i: jax.lax.dynamic_slice(arr, (i,), (k,)))(flat)
    return out.reshape(start.shape + (k,))


def _pdf1_hermite(t: BTFTable, slice_idx, low, w):
    """Cubic Hermite (Fergusson) interpolation in beta
    (ref MLVQ/PDF1D.cuh:24-69)."""
    nb = t.num_of_beta
    base = slice_idx * nb + low
    # pdf1_basis is padded with one duplicated element at each end
    # (table_from_data), so the 4-window at base-1 reproduces the
    # reference's global clamping (max(base-1,0) / min(base+2,n-1))
    # with every window in bounds: new[i] == old[i-1].
    win = _take_win(t.pdf1_basis, base, 4)
    pm1, p0, p1, p2 = win[..., 0], win[..., 1], win[..., 2], win[..., 3]
    m0 = jnp.where(low == 0, p1 - p0, 0.5 * (p1 - pm1))
    m1 = jnp.where(low == nb - 2, p1 - p0, 0.5 * (p2 - p0))
    t2 = w * w
    t3 = t2 * w
    h01 = -2.0 * t3 + 3.0 * t2
    h00 = 1.0 - h01
    h11 = t3 - t2
    h10 = h11 - t2 + w
    return h00 * p0 + h10 * m0 + h01 * p1 + h11 * m1


def _index_ab(t: BTFTable, slice_idx, low, w):
    """Linear interpolation of a-b color indices (ref MLVQ/IndexAB.cuh:26-45,
    VectorColor.cuh:25-30)."""
    nb = t.num_of_beta
    cw = _take_win(t.index_ab, slice_idx * nb + low, 2)
    p0 = _take_win(t.colors, cw[..., 0] * 2, 2)  # (a, b) pair at c0
    p1 = _take_win(t.colors, cw[..., 1] * 2, 2)
    a = (1.0 - w) * p0[..., 0] + w * p1[..., 0]
    b = (1.0 - w) * p0[..., 1] + w * p1[..., 1]
    return a, b


def _pdf2(t: BTFTable, pdf2_idx, alpha_low, alpha_w, beta_low, beta_w):
    """PDF2DSeperate: luminance + a-b color -> user-CM triple
    (ref MLVQ/PDF2D.cuh:46-59, 86-102, 123-141)."""
    na = t.num_of_alpha
    lc = _take_win(t.index_lum_color, pdf2_idx * 2, 2)
    lum_idx, col_idx = lc[..., 0], lc[..., 1]

    # color: interpolate IndexAB lookups across alpha
    cols = _take_win(t.pdf2_colors, col_idx * na + alpha_low, 2)
    a1, b1 = _index_ab(t, cols[..., 0], beta_low, beta_w)
    a2, b2 = _index_ab(t, cols[..., 1], beta_low, beta_w)
    cm1 = a1 * (1.0 - alpha_w) + a2 * alpha_w
    cm2 = b1 * (1.0 - alpha_w) + b2 * alpha_w

    # luminance: interpolate scaled PDF1D lookups across alpha
    scales = _take_win(t.pdf2_scales, lum_idx * na + alpha_low, 2)
    slices = _take_win(t.pdf2_slices, lum_idx * na + alpha_low, 2)
    l1 = scales[..., 0] * _pdf1_hermite(t, slices[..., 0], beta_low, beta_w)
    l2 = scales[..., 1] * _pdf1_hermite(t, slices[..., 1], beta_low, beta_w)
    cm0 = (1.0 - alpha_w) * l1 + alpha_w * l2
    return _user_cm_to_rgb(t, cm0, cm1, cm2)


def _user_cm_to_rgb(t: BTFTable, y, cb, cr):
    """Ref MLVQ/CIELab.cuh:8-50 (YCbCr paths) and :52-167 (LogLuv HDR)."""
    if t.hdr:
        return _logluv_to_rgb(y, cb, cr, normalized=t.code_btf_flag)
    offset = (
        jnp.float32(1.0 / 256.0) if t.code_btf_flag else jnp.float32(1.0)
    )
    r = y * 1.1643828 + cr * 1.5960273 - 222.921 * offset
    g = y * 1.1643828 - cb * 0.39176172 - cr * 0.81296875 + 135.576 * offset
    b = y * 1.1643828 + cb * 2.0172344 - 276.836 * offset
    return (
        jnp.maximum(r, 0.0),
        jnp.maximum(g, 0.0),
        jnp.maximum(b, 0.0),
    )


def _logluv_to_rgb(l, u, v, normalized: bool):
    """Ref MLVQ/CIELab.cuh:52-167 (Mantiuk 2006 inverse log-luminance)."""
    y = jnp.where(
        l < 98.381,
        0.056968 * l,
        jnp.where(
            l < 1204.7,
            7.3014e-30 * jnp.power(jnp.maximum(l + 884.17, 0.0), 9.9872),
            32.994 * jnp.exp(0.0047811 * jnp.minimum(l, 4000.0)),
        ),
    )
    safe_v = jnp.where(v > 0.0, v, 1.0)
    x = jnp.where(v > 0.0, 9.0 / 4.0 * u / safe_v * y, 0.0)
    z = jnp.where(v > 0.0, y * (3.0 * 410.0 / safe_v - 5.0) - x / 3.0, 0.0)
    if normalized:
        x, y, z = x / 256.0, y / 256.0, z / 256.0
    r = x * 3.2406 + y * -1.5372 + z * -0.4986
    g = x * -0.9689 + y * 1.8758 + z * 0.0415
    b = x * 0.0557 + y * -0.2040 + z * 1.0570
    out = []
    for c in (r, g, b):
        c = jnp.maximum(c, 0.0)
        out.append(
            jnp.where(
                c > 0.0031308,
                1.055 * jnp.power(c, 1.0 / 2.4) - 0.055,
                12.92 * c,
            )
        )
    return tuple(out)


def btf_get_value(
    t: BTFTable,
    tex_coord: jax.Array,  # (..., 2)
    illumination_theta: jax.Array,  # (...,) degrees
    illumination_phi: jax.Array,
    view_theta: jax.Array,
    view_phi: jax.Array,
) -> jax.Array:
    """Vectorized ``BTFBase::GetValueDeg`` (ref MLVQ/BTFBase.cuh:49-81).

    Returns linear RGB (...,3) BEFORE the caller's /256 post-scale
    (ref RayDataDefinations.hpp:347 applies that in the hit shader).
    """
    shape = illumination_theta.shape

    # ---- spatial index with tiling (ref PDF6D.cuh:36-46)
    u = tex_coord[..., 0] * t.tex_coord_multiplier
    v = tex_coord[..., 1] * t.tex_coord_multiplier
    x = (u * t.num_cols).astype(jnp.int32) - t.cols_offset
    y = (v * t.num_rows).astype(jnp.int32) - t.rows_offset
    x = jnp.mod(x, t.num_cols)
    y = jnp.mod(y, t.num_rows)

    # ---- clockwise -> ccw phi remap (ref PDF6D.cuh:49-51)
    view_phi_r = jnp.mod(360.0 - view_phi, 360.0)
    illum_phi_r = jnp.mod((360.0 - illumination_phi) - (90.0 + view_phi_r), 360.0)

    # ---- theta/phi -> beta/alpha (ref SharedCoordinates.cuh:130-167)
    it_rad = jnp.radians(illumination_theta)
    ip_rad = jnp.radians(illum_phi_r)
    if t.code_btf_flag:
        # tc.m_phi is uninitialized in the reference at this point; treat as 0
        xx = jnp.cos(ip_rad) * jnp.sin(it_rad)
        yy = jnp.sin(ip_rad) * jnp.sin(it_rad)
        beta = jnp.arcsin(jnp.clip(yy, -1.0, 1.0))
        cos_beta = jnp.cos(beta)
        alpha = jnp.where(
            cos_beta < 0.001,
            0.0,
            jnp.arcsin(jnp.clip(-xx / jnp.maximum(cos_beta, 0.001), -1.0, 1.0)),
        )
    else:
        xx = jnp.cos(ip_rad) * jnp.sin(it_rad)
        yy = jnp.sin(ip_rad) * jnp.sin(it_rad)
        beta = jnp.arcsin(jnp.clip(xx, -1.0, 1.0))
        cos_beta = jnp.cos(beta)
        alpha = jnp.where(
            cos_beta < 0.001,
            0.0,
            jnp.arcsin(jnp.clip(yy / jnp.maximum(cos_beta, 0.001), -1.0, 1.0)),
        )
    beta = jnp.clip(jnp.degrees(beta), -90.0, 90.0)
    alpha = jnp.clip(jnp.degrees(alpha), -90.0, 90.0)
    theta = jnp.clip(view_theta, 0.0, 90.0)
    phi = jnp.clip(view_phi_r, 0.0, 360.0)

    # ---- interpolation bounds (ref SharedCoordinates.cuh:56-127)
    nb, na, nt, nphi = t.num_of_beta, t.num_of_alpha, t.num_of_theta, t.num_of_phi
    if t.use_cos_beta:
        beta_low = jnp.clip(
            ((jnp.sin(jnp.radians(beta)) + 1.0) / 2.0 * (nb - 1)).astype(jnp.int32),
            0,
            nb - 2,
        )
        b0 = t.beta_angles[beta_low]
        b1 = t.beta_angles[beta_low + 1]
        beta_w = (beta - b0) / (b1 - b0)
    else:
        step_beta = 180.0 / (nb - 1)
        beta_low = jnp.clip(
            ((beta + 90.0) / step_beta).astype(jnp.int32), 0, nb - 2
        )
        beta_w = (beta + 90.0 - beta_low * step_beta) / step_beta

    step_alpha = 180.0 / (na - 1)
    alpha_low = jnp.clip(((alpha + 90.0) / step_alpha).astype(jnp.int32), 0, na - 2)
    alpha_w = (alpha + 90.0 - alpha_low * step_alpha) / step_alpha

    step_theta = 90.0 / (nt - 1)
    theta_low = jnp.clip((theta / step_theta).astype(jnp.int32), 0, nt - 2)
    theta_w = (theta - theta_low * step_theta) / step_theta

    step_phi = 360.0 / nphi
    phi_low = jnp.clip((phi / step_phi).astype(jnp.int32), 0, nphi - 1)
    phi_w = (phi - phi_low * step_phi) / step_phi

    # ---- PDF6 -> PDF4 (ref PDF6D.cuh:85-94)
    pdf4_idx = t.pdf6_slices[y * t.num_cols + x] - 1
    scale6 = t.pdf6_scales[y * t.num_cols + x]

    # ---- PDF4: 2-slice phi interpolation with wraparound (ref PDF4D.cuh:33-63)
    def pdf3_eval(pdf3_idx):
        # ---- PDF3: theta interpolation (ref PDF3D.cuh:31-46)
        base = pdf3_idx * nt + theta_low
        sl = _take_win(t.pdf3_slices, base, 2)
        sc = _take_win(t.pdf3_scales, base, 2)
        r1, g1, b1_ = _pdf2(
            t, sl[..., 0], alpha_low, alpha_w, beta_low, beta_w
        )
        r2, g2, b2_ = _pdf2(
            t, sl[..., 1], alpha_low, alpha_w, beta_low, beta_w
        )
        s1 = sc[..., 0] * (1.0 - theta_w)
        s2 = sc[..., 1] * theta_w
        return r1 * s1 + r2 * s2, g1 * s1 + g2 * s2, b1_ * s1 + b2_ * s2

    phi_hi = jnp.where(phi_low == nphi - 1, 0, phi_low + 1)
    base4_lo = pdf4_idx * nphi + phi_low
    base4_hi = pdf4_idx * nphi + phi_hi
    r1, g1, b1 = pdf3_eval(t.pdf4_slices[base4_lo])
    r2, g2, b2 = pdf3_eval(t.pdf4_slices[base4_hi])
    s1 = t.pdf4_scales[base4_lo] * (1.0 - phi_w)
    s2 = t.pdf4_scales[base4_hi] * phi_w
    r = r1 * s1 + r2 * s2
    g = g1 * s1 + g2 * s2
    b = b1 * s1 + b2 * s2

    out = jnp.stack([r, g, b], axis=-1) * scale6[..., None]

    # ---- BTFBase post-ops (ref BTFBase.cuh:72-80)
    out = out * t.multiplier
    if t.hdr:
        out = out / t.hdr_value
    out = jnp.power(jnp.maximum(out, 0.0), t.gamma)

    # out-of-hemisphere queries return black (ref BTFBase.cuh:58-61)
    invalid = (illumination_theta > 90.0) | (view_theta > 90.0)
    out = jnp.where(invalid[..., None], 0.0, out)
    # NaN angles leave the caller's default (1,1,1) scaled by post-ops
    # (ref PDF6D.cuh:62-68); we return 0 instead to keep lanes finite.
    bad = ~(
        jnp.isfinite(beta) & jnp.isfinite(alpha)
        & jnp.isfinite(view_theta) & jnp.isfinite(phi)
    )
    out = jnp.where(bad[..., None], 0.0, out)
    return jnp.broadcast_to(out, shape + (3,))


def compute_angles(
    direction: jax.Array,  # (..., 3)
    normal: jax.Array,
    tangent: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Tangent-space (theta, phi) in degrees for the hit-shader adapter
    (ref SurfaceCompressedBTF::ComputeAngles, RayDataDefinations.hpp:290-324).
    """
    binormal = jnp.cross(normal, tangent)
    tx = jnp.sum(tangent * direction, axis=-1)
    ty = jnp.sum(binormal * direction, axis=-1)
    tz = jnp.sum(normal * direction, axis=-1)
    below = tz < 0.0
    theta = jnp.degrees(jnp.arccos(jnp.clip(tz, -1.0, 1.0)))
    phi = jnp.degrees(jnp.arctan2(ty, tx)) + 360.0
    phi = jnp.where(phi > 360.0, phi - 360.0, phi)
    theta = jnp.where(below, 90.0, theta)
    phi = jnp.where(below, 0.0, phi)
    nan = ~jnp.isfinite(tx)
    return jnp.where(nan, 0.0, theta), jnp.where(nan, 0.0, phi)
