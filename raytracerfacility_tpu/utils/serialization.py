"""YAML persistence: the reference's checkpoint/resume surface.

The reference persists per-asset settings (not renderer state — accumulation
resets on any change, ref RayTracer.cu:266-269):

* camera settings         (ref RayTracerCamera.cpp:76-110)
* estimator aggregates    (ref TriangleIlluminationEstimator.cpp:142-152)
* scanner params          (ref PointCloudScanner.cpp:57-68)
* the full CompressedBTF database incl. binary blobs, so a re-import of the
  text DB is never needed (.cbtf, ref CompressedBTF.cpp:739-801, registered
  at RayTracerLayer.cpp:403-404)

Binary arrays are stored as base64 raw little-endian bytes inside the YAML
document (the same shape as UniEngine's YAML::Binary nodes).
"""

from __future__ import annotations

import base64

import numpy as np
import yaml

from raytracerfacility_tpu.mlvq.btf import BTFData
from raytracerfacility_tpu.ops.camera import CameraProperties


def _encode(arr: np.ndarray) -> dict:
    arr = np.ascontiguousarray(arr)
    return {
        "dtype": str(arr.dtype),
        "shape": list(arr.shape),
        "data": base64.b64encode(arr.tobytes()).decode("ascii"),
    }


def _decode(node: dict) -> np.ndarray:
    raw = base64.b64decode(node["data"])
    return np.frombuffer(raw, dtype=np.dtype(node["dtype"])).reshape(
        node["shape"]
    ).copy()


# ---------------------------------------------------------------- camera

def save_camera(camera: CameraProperties, path: str) -> None:
    """Ref RayTracerCamera::Serialize (RayTracerCamera.cpp:76-93)."""
    doc = {
        "m_fov": float(camera.fov),
        "m_aperture": float(camera.aperture),
        "m_focalLength": float(camera.focal_length),
        "m_gamma": float(camera.gamma),
        "m_maxDistance": float(camera.max_distance),
        "m_accumulate": bool(camera.accumulate),
        "m_denoiserStrength": float(camera.denoiser_strength),
        "m_size": list(camera.size),
        "m_position": [float(x) for x in camera.position],
        "m_rotation": [float(x) for x in camera.rotation],
    }
    with open(path, "w") as f:
        yaml.safe_dump(doc, f)


def load_camera(path: str) -> CameraProperties:
    with open(path) as f:
        doc = yaml.safe_load(f)
    cam = CameraProperties(
        fov=doc["m_fov"],
        aperture=doc["m_aperture"],
        focal_length=doc["m_focalLength"],
        gamma=doc["m_gamma"],
        max_distance=doc["m_maxDistance"],
        accumulate=doc["m_accumulate"],
        denoiser_strength=doc["m_denoiserStrength"],
        size=tuple(doc["m_size"]),
    )
    cam.position = np.asarray(doc["m_position"], np.float32)
    cam.rotation = np.asarray(doc["m_rotation"], np.float32)
    return cam


# ------------------------------------------------------------- estimator

def save_estimator(estimator, path: str) -> None:
    """Ref TriangleIlluminationEstimator::Serialize (:142-146)."""
    doc = {
        "m_totalArea": float(estimator.total_area),
        "m_totalFlux": [float(x) for x in estimator.total_flux],
        "m_averageFlux": [float(x) for x in estimator.average_flux],
    }
    with open(path, "w") as f:
        yaml.safe_dump(doc, f)


def load_estimator(path: str):
    from raytracerfacility_tpu.models.illumination import (
        TriangleIlluminationEstimator,
    )

    with open(path) as f:
        doc = yaml.safe_load(f)
    est = TriangleIlluminationEstimator()
    est.total_area = doc["m_totalArea"]
    est.total_flux = np.asarray(doc["m_totalFlux"], np.float32)
    est.average_flux = np.asarray(doc["m_averageFlux"], np.float32)
    return est


# --------------------------------------------------------------- scanner

def save_scanner(scanner, path: str) -> None:
    """Ref PointCloudScanner::Serialize (:57-61)."""
    doc = {
        "m_rotateAngle": float(scanner.rotate_angle),
        "m_size": [float(x) for x in scanner.size],
        "m_distance": [float(x) for x in scanner.distance],
    }
    with open(path, "w") as f:
        yaml.safe_dump(doc, f)


def load_scanner(path: str):
    from raytracerfacility_tpu.models.lidar import PointCloudScanner

    with open(path) as f:
        doc = yaml.safe_load(f)
    return PointCloudScanner(
        size=tuple(doc["m_size"]),
        distance=tuple(doc["m_distance"]),
        rotate_angle=doc["m_rotateAngle"],
    )


# ------------------------------------------------------------------ cbtf

_BTF_ARRAYS = (
    "pdf6_slices", "pdf6_scales", "pdf1_basis", "colors", "index_ab",
    "pdf2_colors", "pdf2_slices", "pdf2_scales", "index_lum_color",
    "pdf3_scales", "pdf3_slices", "pdf4_scales", "pdf4_slices",
    "beta_angles",
)

_BTF_SCALARS = (
    "use_cos_beta", "num_of_beta", "num_of_alpha", "num_of_theta",
    "num_of_phi", "hdr", "hdr_value", "multiplier", "tex_coord_multiplier",
    "gamma", "code_btf_flag", "num_rows", "num_cols", "rows_offset",
    "cols_offset",
)


def save_cbtf(data: BTFData, path: str) -> None:
    """Persist a parsed BTF database with binary blobs
    (ref CompressedBTF::Serialize, CompressedBTF.cpp:739-801)."""
    doc = {k: getattr(data, k) for k in _BTF_SCALARS}
    doc = {
        k: (bool(v) if isinstance(v, (bool, np.bool_)) else
            float(v) if isinstance(v, float) else int(v) if isinstance(
                v, (int, np.integer)) else v)
        for k, v in doc.items()
    }
    for k in _BTF_ARRAYS:
        arr = getattr(data, k)
        if arr is not None:
            doc[k] = _encode(np.asarray(arr))
    with open(path, "w") as f:
        yaml.safe_dump(doc, f)


def load_cbtf(path: str) -> BTFData:
    with open(path) as f:
        doc = yaml.safe_load(f)
    kwargs = {k: doc[k] for k in _BTF_SCALARS if k in doc}
    data = BTFData(**kwargs)
    for k in _BTF_ARRAYS:
        if k in doc:
            setattr(data, k, _decode(doc[k]))
    return data
