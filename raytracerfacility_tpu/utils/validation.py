"""Post-launch validation policy (the CUDA_SYNC_CHECK / device-assert slot).

The reference wraps every API call and launch in CUDA_CHECK/OPTIX_CHECK/
CUDA_SYNC_CHECK (ref include/.../RayTracer/Optix7.hpp:10-56, used after
launches e.g. RayTracer.cu:368) and carries device-side asserts through
the MLVQ decode chain (ref MLVQ/PDF1D.cuh:25-27, SharedCoordinates.cuh:57).
XLA has no device asserts, so the TPU equivalent is a *launch-boundary
sweep*: after each launch type, fetch-and-check the outputs for
non-finite values and out-of-range results.

Off by default (a host sync per launch); enable with
``RTF_VALIDATE=1`` or :func:`set_validation`. The renderer, the
illumination estimator and the LiDAR scanner call :func:`check_finite`
at their launch boundaries; a failure raises ``ValidationError`` naming
the launch and the offending buffer — the throw-on-error policy of the
reference's host macros.
"""

from __future__ import annotations

import os

import numpy as np

_enabled: bool | None = None


class ValidationError(RuntimeError):
    pass


def validation_enabled() -> bool:
    global _enabled
    if _enabled is None:
        _enabled = os.environ.get("RTF_VALIDATE") == "1"
    return _enabled


def set_validation(on: bool) -> None:
    global _enabled
    _enabled = bool(on)


def check_finite(launch: str, **buffers) -> None:
    """Validate launch outputs when enabled. ``buffers`` maps buffer
    names to arrays; raises :class:`ValidationError` on any non-finite
    element (the post-launch CUDA_SYNC_CHECK slot)."""
    if not validation_enabled():
        return
    for name, buf in buffers.items():
        if buf is None:
            continue
        arr = np.asarray(buf)
        if arr.dtype.kind != "f":
            continue
        bad = ~np.isfinite(arr)
        if bad.any():
            idx = np.argwhere(bad)[0]
            raise ValidationError(
                f"launch '{launch}': buffer '{name}' has "
                f"{int(bad.sum())} non-finite element(s); first at "
                f"index {tuple(int(i) for i in idx)}"
            )


def check_range(launch: str, name: str, buf, lo: float, hi: float) -> None:
    """Range assert for quantities with known bounds (the device-assert
    slot, e.g. BTF decode angles)."""
    if not validation_enabled():
        return
    arr = np.asarray(buf)
    if arr.size == 0:
        return
    mn, mx = float(np.min(arr)), float(np.max(arr))
    if mn < lo or mx > hi:
        raise ValidationError(
            f"launch '{launch}': '{name}' out of range "
            f"[{lo}, {hi}]: observed [{mn}, {mx}]"
        )
