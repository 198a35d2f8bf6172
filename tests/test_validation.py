"""Launch-boundary validation policy (the CUDA_SYNC_CHECK equivalent)."""

import numpy as np
import pytest

from raytracerfacility_tpu.utils.validation import (
    ValidationError,
    check_finite,
    check_range,
    set_validation,
)


def test_disabled_is_free():
    set_validation(False)
    check_finite("x", buf=np.array([np.nan]))  # no raise when disabled


def test_detects_nonfinite():
    set_validation(True)
    try:
        check_finite("RenderToCamera",
                     color=np.ones((4, 4)),
                     normal=np.array([[1.0, np.inf], [0.0, 1.0]]))
        pytest.fail("expected ValidationError")
    except ValidationError as e:
        assert "RenderToCamera" in str(e) and "normal" in str(e)
    finally:
        set_validation(False)


def test_range_assert():
    set_validation(True)
    try:
        check_range("BTF", "theta", np.array([0.0, 91.0]), 0.0, 90.0)
        pytest.fail("expected ValidationError")
    except ValidationError:
        pass
    finally:
        set_validation(False)


def test_render_launch_sweep_passes(monkeypatch):
    monkeypatch.setenv("RTF_VALIDATE", "1")
    set_validation(True)
    try:
        from raytracerfacility_tpu.models.renderer import (
            EnvironmentProperties, RayProperties, RayTracerCamera)
        from tests.test_smoke import build_test_scene

        cam = RayTracerCamera(build_test_scene())
        cam.camera.resize((16, 16))
        img = cam.render(EnvironmentProperties(),
                         RayProperties(bounces=1, samples=1))
        assert np.isfinite(img).all()
    finally:
        set_validation(False)
