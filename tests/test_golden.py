"""Golden-image regression tests (SURVEY.md section 4 item (b)).

Goldens are rendered by this framework at a pinned RNG seed and committed;
the tests guard against unintended behavior drift with an SSIM threshold.
Regenerate deliberately with REGEN_GOLDENS=1 python -m pytest tests/test_golden.py.
"""

import os

import numpy as np
import pytest

from raytracerfacility_tpu.models.renderer import (
    EnvironmentProperties,
    RayProperties,
    RayTracerCamera,
)
from raytracerfacility_tpu.enums import EnvironmentalLightingType
from raytracerfacility_tpu.utils.image import ssim
from tests.test_smoke import build_test_scene

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def render_case(name):
    scene = build_test_scene()
    cam = RayTracerCamera(scene)
    cam.camera.resize((64, 64))
    cam.camera.fov = 90.0
    cam.camera.look_at_target((0.0, 1.0, 2.4), (0.0, 0.9, 0.0))
    if name == "cornell":
        env = EnvironmentProperties()
        ray = RayProperties(bounces=4, samples=2)
        frames = 8
    elif name == "cornell_sls":
        env = EnvironmentProperties(
            lighting_type=EnvironmentalLightingType.SINGLE_LIGHT_SOURCE,
            sun_direction=(0.3, 0.9, 0.2),
            light_size=0.05,
            ambient_light_intensity=0.15,
        )
        ray = RayProperties(bounces=2, samples=2)
        frames = 8
    else:
        raise KeyError(name)
    img = None
    for _ in range(frames):
        img = cam.render(env, ray)
    return img[..., :3]


@pytest.mark.parametrize("name", ["cornell", "cornell_sls"])
def test_golden(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.npy")
    img = render_case(name)
    if os.environ.get("REGEN_GOLDENS") or not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.save(path, img.astype(np.float16))
        pytest.skip(f"golden regenerated: {path}")
    golden = np.load(path).astype(np.float32)
    score = ssim(img, golden)
    assert score > 0.98, f"{name}: SSIM {score:.4f} vs golden"
