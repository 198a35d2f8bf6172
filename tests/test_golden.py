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


def _checker_texture(size=8):
    img = np.zeros((size, size, 4), np.float32)
    yy, xx = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    mask = ((yy // 2 + xx // 2) % 2).astype(bool)
    img[..., 0] = np.where(mask, 0.9, 0.15)
    img[..., 1] = np.where(mask, 0.3, 0.7)
    img[..., 2] = 0.25
    img[..., 3] = 1.0
    return img


def _base_cam(scene, pose=((0.0, 1.0, 2.4), (0.0, 0.9, 0.0)), fov=90.0):
    cam = RayTracerCamera(scene)
    cam.denoiser = None  # goldens pin the raw path-traced output
    cam.camera.resize((64, 64))
    cam.camera.fov = fov
    cam.camera.look_at_target(*pose)
    return cam


def render_case(name):
    import numpy as _np

    from raytracerfacility_tpu.enums import GeometryType, MaterialType, RendererType
    from raytracerfacility_tpu.scene import (
        MaterialProperties, RayTracerScene, make_plane, make_sphere)

    env = EnvironmentProperties()
    ray = RayProperties(bounces=4, samples=2)
    frames = 8

    if name in ("cornell", "cornell_sls"):
        cam = _base_cam(build_test_scene())
        if name == "cornell_sls":
            env = EnvironmentProperties(
                lighting_type=EnvironmentalLightingType.SINGLE_LIGHT_SOURCE,
                sun_direction=(0.3, 0.9, 0.2),
                light_size=0.05,
                ambient_light_intensity=0.15,
            )
            ray = RayProperties(bounces=2, samples=2)
    elif name == "textured":
        scene = build_test_scene()
        scene.upsert_material(
            51, version=1,
            properties=MaterialProperties(roughness=0.6, metallic=0.1),
            albedo_texture=_checker_texture(),
        )
        cam = _base_cam(scene)
    elif name == "btf":
        from tests.test_mlvq import synthetic_btf

        scene = build_test_scene()
        scene.upsert_material(
            51, version=1, material_type=MaterialType.COMPRESSED_BTF,
            btf=synthetic_btf(seed=2),
        )
        cam = _base_cam(scene)
        ray = RayProperties(bounces=2, samples=2)
    elif name == "subsurface":
        scene = RayTracerScene()
        scene.upsert_geometry(1, version=0, mesh=make_sphere(0.6, rings=16,
                                                             sectors=24))
        scene.upsert_material(2, version=0, properties=MaterialProperties(
            albedo_color=(0.9, 0.4, 0.3), roughness=0.8, metallic=0.0,
            subsurface_factor=0.7, subsurface_radius=(0.3, 0.3, 0.3),
            subsurface_color=(1.0, 0.6, 0.5)))
        scene.upsert_instance(3, version=0, geometry=1, material=2)
        scene.upsert_geometry(4, version=0, mesh=make_plane(4.0))
        t = _np.eye(4, dtype=_np.float32); t[1, 3] = -0.6
        scene.upsert_material(5, version=0, properties=MaterialProperties(
            albedo_color=(0.4, 0.4, 0.45), roughness=1.0, metallic=0.0))
        scene.upsert_instance(6, version=0, geometry=4, material=5,
                              transform=t)
        cam = _base_cam(scene, pose=((0.0, 0.5, 2.0), (0.0, 0.0, 0.0)),
                        fov=60.0)
        ray = RayProperties(bounces=2, samples=2)
    elif name == "curves":
        rng = _np.random.default_rng(4)
        points, segments = [], []
        for k in range(14):
            base = _np.array([(k % 7 - 3) * 0.22, 0.0,
                              (k // 7 - 0.5) * 0.3], _np.float32)
            tip = base + [rng.normal(0, 0.08), 0.9 + 0.2 * rng.random(),
                          rng.normal(0, 0.08)]
            segments.append(len(points))
            points.append([*base, 0.035, 0.2, 0.6, 0.2, 1.0])
            points.append([*tip, 0.012, 0.2, 0.6, 0.2, 1.0])
        scene = RayTracerScene()
        scene.upsert_geometry(
            1, version=0, renderer_type=RendererType.CURVE,
            geometry_type=GeometryType.LINEAR,
            strand_points=_np.asarray(points, _np.float32),
            curve_segments=_np.asarray(segments, _np.int32))
        scene.upsert_material(2, version=0, properties=MaterialProperties(
            albedo_color=(0.2, 0.55, 0.2), roughness=1.0, metallic=0.0))
        scene.upsert_instance(3, version=0, geometry=1, material=2)
        cam = _base_cam(scene, pose=((0.0, 0.7, 1.8), (0.0, 0.45, 0.0)),
                        fov=55.0)
        ray = RayProperties(bounces=2, samples=2)
    elif name == "nishita":
        scene = build_test_scene()
        cam = _base_cam(scene, pose=((0.0, 1.0, 2.4), (0.0, 1.4, 0.0)))
        env = EnvironmentProperties(
            lighting_type=EnvironmentalLightingType.SKYDOME,
            sun_direction=(0.4, 0.35, 0.2),
            skylight_intensity=1.0,
        )
        ray = RayProperties(bounces=2, samples=1)
        frames = 4
    elif name == "dof":
        cam = _base_cam(build_test_scene())
        cam.camera.aperture = 0.08
        cam.camera.focal_length = 2.4
        ray = RayProperties(bounces=2, samples=2)
    elif name.startswith("out_"):
        # OutputType parity: render() returns the selected buffer
        # (ref RayTracer.cu:494-593 blits normal / albedo / depth-in-albedo)
        from raytracerfacility_tpu.enums import OutputType

        cam = _base_cam(build_test_scene())
        cam.output_type = {"out_normal": OutputType.NORMAL,
                           "out_albedo": OutputType.ALBEDO,
                           "out_depth": OutputType.DEPTH}[name]
        ray = RayProperties(bounces=2, samples=1)
        frames = 2
    else:
        raise KeyError(name)
    img = None
    for _ in range(frames):
        img = cam.render(env, ray)
    return img[..., :3]


GOLDEN_CASES = ["cornell", "cornell_sls", "textured", "btf", "subsurface",
                "curves", "nishita", "dof", "out_normal", "out_albedo",
                "out_depth"]


@pytest.mark.parametrize("name", GOLDEN_CASES)
def test_golden(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.npy")
    img = render_case(name)
    assert np.isfinite(img).all(), f"{name}: non-finite pixels"
    if os.environ.get("REGEN_GOLDENS") or not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.save(path, img.astype(np.float16))
        pytest.skip(f"golden regenerated: {path}")
    golden = np.load(path).astype(np.float32)
    score = ssim(img, golden)
    assert score > 0.98, f"{name}: SSIM {score:.4f} vs golden"
