"""Pooled progressive frames must be bit-identical to the sequential scan.

Progressive frames reseed independently per frame (ref
ptx/CameraRendering.cu:42-44), so render_frames_counted's group pooling
(models/pathtracer.py::render_samples_frames_pooled) is a pure batching
transform: the per-frame fold replays finalize_frame's exact accumulation
recurrence over per-frame pool slices. These tests pin that invariant on
both engine families (wavefront BTF path; fused/segmented fast path).
"""

import numpy as np
import pytest

from raytracerfacility_tpu.enums import MaterialType
from raytracerfacility_tpu.models.pathtracer import (
    RenderConfig,
    _frame_pool_group,
    init_frame,
    render_frames_counted,
)
from raytracerfacility_tpu.models.renderer import EnvironmentProperties
from raytracerfacility_tpu.ops.camera import CameraProperties
from raytracerfacility_tpu.scene import (
    MaterialProperties,
    RayTracerScene,
    make_sphere,
)


def _btf_scene():
    from tests.test_mlvq import synthetic_btf

    scene = RayTracerScene()
    scene.upsert_geometry(1, version=0,
                          mesh=make_sphere(0.6, rings=8, sectors=12))
    scene.upsert_material(2, version=0,
                          material_type=MaterialType.COMPRESSED_BTF,
                          btf=synthetic_btf(seed=2))
    scene.upsert_instance(3, version=0, geometry=1, material=2)
    return scene, RenderConfig(width=32, height=32, bounces=2, samples=1,
                               enable_btf=True, enable_textures=False,
                               enable_vertex_color=False)


def _fused_scene():
    scene = RayTracerScene()
    scene.upsert_geometry(1, version=0,
                          mesh=make_sphere(0.6, rings=8, sectors=12))
    scene.upsert_material(2, version=0, properties=MaterialProperties(
        albedo_color=(0.7, 0.7, 0.7), roughness=1.0, metallic=0.0))
    scene.upsert_instance(3, version=0, geometry=1, material=2)
    return scene, RenderConfig(width=32, height=32, bounces=2, samples=1,
                               enable_textures=False,
                               enable_vertex_color=False)


def _render_both(scene, config, monkeypatch, frames=4):
    compiled = scene.build()
    cam = CameraProperties(fov=60.0, size=(config.width, config.height))
    cam.look_at_target((0.0, 0.4, 2.2), (0.0, 0.0, 0.0))
    cam_state = cam.state()
    env_state = EnvironmentProperties().state()

    monkeypatch.setenv("RTF_TPU_FRAME_POOL_RAYS", "0")
    assert _frame_pool_group(config, frames) == 1
    f_seq, r_seq = render_frames_counted(
        compiled, cam_state, env_state, config,
        init_frame(config.width, config.height), frames)

    monkeypatch.setenv("RTF_TPU_FRAME_POOL_RAYS", str(1 << 22))
    assert _frame_pool_group(config, frames) == frames
    f_pool, r_pool = render_frames_counted(
        compiled, cam_state, env_state, config,
        init_frame(config.width, config.height), frames)
    return f_seq, r_seq, f_pool, r_pool


def test_pooled_frames_bitexact_fused(monkeypatch):
    scene, config = _fused_scene()
    f_seq, r_seq, f_pool, r_pool = _render_both(scene, config, monkeypatch)
    assert float(r_seq) == float(r_pool)
    for name in ("color", "normal", "albedo"):
        a = np.asarray(getattr(f_seq, name))
        b = np.asarray(getattr(f_pool, name))
        assert np.array_equal(a, b), name
    assert int(f_seq.frame_id) == int(f_pool.frame_id) == 4


def test_pooled_frames_btf(monkeypatch):
    """BTF pools cannot promise bit-equality across pool sizes: the
    liveness-bucketed MLVQ decode's window shape changes XLA codegen, so
    lanes within a ULP of a table-cell boundary may land in the adjacent
    cell (models/pathtracer._btf_colors note; same bound as
    test_btf_bucketed). Everything else must match to ULP level."""
    scene, config = _btf_scene()
    f_seq, r_seq, f_pool, r_pool = _render_both(scene, config, monkeypatch)
    assert float(r_seq) == float(r_pool)
    for name in ("color", "normal", "albedo"):
        a = np.asarray(getattr(f_seq, name))
        b = np.asarray(getattr(f_pool, name))
        close = np.isclose(a, b, rtol=1e-5, atol=1e-4).all(axis=-1)
        n_flip = (~close).sum()
        assert n_flip <= 0.01 * close.size, f"{name}: {n_flip} boundary flips"


def test_pool_group_divisor_and_cap(monkeypatch):
    config = RenderConfig(width=64, height=64, bounces=1, samples=1)
    monkeypatch.setenv("RTF_TPU_FRAME_POOL_RAYS", str(3 * 64 * 64))
    # largest divisor of 8 fitting 3 frames' rays is 2
    assert _frame_pool_group(config, 8) == 2
    # multi-spp configs keep the sequential scan
    config_spp = RenderConfig(width=64, height=64, bounces=1, samples=4)
    assert _frame_pool_group(config_spp, 8) == 1
