"""Parity tests: fused whole-path mega-kernel vs the general wavefront engine.

The fused kernel (ops/pallas_fused.py) must reproduce the XLA engine's
images for the statically specializable feature set. RNG streams are
bit-identical by construction (same TEA init in XLA, same LCG recurrence
in-kernel), intersection formulas are identical, so differences reduce to
float associativity in the normal interpolation — tolerances are tight.
"""

from __future__ import annotations

import numpy as np
import pytest

from raytracerfacility_tpu.enums import OutputType
from raytracerfacility_tpu.models.pathtracer import (
    RenderConfig,
    fused_compatible,
    init_frame,
    render_frame_counted_jit,
)


def _scene(flag, monkeypatch):
    monkeypatch.setenv("RTF_TPU_FUSED", flag)
    import __graft_entry__ as ge

    scene, cam, env = ge._bench_scene(48, 48)
    return scene.build(), cam.state(), env.state()


@pytest.mark.parametrize("bounces,samples", [(2, 1), (4, 2)])
def test_fused_matches_wavefront(monkeypatch, bounces, samples):
    compiled_f, cam, env = _scene("1", monkeypatch)
    compiled_x, _, _ = _scene("0", monkeypatch)
    assert compiled_f.fused is not None
    assert compiled_x.fused is None

    config = RenderConfig(
        width=48, height=48, bounces=bounces, samples=samples,
        enable_textures=False, enable_vertex_color=False,
        # the XLA comparison path must use the same spp->lanes fold so RNG
        # streams match (the fused kernel always folds spp into the pool)
        samples_in_lanes=True,
    )
    assert fused_compatible(compiled_f, env, config)
    assert not fused_compatible(compiled_x, env, config)

    frame_f, rays_f = render_frame_counted_jit(
        compiled_f, cam, env, config, init_frame(48, 48))
    frame_x, rays_x = render_frame_counted_jit(
        compiled_x, cam, env, config, init_frame(48, 48))

    color_f = np.asarray(frame_f.color)
    color_x = np.asarray(frame_x.color)
    # identical RNG + identical accept windows: only fp-association noise
    # (plus the occasional t-tie resolved in a different triangle order)
    diff = np.abs(color_f - color_x)
    # bulk must be fp-noise; a small pixel tail may diverge visibly where
    # rounding flips a bounce direction (chaotic amplification is expected
    # for identical-but-reassociated float math)
    assert np.quantile(diff, 0.99) < 2e-3, float(np.quantile(diff, 0.99))
    assert np.quantile(diff, 0.999) < 5e-2, float(np.quantile(diff, 0.999))
    assert diff.mean() < 3e-4, float(diff.mean())

    # honest live-ray counters agree (same termination decisions)
    assert abs(float(rays_f) - float(rays_x)) <= max(2.0, 0.001 * float(rays_x))

    # AOVs
    for a, b in [(frame_f.normal, frame_x.normal),
                 (frame_f.albedo, frame_x.albedo)]:
        d = np.abs(np.asarray(a) - np.asarray(b))
        assert np.quantile(d, 0.999) < 5e-3, float(np.quantile(d, 0.999))


def test_fused_single_light_source_matches_wavefront(monkeypatch):
    """The SLS mode (ambient + one sun-cone NEE shadow ray, no
    continuation — ref RayFunctions.cuh:61-92) runs as a two-phase fused
    kernel (closest-hit sweep, then shadow any-hit sweep) and must match
    the XLA engine."""
    from raytracerfacility_tpu.enums import EnvironmentalLightingType
    from raytracerfacility_tpu.models.renderer import EnvironmentProperties

    compiled_f, cam, _ = _scene("1", monkeypatch)
    compiled_x, _, _ = _scene("0", monkeypatch)
    env = EnvironmentProperties(
        lighting_type=EnvironmentalLightingType.SINGLE_LIGHT_SOURCE,
        sun_direction=(0.3, 0.9, 0.2),
        light_size=0.05,
        ambient_light_intensity=0.15,
    ).state()
    config = RenderConfig(
        width=48, height=48, bounces=2, samples=1,
        lighting_type=EnvironmentalLightingType.SINGLE_LIGHT_SOURCE,
        enable_textures=False, enable_vertex_color=False,
        samples_in_lanes=True,
    )
    assert fused_compatible(compiled_f, env, config)
    frame_f, rays_f = render_frame_counted_jit(
        compiled_f, cam, env, config, init_frame(48, 48))
    frame_x, rays_x = render_frame_counted_jit(
        compiled_x, cam, env, config, init_frame(48, 48))
    diff = np.abs(np.asarray(frame_f.color) - np.asarray(frame_x.color))
    assert np.quantile(diff, 0.99) < 2e-3, float(np.quantile(diff, 0.99))
    assert diff.mean() < 3e-4, float(diff.mean())
    assert abs(float(rays_f) - float(rays_x)) <= max(2.0, 1e-3 * float(rays_x))
    # shadows exist: some hit pixels are in shadow (darker than lit ones)
    img = np.asarray(frame_x.color[..., 0])
    assert img.std() > 0.02


def test_sorted_camera_bitexact_vs_fused(monkeypatch):
    """The segmented+reordered engine must be BIT-IDENTICAL to the fused
    mega-kernel: permutations never change a ray's own arithmetic, and
    the (t, prim-id) lexicographic best-hit min is visit-order
    independent. Guards the reorder/scatter bookkeeping."""
    compiled_f, cam, env = _scene("1", monkeypatch)
    config = RenderConfig(
        width=48, height=48, bounces=3, samples=1,
        enable_textures=False, enable_vertex_color=False,
        samples_in_lanes=True)
    monkeypatch.setenv("RTF_TPU_SORTED", "1")
    frame_s, rays_s = render_frame_counted_jit(
        compiled_f, cam, env, config, init_frame(48, 48))
    monkeypatch.setenv("RTF_TPU_SORTED", "0")
    frame_f, rays_f = render_frame_counted_jit(
        compiled_f, cam, env, config, init_frame(48, 48))
    for name in ("color", "normal", "albedo"):
        np.testing.assert_array_equal(
            np.asarray(getattr(frame_s, name)),
            np.asarray(getattr(frame_f, name)), err_msg=name)
    assert float(rays_s) == float(rays_f)

    # block-local sort (independent per-block argsorts instead of one
    # global sort) is a different permutation but must stay bit-exact
    monkeypatch.setenv("RTF_TPU_SORTED", "1")
    monkeypatch.setenv("RTF_TPU_SORT_BLOCK", "1")
    frame_b, rays_b = render_frame_counted_jit(
        compiled_f, cam, env, config, init_frame(48, 48))
    for name in ("color", "normal", "albedo"):
        np.testing.assert_array_equal(
            np.asarray(getattr(frame_b, name)),
            np.asarray(getattr(frame_f, name)), err_msg=f"block {name}")
    assert float(rays_b) == float(rays_f)


@pytest.mark.parametrize("env_hook", [False, True])
def test_sorted_trace_window_bitexact(monkeypatch, env_hook):
    """The liveness-windowed trace grid (each bounce segment runs on the
    smallest tile-aligned window covering the compacted live prefix)
    must be BIT-IDENTICAL to the full-grid segmented engine: the kernel
    is the identity on dead lanes, so slicing the dead tail off and
    concatenating it back changes no ray's arithmetic. Tiny kernel
    tiles force the 48x48 pool to span 9 tiles so the /2,/4,/8 cascade
    actually engages; env_hook=True additionally windows the per-segment
    XLA miss-shading step (cubemap gather on the window only)."""
    from raytracerfacility_tpu.enums import EnvironmentalLightingType
    from raytracerfacility_tpu.models.renderer import EnvironmentProperties
    from raytracerfacility_tpu.ops import pallas_seg

    compiled_f, cam, env = _scene("1", monkeypatch)
    lighting = EnvironmentalLightingType.SCENE
    if env_hook:
        rng = np.random.default_rng(3)
        cm = rng.uniform(0.0, 1.5, (6, 8, 8, 3)).astype(np.float32)
        env = EnvironmentProperties(skylight_intensity=0.9,
                                    cubemap=cm).state()
    config = RenderConfig(
        width=48, height=48, bounces=4, samples=1, lighting_type=lighting,
        enable_textures=False, enable_vertex_color=False,
        samples_in_lanes=True)
    monkeypatch.setenv("RTF_TPU_SORTED", "1")
    # 18 rows / block_rows=2 -> 9 tiles (>= 8, cascade active)
    monkeypatch.setattr(pallas_seg, "BLOCK_ROWS_ENV", "2")
    monkeypatch.setenv("RTF_TPU_TRACE_WINDOW", "1")
    frame_w, rays_w = render_frame_counted_jit(
        compiled_f, cam, env, config, init_frame(48, 48))
    monkeypatch.setenv("RTF_TPU_TRACE_WINDOW", "0")
    frame_n, rays_n = render_frame_counted_jit(
        compiled_f, cam, env, config, init_frame(48, 48))
    for name in ("color", "normal", "albedo"):
        np.testing.assert_array_equal(
            np.asarray(getattr(frame_w, name)),
            np.asarray(getattr(frame_n, name)), err_msg=name)
    assert float(rays_w) == float(rays_n)
    # non-vacuous: bounce lighting actually contributes
    assert float(np.asarray(frame_n.color).std()) > 0.02


def test_window_cascade_depth_bitexact(monkeypatch):
    """RTF_TPU_SEG_WDEPTH=4 extends BOTH liveness cascades (reorder sort
    windows and trace-grid windows) down to 1/16 of the pool. Windows
    only ever slice the dead tail (live rays are a sorted prefix and the
    kernel is the identity on dead lanes), so any depth is bit-identical
    to the default /8 cascade. 64x64 pool at 2-row kernel tiles -> 16
    tiles and rp = 16 * block, so the depth-4 windows actually engage."""
    from raytracerfacility_tpu.ops import pallas_seg

    compiled_f, cam, env = _scene("1", monkeypatch)
    config = RenderConfig(
        width=64, height=64, bounces=4, samples=1,
        enable_textures=False, enable_vertex_color=False,
        samples_in_lanes=True)
    monkeypatch.setenv("RTF_TPU_SORTED", "1")
    monkeypatch.setattr(pallas_seg, "BLOCK_ROWS_ENV", "2")
    monkeypatch.setenv("RTF_TPU_SEG_WDEPTH", "4")
    frame_d, rays_d = render_frame_counted_jit(
        compiled_f, cam, env, config, init_frame(64, 64))
    monkeypatch.delenv("RTF_TPU_SEG_WDEPTH")
    frame_n, rays_n = render_frame_counted_jit(
        compiled_f, cam, env, config, init_frame(64, 64))
    for name in ("color", "normal", "albedo"):
        np.testing.assert_array_equal(
            np.asarray(getattr(frame_d, name)),
            np.asarray(getattr(frame_n, name)), err_msg=name)
    assert float(rays_d) == float(rays_n)
    assert float(np.asarray(frame_n.color).std()) > 0.02


@pytest.mark.parametrize("vdepth", ["1", "3"])
def test_seg_visit_window_bitexact(monkeypatch, vdepth):
    """RTF_TPU_SEG_VDEPTH=k windows the trace grid's chunk-VISIT axis:
    each segment runs only the smallest static number of visit steps
    (nchunks, /2, ..., /2^k) covering the max accepted-chunk count over
    its tiles. Dropped steps all carry skip == 1 — no-ops that repeat
    the previous chunk window — so any depth is bit-identical to the
    full visit grid. The bench scene packs ~11 chunks at the default
    chunk size, so the cascade genuinely engages."""
    from raytracerfacility_tpu.ops import pallas_seg

    compiled_f, cam, env = _scene("1", monkeypatch)
    config = RenderConfig(
        width=64, height=64, bounces=4, samples=1,
        enable_textures=False, enable_vertex_color=False,
        samples_in_lanes=True)
    monkeypatch.setenv("RTF_TPU_SORTED", "1")
    monkeypatch.setattr(pallas_seg, "BLOCK_ROWS_ENV", "2")
    monkeypatch.setenv("RTF_TPU_SEG_VDEPTH", vdepth)
    frame_v, rays_v = render_frame_counted_jit(
        compiled_f, cam, env, config, init_frame(64, 64))
    monkeypatch.delenv("RTF_TPU_SEG_VDEPTH")
    frame_n, rays_n = render_frame_counted_jit(
        compiled_f, cam, env, config, init_frame(64, 64))
    for name in ("color", "normal", "albedo"):
        np.testing.assert_array_equal(
            np.asarray(getattr(frame_v, name)),
            np.asarray(getattr(frame_n, name)), err_msg=name)
    assert float(rays_v) == float(rays_n)
    assert float(np.asarray(frame_n.color).std()) > 0.02


@pytest.mark.parametrize("split", ["1", "2", "3", "4"])
def test_seg_split_bitexact(monkeypatch, split):
    """RTF_TPU_SEG_SPLIT=s0 slices the ray pool to the smallest static
    tile-aligned width covering the live prefix right after the reorder
    entering segment s0, runs every remaining segment at that width, and
    concatenates the frozen dead tail back once at the end. The reorder
    compacts live rays into an exact prefix, sliced sorts of that prefix
    order the same live set (lax.sort is stable, live keys < dead keys),
    and the kernel is the identity on dead lanes — so any split point is
    BIT-IDENTICAL to the unsplit engine. 64x64 pool at 2-row kernel
    tiles -> 16 tiles >= 2^wdepth, so the split cascade engages."""
    from raytracerfacility_tpu.ops import pallas_seg

    compiled_f, cam, env = _scene("1", monkeypatch)
    config = RenderConfig(
        width=64, height=64, bounces=4, samples=1,
        enable_textures=False, enable_vertex_color=False,
        samples_in_lanes=True)
    monkeypatch.setenv("RTF_TPU_SORTED", "1")
    monkeypatch.setattr(pallas_seg, "BLOCK_ROWS_ENV", "2")
    monkeypatch.setenv("RTF_TPU_SEG_SPLIT", split)
    frame_s, rays_s = render_frame_counted_jit(
        compiled_f, cam, env, config, init_frame(64, 64))
    # compare against the genuinely UNSPLIT engine — "0" explicitly,
    # since the packaged default is now a split point
    monkeypatch.setenv("RTF_TPU_SEG_SPLIT", "0")
    frame_n, rays_n = render_frame_counted_jit(
        compiled_f, cam, env, config, init_frame(64, 64))
    for name in ("color", "normal", "albedo"):
        np.testing.assert_array_equal(
            np.asarray(getattr(frame_s, name)),
            np.asarray(getattr(frame_n, name)), err_msg=name)
    assert float(rays_s) == float(rays_n)
    assert float(np.asarray(frame_n.color).std()) > 0.02


def test_sub_run_bits_bitexact(monkeypatch):
    """RTF_TPU_SEG_SUBBITS=1 precomputes, per (tile, chunk), a bitmask of
    sub-runs the tile's live-ray bundle may hit (XLA-side interval test
    over the sub AABBs) and gates each sub-run's in-kernel slab test on
    its scalar bit. The mask is conservative (any superset of hittable
    runs is correct) and the in-kernel slab still guards passing runs,
    so results are BIT-IDENTICAL to the untabled engine."""
    compiled_f, cam, env = _scene("1", monkeypatch)
    config = RenderConfig(
        width=48, height=48, bounces=4, samples=1,
        enable_textures=False, enable_vertex_color=False,
        samples_in_lanes=True)
    monkeypatch.setenv("RTF_TPU_SORTED", "1")
    monkeypatch.setenv("RTF_TPU_SEG_SUBBITS", "1")
    frame_b, rays_b = render_frame_counted_jit(
        compiled_f, cam, env, config, init_frame(48, 48))
    monkeypatch.delenv("RTF_TPU_SEG_SUBBITS")
    frame_n, rays_n = render_frame_counted_jit(
        compiled_f, cam, env, config, init_frame(48, 48))
    for name in ("color", "normal", "albedo"):
        np.testing.assert_array_equal(
            np.asarray(getattr(frame_b, name)),
            np.asarray(getattr(frame_n, name)), err_msg=name)
    assert float(rays_b) == float(rays_n)
    assert float(np.asarray(frame_n.color).std()) > 0.02


@pytest.mark.parametrize("mode", ["1", "2"])
def test_sub_run_interval_bitexact(monkeypatch, mode):
    """RTF_TPU_SEG_SUBIV=1 precomputes, per (tile, chunk), the [lo, hi)
    HULL of sub-runs the tile's live-ray bundle may hit and runs the
    kernel's sub loop as fori_loop(lo, hi) — runs outside the hull are
    never visited at all. SUBIV=2 keeps the loop static and gates each
    run on a scalar (si >= lo) & (si < hi) cond instead (the
    probe_mosaic p10 composition — no dynamic trip count). The hull is
    conservative (a superset of the hittable runs) and the in-kernel
    per-sub slab still guards every visited run, so results are
    BIT-IDENTICAL to the untabled engine either way."""
    compiled_f, cam, env = _scene("1", monkeypatch)
    config = RenderConfig(
        width=48, height=48, bounces=4, samples=1,
        enable_textures=False, enable_vertex_color=False,
        samples_in_lanes=True)
    monkeypatch.setenv("RTF_TPU_SORTED", "1")
    monkeypatch.setenv("RTF_TPU_SEG_SUBIV", mode)
    frame_v, rays_v = render_frame_counted_jit(
        compiled_f, cam, env, config, init_frame(48, 48))
    monkeypatch.delenv("RTF_TPU_SEG_SUBIV")
    frame_n, rays_n = render_frame_counted_jit(
        compiled_f, cam, env, config, init_frame(48, 48))
    for name in ("color", "normal", "albedo"):
        np.testing.assert_array_equal(
            np.asarray(getattr(frame_v, name)),
            np.asarray(getattr(frame_n, name)), err_msg=name)
    assert float(rays_v) == float(rays_n)
    assert float(np.asarray(frame_n.color).std()) > 0.02


def test_row_group_culling_bitexact(monkeypatch):
    """Row-group culling (the third culling level: per-(group_rows, 128)
    chunk/sub conds inside the tile) must be BIT-IDENTICAL to whole-tile
    culling: per-lane arithmetic, accept windows, and tie rules are
    unchanged — only which lanes SKIP provably-missed runs differs, and
    skipped runs cannot contain an acceptable hit for those lanes."""
    from raytracerfacility_tpu.ops import pallas_seg

    compiled_f, cam, env = _scene("1", monkeypatch)
    config = RenderConfig(
        width=48, height=48, bounces=4, samples=1,
        enable_textures=False, enable_vertex_color=False,
        samples_in_lanes=True)
    monkeypatch.setenv("RTF_TPU_SORTED", "1")
    # 18 rows at block_rows=4 -> group 2 splits each tile in halves
    monkeypatch.setattr(pallas_seg, "BLOCK_ROWS_ENV", "4")
    monkeypatch.setenv("RTF_TPU_SEG_GROUP", "2")
    frame_g, rays_g = render_frame_counted_jit(
        compiled_f, cam, env, config, init_frame(48, 48))
    monkeypatch.setenv("RTF_TPU_SEG_GROUP", "0")
    frame_n, rays_n = render_frame_counted_jit(
        compiled_f, cam, env, config, init_frame(48, 48))
    for name in ("color", "normal", "albedo"):
        np.testing.assert_array_equal(
            np.asarray(getattr(frame_g, name)),
            np.asarray(getattr(frame_n, name)), err_msg=name)
    assert float(rays_g) == float(rays_n)
    assert float(np.asarray(frame_n.color).std()) > 0.02


def test_tiled_raygen_bitexact(monkeypatch):
    """Tiled-order camera pools (RTF_TPU_TILED_RAYGEN: consecutive kernel
    tiles cover square pixel blocks instead of raster strips, tightening
    segment-0 frusta) must be BIT-IDENTICAL to raster order: every pixel
    keeps its reference RNG stream (seeded by raster pixel id), a ray's
    arithmetic never depends on its pool position, and the inverse is a
    reshape/transpose. Out-of-image block padding enters dead (valid=0)
    and must not change the live-ray count."""
    compiled_f, cam, env = _scene("1", monkeypatch)
    config = RenderConfig(
        width=48, height=48, bounces=4, samples=1,
        enable_textures=False, enable_vertex_color=False,
        samples_in_lanes=True)
    monkeypatch.setenv("RTF_TPU_SORTED", "1")
    monkeypatch.setenv("RTF_TPU_TILED_RAYGEN", "1")
    frame_t, rays_t = render_frame_counted_jit(
        compiled_f, cam, env, config, init_frame(48, 48))
    monkeypatch.setenv("RTF_TPU_TILED_RAYGEN", "0")
    frame_r, rays_r = render_frame_counted_jit(
        compiled_f, cam, env, config, init_frame(48, 48))
    for name in ("color", "normal", "albedo"):
        np.testing.assert_array_equal(
            np.asarray(getattr(frame_t, name)),
            np.asarray(getattr(frame_r, name)), err_msg=name)
    assert float(rays_t) == float(rays_r)
    assert float(np.asarray(frame_r.color).std()) > 0.02


def test_block_perm_reorder_bitexact(monkeypatch):
    """The block-permutation reorder (RTF_TPU_SEG_BPERM: per-block min-key
    argsort + one scalar-prefetch DMA pass instead of the 15-plane XLA
    sort) must be BIT-IDENTICAL to the sort reorder: any permutation of
    lanes is correct (a ray's arithmetic never depends on its lane, the
    best-hit record is visit-order independent, and the final unsort
    restores original order), and the block-prefix trace window covers
    every not-all-dead block, so no live lane is ever sliced off."""
    from raytracerfacility_tpu.ops import pallas_seg

    compiled_f, cam, env = _scene("1", monkeypatch)
    config = RenderConfig(
        width=48, height=48, bounces=4, samples=1,
        enable_textures=False, enable_vertex_color=False,
        samples_in_lanes=True)
    monkeypatch.setenv("RTF_TPU_SORTED", "1")
    # 20 rows at block_rows=4 -> 10 two-row permutation blocks, 5 tiles
    monkeypatch.setattr(pallas_seg, "BLOCK_ROWS_ENV", "4")
    monkeypatch.setenv("RTF_TPU_SEG_BPERM", "2")
    frame_b, rays_b = render_frame_counted_jit(
        compiled_f, cam, env, config, init_frame(48, 48))
    # hybrid: every 2nd reorder in the bperm region is the exact
    # compacting sort (RTF_TPU_SEG_BPERM_EXACT) — still bit-identical
    monkeypatch.setenv("RTF_TPU_SEG_BPERM_EXACT", "2")
    frame_h, rays_h = render_frame_counted_jit(
        compiled_f, cam, env, config, init_frame(48, 48))
    monkeypatch.delenv("RTF_TPU_SEG_BPERM_EXACT")
    monkeypatch.setenv("RTF_TPU_SEG_BPERM", "0")
    frame_n, rays_n = render_frame_counted_jit(
        compiled_f, cam, env, config, init_frame(48, 48))
    for name in ("color", "normal", "albedo"):
        np.testing.assert_array_equal(
            np.asarray(getattr(frame_b, name)),
            np.asarray(getattr(frame_n, name)), err_msg=name)
        np.testing.assert_array_equal(
            np.asarray(getattr(frame_h, name)),
            np.asarray(getattr(frame_n, name)), err_msg="hybrid " + name)
    assert float(rays_b) == float(rays_n)
    assert float(rays_h) == float(rays_n)
    assert float(np.asarray(frame_n.color).std()) > 0.02


def _feature_scene(monkeypatch, size):
    """A wavefront-engine scene: textured (alpha-testable) + BTF + vertex
    colors over the bench geometry — the reference's full in-pipeline
    shading feature set (RayFunctions.cuh:5-258)."""
    import numpy as np_

    from raytracerfacility_tpu.enums import MaterialType
    from raytracerfacility_tpu.scene import MaterialProperties
    from tests.test_golden import _checker_texture
    from tests.test_mlvq import synthetic_btf
    import __graft_entry__ as ge

    monkeypatch.setenv("RTF_TPU_PALLAS_BRUTE", "1")
    scene, cam, env = ge._bench_scene(size, size)
    scene.upsert_material(
        51, version=1,
        properties=MaterialProperties(roughness=0.6, metallic=0.1,
                                      transmission=0.35),
        albedo_texture=_checker_texture(),
    )
    scene.upsert_material(103, version=1,
                          material_type=MaterialType.COMPRESSED_BTF,
                          btf=synthetic_btf(seed=2))
    return scene.build(), cam.state(), env.state()


@pytest.mark.parametrize("size,bounces", [(64, 2), (96, 3)])
def test_sorted_state_bitexact(monkeypatch, size, bounces):
    """The sorted-state wavefront engine (PathState sorted + compacted
    across segments, windowed Pallas trace, windowed XLA hit shade) vs the
    per-segment loop over the full feature set (textures, alpha cutout,
    BTF, vertex attrs). Per-ray sequencing (RNG order, accept decisions,
    live-ray counts) is identical; pixel values agree to the ULP except
    where the windowed XLA shade's batch shape changes FMA contraction in
    the texture/BTF fetch math (same caveat as the bucketed BTF decode,
    tests/test_btf_bucketed.py) — bounded here at <=2% of elements, 1e-6
    absolute. size=96 pushes the pool past the 8192-lane bar so the
    liveness-window cascade engages."""
    compiled, cam, env = _feature_scene(monkeypatch, size)
    assert compiled.pallas_tris is not None
    config = RenderConfig(
        width=size, height=size, bounces=bounces, samples=1,
        alpha_test=True, alpha_segments=8, enable_btf=True,
        enable_textures=True, enable_vertex_color=False)
    monkeypatch.setenv("RTF_TPU_SORTED_STATE", "1")
    frame_s, rays_s = render_frame_counted_jit(
        compiled, cam, env, config, init_frame(size, size))
    monkeypatch.setenv("RTF_TPU_SORTED_STATE", "0")
    frame_n, rays_n = render_frame_counted_jit(
        compiled, cam, env, config, init_frame(size, size))
    for name in ("color", "normal", "albedo"):
        a = np.asarray(getattr(frame_s, name))
        b = np.asarray(getattr(frame_n, name))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=2e-6, err_msg=name)
        frac = float((a != b).mean())
        assert frac <= 0.02, f"{name}: {frac:.4f} of elements differ"
    assert float(rays_s) == float(rays_n)
    assert float(np.asarray(frame_n.color).std()) > 0.02


def test_sorted_state_curves_bitexact(monkeypatch):
    """Strands scenes run the sorted-state engine too (the streaming trace
    kernel dispatches curve runs in-kernel; shading and the exact-surface
    refinement run in the windowed XLA shade) — bit-identical to the
    unsorted wavefront loop. Ref: the reference traces curves in the same
    hot pipeline via builtin IS modules (RayTracer.cu:1773-1787)."""
    from tests.test_golden import render_case  # scene recipe reuse
    from raytracerfacility_tpu.models.renderer import (
        EnvironmentProperties, RayProperties, RayTracerCamera)
    import tests.test_golden as tg

    monkeypatch.setenv("RTF_TPU_PALLAS_BRUTE", "1")

    def run(flag):
        monkeypatch.setenv("RTF_TPU_SORTED_STATE", flag)
        # the curves golden case at 64x64, 2 bounces (render_case builds
        # a fresh scene per call; seeds/pose identical)
        return render_case("curves")

    img_s = run("1")
    img_n = run("0")
    np.testing.assert_array_equal(img_s, img_n)
    assert float(np.asarray(img_n).std()) > 0.01


@pytest.mark.parametrize("env_kind", ["cubemap", "skydome"])
def test_sorted_env_hook_matches_wavefront(monkeypatch, env_kind):
    """Cubemap Scene and Nishita Skydome environments run on the
    segmented fast path via its per-segment XLA miss hook (the monolithic
    fused kernel cannot shade them); results must match the wavefront
    engine, which computes the identical miss formula."""
    from raytracerfacility_tpu.enums import EnvironmentalLightingType
    from raytracerfacility_tpu.models.pathtracer import sorted_env_compatible
    from raytracerfacility_tpu.models.renderer import EnvironmentProperties

    compiled_f, cam, _ = _scene("1", monkeypatch)
    compiled_x, _, _ = _scene("0", monkeypatch)
    if env_kind == "cubemap":
        rng = np.random.default_rng(0)
        cm = rng.uniform(0.0, 1.5, (6, 8, 8, 3)).astype(np.float32)
        envp = EnvironmentProperties(skylight_intensity=0.9, cubemap=cm)
        lighting = EnvironmentalLightingType.SCENE
    else:
        envp = EnvironmentProperties(
            lighting_type=EnvironmentalLightingType.SKYDOME,
            sun_direction=(0.2, 0.8, 0.3), skylight_intensity=1.0)
        lighting = EnvironmentalLightingType.SKYDOME
    env = envp.state()
    config = RenderConfig(
        width=48, height=48, bounces=2, samples=1, lighting_type=lighting,
        enable_textures=False, enable_vertex_color=False)
    assert sorted_env_compatible(compiled_f, env, config)
    assert not sorted_env_compatible(compiled_x, env, config)

    frame_f, rays_f = render_frame_counted_jit(
        compiled_f, cam, env, config, init_frame(48, 48))
    frame_x, rays_x = render_frame_counted_jit(
        compiled_x, cam, env, config, init_frame(48, 48))
    diff = np.abs(np.asarray(frame_f.color) - np.asarray(frame_x.color))
    assert np.quantile(diff, 0.99) < 2e-3, float(np.quantile(diff, 0.99))
    assert diff.mean() < 3e-4, float(diff.mean())
    assert abs(float(rays_f) - float(rays_x)) <= max(2.0, 1e-3 * float(rays_x))
    # primary-miss albedo AOV carries the environment radiance
    d_alb = np.abs(np.asarray(frame_f.albedo) - np.asarray(frame_x.albedo))
    assert np.quantile(d_alb, 0.999) < 5e-3, float(np.quantile(d_alb, 0.999))
    # non-vacuous: the sky is actually visible and varies
    assert float(np.asarray(frame_x.color).std()) > 0.02


def test_fused_depth_output(monkeypatch):
    compiled_f, cam, env = _scene("1", monkeypatch)
    config = RenderConfig(width=48, height=48, bounces=1, samples=1,
                          output_type=OutputType.DEPTH,
                          enable_textures=False, enable_vertex_color=False)
    frame, _ = render_frame_counted_jit(
        compiled_f, cam, env, config, init_frame(48, 48))
    depth = np.asarray(frame.albedo[..., 0])
    assert np.isfinite(depth).all()
    assert depth.min() >= 0.0 and depth.max() <= 1.0
    assert depth.std() > 1e-3  # actual scene structure visible


def test_fused_illumination_estimator_matches(monkeypatch):
    """Probe pools ride the fused kernel when the scene qualifies; the
    energies must match the wavefront estimator (same RNG streams)."""
    from raytracerfacility_tpu.models.illumination import estimate_illumination
    from raytracerfacility_tpu.models.illumination import probes_from_mesh
    from raytracerfacility_tpu.scene import make_sphere

    compiled_f, _, env = _scene("1", monkeypatch)
    compiled_x, _, _ = _scene("0", monkeypatch)
    probes = probes_from_mesh(make_sphere(0.4, rings=6, sectors=8),
                              np.eye(4, dtype="float32"))
    config = RenderConfig(bounces=2, samples=2, enable_textures=False,
                          enable_vertex_color=False)
    out_f = estimate_illumination(compiled_f, env, config, probes, seed=3)
    out_x = estimate_illumination(compiled_x, env, config, probes, seed=3)
    d = np.abs(np.asarray(out_f.energy) - np.asarray(out_x.energy))
    assert np.quantile(d, 0.99) < 2e-3, float(np.quantile(d, 0.99))
    assert float(np.asarray(out_x.energy).mean()) > 1e-3  # non-trivial


def test_auto_chunk_window_bound(monkeypatch):
    """The chunk size must never exceed 512: the per-chunk table window
    is SMEM-resident at 512 B/row double-buffered, so larger chunks fail
    program load outright (config 6 diagnosis, round 5). Many-chunk
    scenes fit their order/skip tables by growing the TILE height
    instead (_pick_block_rows)."""
    import raytracerfacility_tpu.ops.pallas_fused as pf
    from raytracerfacility_tpu.ops.pallas_seg import _pick_block_rows

    monkeypatch.setattr(pf, "_CHUNK_ENV", None)
    for n in (1_000, 65_536, 111_000, 1_038_336, 33_554_432):
        chunk = pf.auto_chunk(n)
        assert chunk == (256 if n < 65_536 else 512)

    # SMEM model: tables (tiles x nchunks x 8 B) must fit the ~400 KB
    # budget next to the 524 KB chunk window. config-6 shape: 2048 pool
    # rows, 2032 chunks -> 128-row tiles (16 tiles, 260 KB). Small
    # scenes keep the measured 16/32 defaults.
    assert _pick_block_rows(2048, nchunks=2032) == 128
    assert _pick_block_rows(16384, nchunks=90) == 32  # headline-class: 368 KB fits
    assert _pick_block_rows(4096, nchunks=40) == 16
    for rows, nchunks in ((2048, 2032), (16384, 2032), (512, 4096)):
        br = _pick_block_rows(rows, nchunks=nchunks)
        assert (rows // br) * nchunks * 8 <= 400_000 or br >= rows
