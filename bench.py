"""Headline benchmark: Mrays/s for the flagship path-trace config.

BASELINE.md config 2: 1080p, 8 bounces, glossy/metallic materials,
progressive accumulation, on the real TPU chip (default backend).
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The ray count is honest: only lanes that were alive at the start of a path
segment count toward the numerator. Target: 100 Mrays/s/chip (BASELINE.md).

Runtime realities measured on the axon-tunneled v5e this round (see
raytracerfacility_tpu/ops/pallas_trace.py for the full notes): timing is
only valid when fenced by a device->host transfer of a dependent value
(block_until_ready can return early), and the worker kills programs that
run longer than ~60 s. With the Pallas brute-trace mega-kernel
(ops/pallas_brute.py) a 1080p 8-bounce frame runs in ~1.6 s, well under
the watchdog; the benchmark still walks the resolution ladder downward on
failure and runs each attempt in a fresh subprocess (a crashed worker
poisons the client that hit it).
"""

from __future__ import annotations

import json
import os
import sys
import time

# Persistent compile cache: the axon runtime's remote Mosaic compiles cost
# 30-300 s per kernel variant, but the plugin ships a fingerprint-keyed
# executable cache that activates when JAX's cache dir is set — measured
# 35.2 s -> 1.47 s for a Pallas kernel across processes
# (scripts/probe_cache.py). Benchmarks and their subprocesses inherit this.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_rtf")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

TARGET_MRAYS = 100.0
# headline config first (BASELINE.md: 1080p 8-bounce), descending fallbacks
RESOLUTIONS = [(1920, 1080), (1280, 720), (960, 540), (640, 360)]

# Roofline proxy constants (documented assumptions, not vendor specs):
# the streaming trace kernel spends ~40 VPU f32 ops per (live ray,
# table row) pair it actually visits (Moller-Trumbore + carry blends,
# ops/pallas_fused.py tri_body); v5e VPU peak is taken as
# 8 sublanes x 128 lanes x 4 ALUs x ~0.94 GHz ~= 3.85 Tf32op/s/core.
# 'vpu_peak_pct_proxy' therefore reads: what fraction of VPU peak the
# measured throughput would represent IF every (ray, row) pair were
# visited (culling makes the true visited fraction lower, so this is a
# lower bound on efficiency over visited work and an upper bound on
# brute-force-equivalent utilization).
OPS_PER_PAIR = 40.0
VPU_PEAK_OPS = 3.85e12


def run_once(width, height, frames):
    from __graft_entry__ import _bench_scene
    from raytracerfacility_tpu.models.pathtracer import (
        RenderConfig,
        init_frame,
        render_frames_counted_jit,
    )

    scene, cam, env = _bench_scene(width, height)
    compiled = scene.build()
    # the bench scene binds no textures / vertex-color materials: statically
    # specialize the shading path like the renderer facade would
    config = RenderConfig(width=width, height=height, bounces=8, samples=1,
                          enable_textures=False, enable_vertex_color=False)
    cam_state = cam.state()
    env_state = env.state()
    frame = init_frame(width, height)

    # warmup: compile + one fenced execution
    frame, rays = render_frames_counted_jit(
        compiled, cam_state, env_state, config, frame, frames
    )
    _ = float(frame.color[0, 0, 0])

    # all frames run as ONE dispatch (lax.scan over progressive frames,
    # bit-identical to the per-frame loop — tests/test_progressive.py),
    # fenced once by the live-ray scalar readback. This matches the
    # reference's render loop, which never syncs to host between frames
    # (accumulation feeds forward on-GPU and the frame blits to a GL
    # texture, RayTracer.cu:2232-2256). Per-frame host fencing measured
    # ~28 ms/frame of pure tunnel round-trip — 7% of a 1080p frame and
    # >60% of a 256x256 one. (Queueing dependent per-frame DISPATCHES
    # unfenced is still pathological on this runtime — 169 ms/frame,
    # PERF.md round 2 — the scan avoids per-frame dispatch entirely.)
    t0 = time.perf_counter()
    frame, rays = render_frames_counted_jit(
        compiled, cam_state, env_state, config, init_frame(width, height),
        frames
    )
    total_rays = float(rays)
    dt = time.perf_counter() - t0
    # UNPADDED primitive count: v0.shape[0] carries up to 255 zero pad
    # rows (~9% inflation on the 2.8k-row bench scene, VERDICT r3 weak 5)
    ntris = int(compiled.num_tris or compiled.geometry.v0.shape[0])
    pairs_per_s = total_rays / dt * ntris
    return total_rays / dt / 1e6, pairs_per_s


def _run_single(width: int, height: int, frames: int) -> None:
    """Subprocess entry: one resolution attempt, prints '<mrays>' on
    success."""
    try:
        mrays, pairs = run_once(width, height, frames)
        print(f"RESULT {mrays:.6f} {pairs:.6e}")
    except Exception as exc:
        print(f"FAILED {str(exc)[:140]}", file=sys.stderr)
        sys.exit(1)


# ---------------------------------------------------------------------------
# BASELINE.md configs 1/3/4/5 (run with --all; the driver's single JSON
# line stays the config-2 headline)
# ---------------------------------------------------------------------------


def _timed_frames(scene, cam, env, config, frames=8):
    import jax

    from raytracerfacility_tpu.models.pathtracer import (
        init_frame, render_frames_counted_jit)

    compiled = scene.build()
    cam_state, env_state = cam.state(), env.state()
    frame = init_frame(config.width, config.height)
    frame, rays = render_frames_counted_jit(
        compiled, cam_state, env_state, config, frame, frames)
    _ = float(frame.color[0, 0, 0])
    # one scan dispatch for all frames, one fence (see run_once note)
    t0 = time.perf_counter()
    frame, rays = render_frames_counted_jit(
        compiled, cam_state, env_state, config,
        init_frame(config.width, config.height), frames)
    total = float(rays)
    return total / (time.perf_counter() - t0) / 1e6


def run_config1() -> dict:
    """512x512 single-mesh diffuse, 1 bounce, 1 spp."""
    import numpy as np

    from raytracerfacility_tpu.models.pathtracer import RenderConfig
    from raytracerfacility_tpu.models.renderer import EnvironmentProperties
    from raytracerfacility_tpu.ops.camera import CameraProperties
    from raytracerfacility_tpu.scene import (
        MaterialProperties, RayTracerScene, make_sphere)

    scene = RayTracerScene()
    scene.upsert_geometry(1, version=0, mesh=make_sphere(0.6, rings=24,
                                                         sectors=48))
    scene.upsert_material(2, version=0, properties=MaterialProperties(
        albedo_color=(0.7, 0.7, 0.7), roughness=1.0, metallic=0.0))
    scene.upsert_instance(3, version=0, geometry=1, material=2)
    cam = CameraProperties(fov=60.0, size=(512, 512))
    cam.look_at_target((0.0, 0.4, 2.2), (0.0, 0.0, 0.0))
    config = RenderConfig(width=512, height=512, bounces=1, samples=1,
                          enable_textures=False, enable_vertex_color=False)
    mrays = _timed_frames(scene, cam, EnvironmentProperties(), config)
    return {"metric": "config1_512_diffuse_1bounce", "value": round(mrays, 3),
            "unit": "Mrays/s", "vs_baseline": round(mrays / TARGET_MRAYS, 4)}


def run_config3() -> dict:
    """CompressedBTF (MLVQ) material on a curved mesh."""
    import numpy as np

    from raytracerfacility_tpu.enums import MaterialType
    from raytracerfacility_tpu.models.pathtracer import RenderConfig
    from raytracerfacility_tpu.models.renderer import EnvironmentProperties
    from raytracerfacility_tpu.ops.camera import CameraProperties
    from raytracerfacility_tpu.scene import (
        MaterialProperties, RayTracerScene, make_sphere)
    from raytracerfacility_tpu.mlvq.synthetic import synthetic_btf

    scene = RayTracerScene()
    scene.upsert_geometry(1, version=0, mesh=make_sphere(0.6, rings=24,
                                                         sectors=48))
    scene.upsert_material(2, version=0,
                          material_type=MaterialType.COMPRESSED_BTF,
                          btf=synthetic_btf(seed=2))
    scene.upsert_instance(3, version=0, geometry=1, material=2)
    cam = CameraProperties(fov=60.0, size=(256, 256))
    cam.look_at_target((0.0, 0.4, 2.2), (0.0, 0.0, 0.0))
    # enable_textures/enable_vertex_color mirror the facade's static
    # derivation for this scene (renderer._has_textures/_has_vertex_color:
    # no textures bound, no VertexColor material), same as config 1
    config = RenderConfig(width=256, height=256, bounces=2, samples=1,
                          enable_btf=True, enable_textures=False,
                          enable_vertex_color=False)
    mrays = _timed_frames(scene, cam, EnvironmentProperties(), config)
    return {"metric": "config3_btf_curved_mesh", "value": round(mrays, 3),
            "unit": "Mrays/s", "vs_baseline": round(mrays / TARGET_MRAYS, 4)}


def run_config4() -> dict:
    """Per-triangle illumination over a procedural sorghum canopy
    (>= 100k triangles)."""
    import numpy as np

    from raytracerfacility_tpu.models.illumination import (
        TriangleIlluminationEstimator)
    from raytracerfacility_tpu.models.pathtracer import RenderConfig
    from raytracerfacility_tpu.models.renderer import EnvironmentProperties
    from raytracerfacility_tpu.scene.procedural import (
        build_canopy_scene, make_canopy_instances, make_sorghum_plant)

    rows = cols = 17
    scene = build_canopy_scene(rows=rows, cols=cols)
    compiled = scene.build()
    plants = [make_sorghum_plant(seed=v) for v in range(4)]
    mats = make_canopy_instances(rows, cols, seed=0)
    per = (rows * cols + 3) // 4
    items = []
    for v in range(4):
        for m in mats[v * per:(v + 1) * per]:
            items.append((plants[v], m))
    est = TriangleIlluminationEstimator()
    probes = est.prepare_light_probe_group(items)
    env = EnvironmentProperties(skylight_intensity=1.0).state()
    config = RenderConfig(bounces=2, samples=1, enable_textures=False,
                          enable_vertex_color=False)
    est.sample_light_probe_group(compiled, env, config, seed=1)  # compile
    # fence the warmup with the SAME readback as the timed call (the
    # first energy[0,0] eager slice pays a one-time ~0.7 s remote
    # compile on this runtime; config 2's warmup does the same)
    _ = float(est.probes.energy[0, 0])
    t0 = time.perf_counter()
    est.sample_light_probe_group(compiled, env, config, seed=2)
    _ = float(est.probes.energy[0, 0])
    dt = time.perf_counter() - t0
    rate = probes.num_probes * 2 * config.samples / dt / 1e6
    return {"metric": "config4_canopy_illumination_111k_tris",
            "value": round(rate, 4), "unit": "Mprobe-rays/s",
            "vs_baseline": round(rate / TARGET_MRAYS, 5),
            "probes": probes.num_probes,
            "triangles": int(compiled.geometry.num_triangles),
            "seconds": round(dt, 2)}


def run_config5() -> dict:
    """LiDAR sweep + CNN-denoised render sharing one built scene."""
    import numpy as np

    from __graft_entry__ import _bench_scene
    from raytracerfacility_tpu.models.lidar import PointCloudScanner
    from raytracerfacility_tpu.models.renderer import (
        EnvironmentProperties, RayProperties, RayTracerCamera)

    scene, camprops, env = _bench_scene(512, 512)
    cam = RayTracerCamera(scene, camera=camprops)
    cam.camera.denoiser_strength = 1.0
    scanner = PointCloudScanner(size=(2.0, 2.0), distance=(0.004, 0.004))
    # warmup both launch types on the shared compiled scene
    img = cam.render(env, RayProperties(bounces=4, samples=1))
    n_hits = scanner.scan(scene.build(), position=(0.0, 1.0, 2.5))
    t0 = time.perf_counter()
    img = cam.render(env, RayProperties(bounces=4, samples=1))
    n_hits = scanner.scan(scene.build(), position=(0.0, 1.0, 2.5))
    dt = time.perf_counter() - t0
    lidar_samples = 500 * 500
    total = lidar_samples + 512 * 512
    denoised = cam.denoiser is not None and cam.denoiser.params is not None
    return {"metric": "config5_lidar_plus_denoised_render",
            "value": round(total / dt / 1e6, 3), "unit": "Mqueries/s",
            "vs_baseline": round(total / dt / 1e6 / TARGET_MRAYS, 4),
            "lidar_hits": int(n_hits), "denoiser_active": bool(denoised),
            "seconds": round(dt, 3)}


def run_config6() -> dict:
    """>=1M-triangle instanced canopy, camera render on the streaming
    engine — the scale-story evidence row (VERDICT r3 item 4): the SMEM
    window design streams the whole table from HBM, so triangle count is
    bounded by HBM (80 B/tri), not on-chip memory."""
    from raytracerfacility_tpu.models.pathtracer import RenderConfig
    from raytracerfacility_tpu.models.renderer import EnvironmentProperties
    from raytracerfacility_tpu.ops.camera import CameraProperties
    from raytracerfacility_tpu.scene.procedural import build_canopy_scene

    rows = cols = 52  # 2704 plants x ~384 tris ~= 1.04M triangles
    scene = build_canopy_scene(rows=rows, cols=cols)
    compiled = scene.build()
    ntris = int(compiled.num_tris or compiled.geometry.num_triangles)
    cam = CameraProperties(fov=60.0, size=(512, 512))
    cam.look_at_target((0.0, 6.0, 14.0), (0.0, 1.0, 0.0))
    config = RenderConfig(width=512, height=512, bounces=2, samples=1,
                          enable_textures=False, enable_vertex_color=False)
    mrays = _timed_frames(scene, cam, EnvironmentProperties(), config,
                          frames=2)
    return {"metric": "config6_1M_tri_streaming", "value": round(mrays, 3),
            "unit": "Mrays/s", "vs_baseline": round(mrays / TARGET_MRAYS, 4),
            "triangles": ntris}


def run_config7() -> dict:
    """Strands scene (hair tuft of cubic B-spline strands over a ground
    plane) on the sorted-state fast path — the curves bench row (VERDICT
    r3 item 3). The reference traces curves in its one hot pipeline via
    builtin IS modules (RayTracer.cu:1773-1787); here curve runs dispatch
    in-kernel by kind (ops/pallas_brute.py) and the wavefront PathState
    stays coherence-sorted across segments (models/pathtracer.py
    ::_sorted_state_loop, bit-identical to the unsorted loop —
    tests/test_fused.py::test_sorted_state_curves_bitexact)."""
    from raytracerfacility_tpu.models.pathtracer import RenderConfig
    from raytracerfacility_tpu.models.renderer import EnvironmentProperties
    from raytracerfacility_tpu.ops.camera import CameraProperties
    from raytracerfacility_tpu.scene.procedural import build_strands_scene

    scene = build_strands_scene(n_strands=800, seed=7)
    cam = CameraProperties(fov=50.0, size=(512, 512))
    cam.look_at_target((0.0, 0.9, 2.4), (0.0, 0.55, 0.0))
    config = RenderConfig(width=512, height=512, bounces=2, samples=1,
                          enable_textures=False, enable_vertex_color=False)
    compiled = scene.build()
    nprims = int(compiled.geometry.num_triangles)
    mrays = _timed_frames(scene, cam, EnvironmentProperties(), config)
    return {"metric": "config7_strands_hair_tuft", "value": round(mrays, 3),
            "unit": "Mrays/s", "vs_baseline": round(mrays / TARGET_MRAYS, 4),
            "curve_prims": nprims}


def run_sharded() -> dict:
    """Multi-chip scaling audit on the 8-device virtual CPU mesh (the
    TPU-ready sharded path exercised without 8 real chips; wall-clock on
    virtual devices is not meaningful, correctness + collective layout is).
    """
    import subprocess

    code = (
        "from __graft_entry__ import dryrun_multichip;"
        "dryrun_multichip(8); print('SHARDED_OK')"
    )
    proc = subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, timeout=1500)
    ok = "SHARDED_OK" in proc.stdout
    return {"metric": "sharded_8dev_virtual_mesh", "value": 1.0 if ok else 0.0,
            "unit": "ok", "vs_baseline": 1.0 if ok else 0.0}


def run_sharded_tpu() -> dict:
    """REAL-CHIP sharding smoke: a 1-device jax.sharding.Mesh execution of
    render_frame_sharded + estimate_illumination_sharded on the TPU —
    catches TPU-only shard_map/Pallas lowering failures that the virtual
    CPU mesh cannot (the shard_map wraps the same Pallas kernels the
    single-chip path runs). Wall-clock is irrelevant; lowering + one step
    executing is the signal."""
    import subprocess

    code = r"""
import numpy as np, jax
from __graft_entry__ import _bench_scene
from raytracerfacility_tpu.models.pathtracer import RenderConfig, init_frame
from raytracerfacility_tpu.models.illumination import probes_from_mesh
from raytracerfacility_tpu.parallel import (
    make_mesh, render_frame_sharded, estimate_illumination_sharded)
from raytracerfacility_tpu.scene import make_sphere

devices = jax.devices()[:1]
scene, cam, env = _bench_scene(64, 64)
compiled = scene.build()
mesh = make_mesh(1, tile=1, spp=1, devices=devices)
config = RenderConfig(width=64, height=64, bounces=2, samples=1,
                      enable_textures=False, enable_vertex_color=False)
frame = render_frame_sharded(compiled, cam.state(), env.state(), config,
                             init_frame(64, 64), mesh)
assert np.isfinite(np.asarray(frame.color)).all()
probes = probes_from_mesh(make_sphere(0.4, rings=5, sectors=7),
                          np.eye(4, dtype=np.float32))
est = estimate_illumination_sharded(
    compiled, env.state(), RenderConfig(bounces=2, samples=1), probes,
    mesh, seed=1)
assert np.isfinite(np.asarray(est.energy)).all()
print('SHARDED_TPU_OK', float(np.asarray(frame.color).mean()))
"""
    try:
        proc = subprocess.run([sys.executable, "-c", code],
                              capture_output=True, text=True, timeout=1700)
        ok = "SHARDED_TPU_OK" in proc.stdout
    except subprocess.TimeoutExpired:
        ok = False
    return {"metric": "sharded_tpu_1dev", "value": 1.0 if ok else 0.0,
            "unit": "ok", "vs_baseline": 1.0 if ok else 0.0}


def main() -> None:
    if "--single" in sys.argv:
        i = sys.argv.index("--single")
        _run_single(int(sys.argv[i + 1]), int(sys.argv[i + 2]),
                    int(sys.argv[i + 3]))
        return

    if "--config" in sys.argv:
        # subprocess entry for one auxiliary config
        which = sys.argv[sys.argv.index("--config") + 1]
        fn = {"1": run_config1, "3": run_config3, "4": run_config4,
              "5": run_config5, "6": run_config6, "7": run_config7}[which]
        print("AUX " + json.dumps(fn()))
        return

    if "--sharded" in sys.argv:
        print(json.dumps(run_sharded()))
        return

    if "--sharded-tpu" in sys.argv:
        print(json.dumps(run_sharded_tpu()))
        return

    import subprocess

    def chip_reachable(attempts: int = 4, probe_timeout: int = 240) -> bool:
        """Fast health gate: a trivial fenced op in a fresh subprocess.

        The axon tunnel can wedge for tens of minutes (a killed client
        leaves the remote worker grinding; observed this round: even
        backend init hangs). Without this gate a dead chip burns
        len(RESOLUTIONS) x 2 x 1800 s of subprocess timeouts before the
        failure line prints. A trivial op completes in seconds when the
        tunnel is healthy (its compile is sub-second, well under
        ``probe_timeout`` even remote). The probe also reports the
        backend platform: if the TPU plugin fails to register and JAX
        silently falls back to CPU, the op would still succeed — that is
        a FAILED probe (the walk would bench the wrong backend).
        RTF_BENCH_ALLOW_CPU=1 overrides for local dev runs."""
        code = ("import jax, jax.numpy as jnp;"
                "v = float(jnp.sum(jnp.arange(8.0)));"
                "print('OP_OK', jax.devices()[0].platform, v)")
        allow_cpu = os.environ.get("RTF_BENCH_ALLOW_CPU") == "1"
        for i in range(attempts):
            try:
                proc = subprocess.run([sys.executable, "-c", code],
                                      capture_output=True, text=True,
                                      timeout=probe_timeout)
                line = next((l for l in proc.stdout.splitlines()
                             if l.startswith("OP_OK")), "")
                if line:
                    platform = line.split()[1]
                    if platform != "cpu" or allow_cpu:
                        return True
                    print(f"# probe ran on platform={platform} "
                          "(TPU plugin absent?)", file=sys.stderr)
            except subprocess.TimeoutExpired:
                pass
            print(f"# chip health probe {i} failed", file=sys.stderr)
            if i < attempts - 1:
                time.sleep(60)
        return False

    # Gate BEFORE any long subprocess work: with a dead chip, --all alone
    # would burn 4x1800s aux timeouts + run_sharded before the gate fired.
    chip_ok = chip_reachable()

    if "--all" in sys.argv and chip_ok:
        # one JSON line per BASELINE config (auxiliary lines first; the
        # headline config-2 line is printed last by the default path).
        # All lines also land in BENCH_ALL.json so per-round regression
        # tracking of the non-headline configs is machine-checkable
        # (VERDICT r3 item 5); copy to BENCH_ALL_r{N}.json when committing.
        all_lines = []
        for which in ("1", "3", "4", "5", "6", "7"):
            try:
                proc = subprocess.run(
                    [sys.executable, __file__, "--config", which],
                    capture_output=True, text=True, timeout=1800)
                for line in proc.stdout.splitlines():
                    if line.startswith("AUX "):
                        print(line[4:])
                        all_lines.append(json.loads(line[4:]))
            except subprocess.TimeoutExpired:
                print(f"# config {which} timed out", file=sys.stderr)
        for fn in (run_sharded, run_sharded_tpu):
            row = fn()
            print(json.dumps(row))
            all_lines.append(row)
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_ALL.json"), "w") as f:
            json.dump(all_lines, f, indent=1)

    quick = "--quick" in sys.argv
    resolutions = RESOLUTIONS[-1:] if quick else RESOLUTIONS
    frames = 4  # one scan dispatch; ~1.5 s at 1080p, inside the watchdog

    value = 0.0
    pairs = 0.0
    label = "none"
    if not chip_ok:
        resolutions = []  # emit the honest failure line without the walk
        print("# chip unreachable; skipping the resolution walk",
              file=sys.stderr)
    for width, height in resolutions:
        # Each attempt runs in a fresh process: a crashed TPU worker poisons
        # the client that hit it, and needs a couple of minutes to recover.
        got = None
        for attempt in range(2):
            try:
                proc = subprocess.run(
                    [sys.executable, __file__, "--single", str(width),
                     str(height), str(frames)],
                    capture_output=True, text=True, timeout=1800,
                )
            except subprocess.TimeoutExpired:
                print(f"# {width}x{height} attempt {attempt} timed out",
                      file=sys.stderr)
                continue
            out = proc.stdout.strip().splitlines()
            result = [l for l in out if l.startswith("RESULT ")]
            if proc.returncode == 0 and result:
                fields = result[-1].split()
                got = float(fields[1])
                pairs = float(fields[2]) if len(fields) > 2 else 0.0
                break
            print(
                f"# {width}x{height} attempt {attempt} failed "
                f"(rc={proc.returncode})",
                file=sys.stderr,
            )
            time.sleep(150)  # worker recovery window
        if got is not None:
            value = got
            label = f"{height}p"
            break  # first (largest) working config is the headline

    print(
        json.dumps(
            {
                "metric": f"mrays_per_sec_{label}_8bounce",
                "value": round(value, 3),
                "unit": "Mrays/s",
                "vs_baseline": round(value / TARGET_MRAYS, 4),
                # roofline proxies (see OPS_PER_PAIR/VPU_PEAK_OPS notes):
                # live-ray x table-row pairs per second, and the VPU-peak
                # fraction a full brute sweep at this rate would represent
                # pairs metric v2 (round 4+): numerator uses the UNPADDED
                # primitive count — ~9% lower than v1 (BENCH_r01..r03) on
                # small scenes purely from the metric change (ADVICE r4)
                "pairs_metric_version": 2,
                "gpairs_per_sec": round(pairs / 1e9, 3),
                "vpu_peak_pct_proxy": round(
                    100.0 * pairs * OPS_PER_PAIR / VPU_PEAK_OPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
