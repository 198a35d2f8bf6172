"""Showcase application: the L6 demo-app equivalent.

The reference ships a minimal executable that pushes the ray-tracer layer
into the engine and starts the loop (ref src/app/Application.cpp:16-27);
everything else happens interactively in the editor. This script is the
headless analogue: it assembles a scene through the component descriptors,
drives the per-frame sync + render loop, and exercises each of the four
capabilities (path tracing, illumination estimation, LiDAR scanning, BTF
materials), writing its outputs under ``examples/out/``.

Run on any backend::

    python examples/demo.py            # CPU works; TPU if available
    python examples/demo.py --size 128 --frames 8
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_components():
    """A small showcase scene: Cornell walls, a glossy sphere, a ring of
    instanced cubes (Particles), and a tuft of strands."""
    from raytracerfacility_tpu.layer import (
        MaterialDesc,
        MeshRendererDesc,
        ParticlesDesc,
        StrandsDesc,
    )
    from raytracerfacility_tpu.scene import (
        MaterialProperties,
        make_cornell_box,
        make_cube,
        make_sphere,
    )

    components = []
    handle = 1
    for mesh, transform, color in make_cornell_box(2.0):
        components.append(
            MeshRendererDesc(
                handle=handle + 200,
                mesh_handle=handle,
                mesh=mesh,
                material=MaterialDesc(
                    handle=handle + 100,
                    properties=MaterialProperties(
                        albedo_color=color, roughness=1.0, metallic=0.0
                    ),
                ),
                global_transform=transform,
            )
        )
        handle += 1

    t = np.eye(4, dtype=np.float32)
    t[:3, 3] = (-0.45, 0.45, 0.1)
    components.append(
        MeshRendererDesc(
            handle=500,
            mesh_handle=501,
            mesh=make_sphere(0.45, rings=24, sectors=48),
            material=MaterialDesc(
                handle=502,
                properties=MaterialProperties(
                    albedo_color=(0.9, 0.75, 0.3), roughness=0.15,
                    metallic=0.85,
                ),
            ),
            global_transform=t,
        )
    )

    n = 10
    mats = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    colors = np.ones((n, 4), np.float32)
    for i in range(n):
        a = 2.0 * np.pi * i / n
        mats[i, :3, 3] = (0.8 * np.cos(a), 0.12, 0.8 * np.sin(a))
        mats[i, :3, :3] *= 0.12
        colors[i, :3] = (0.5 + 0.5 * np.cos(a), 0.6, 0.5 + 0.5 * np.sin(a))
    components.append(
        ParticlesDesc(
            handle=600,
            mesh_handle=601,
            mesh=make_cube(1.0),
            instance_matrices=mats,
            instance_colors=colors,
            material=MaterialDesc(
                handle=602,
                properties=MaterialProperties(roughness=0.6, metallic=0.2),
            ),
        )
    )

    strands, segments = [], []
    rng = np.random.default_rng(7)
    for k in range(12):
        x = 0.55 + 0.05 * rng.standard_normal()
        z = -0.3 + 0.05 * rng.standard_normal()
        strands.append((x, 0.0, z, 0.02))
        strands.append((x + 0.03, 0.45, z + 0.03, 0.012))
        strands.append((x - 0.02, 0.9, z + 0.06, 0.004))
        # two linear segments per strand: starts (3k, 3k+1)
        segments.extend((3 * k, 3 * k + 1))
    strand_points = np.asarray(strands, np.float32)
    segments = np.asarray(segments, np.int32)
    components.append(
        StrandsDesc(
            handle=700,
            strands_handle=701,
            strand_points=strand_points,
            segments=segments,
            material=MaterialDesc(
                handle=702,
                properties=MaterialProperties(
                    albedo_color=(0.2, 0.7, 0.25), roughness=0.9
                ),
            ),
        )
    )
    return components


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--size", type=int, default=96)
    parser.add_argument("--frames", type=int, default=4)
    parser.add_argument("--bounces", type=int, default=3)
    parser.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "out"))
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend")
    parser.add_argument("--viewer", type=int, default=0, metavar="PORT",
                        help="after the headless passes, serve the scene "
                        "as an interactive progressive preview on PORT "
                        "(drag orbits, wheel dollies; Ctrl-C stops)")
    args = parser.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    os.makedirs(args.out, exist_ok=True)

    from raytracerfacility_tpu.enums import OutputType
    from raytracerfacility_tpu.layer import RayTracerLayer
    from raytracerfacility_tpu.models.illumination import (
        TriangleIlluminationEstimator,
    )
    from raytracerfacility_tpu.models.lidar import PointCloudScanner
    from raytracerfacility_tpu.models.pathtracer import RenderConfig
    from raytracerfacility_tpu.models.renderer import RayProperties
    from raytracerfacility_tpu.utils import serialization
    from raytracerfacility_tpu.utils.image import write_png

    layer = RayTracerLayer()
    layer.set_viewport(args.size, args.size)
    layer.scene_camera.camera.fov = 60.0
    layer.scene_camera.camera.look_at_target(
        (0.0, 1.0, 2.6), (0.0, 0.8, 0.0)
    )
    layer.environment.skylight_intensity = 1.0
    layer.ray_properties = RayProperties(
        bounces=args.bounces, samples=1
    )

    components = build_components()
    layer.sync(components)

    # 1) progressive path trace -------------------------------------------
    print(f"rendering {args.frames} progressive frames at "
          f"{args.size}x{args.size} ...")
    for _ in range(args.frames):
        images = layer.late_update()
    layer.scene_camera.save_screenshot(os.path.join(args.out, "color.png"))
    for otype, name in ((OutputType.NORMAL, "normal"),
                        (OutputType.ALBEDO, "albedo"),
                        (OutputType.DEPTH, "depth")):
        layer.scene_camera.output_type = otype
        layer.late_update()
        bufs = layer.scene_camera.buffers()
        img = np.clip(np.abs(bufs["normal" if name == "normal" else "color"]
                             [..., :3]), 0.0, 1.0)
        write_png(os.path.join(args.out, f"{name}.png"), img)
    layer.scene_camera.output_type = OutputType.COLOR
    print(f"  frame_id={layer.scene_camera.buffers()['frame_id']}, "
          f"mean={float(images[0][..., :3].mean()):.4f}")

    # 2) illumination estimation ------------------------------------------
    estimator = TriangleIlluminationEstimator()
    sphere = next(c for c in components if c.handle == 500)
    estimator.prepare_light_probe_group(
        [(sphere.mesh, sphere.global_transform)]
    )
    compiled = layer.scene.build()
    cfg = RenderConfig(width=1, height=1, bounces=2, samples=8)
    estimator.sample_light_probe_group(
        compiled, layer.environment.state(), cfg
    )
    estimator.color_descendents_vertices()
    print(f"illumination: {estimator.probes.num_probes} probes, "
          f"total flux={estimator.total_flux.round(3).tolist()}, "
          f"area={estimator.total_area:.3f}")
    serialization.save_estimator(
        estimator, os.path.join(args.out, "estimator.yml"))

    # 3) LiDAR scan ---------------------------------------------------------
    scanner = PointCloudScanner(size=(2.0, 2.0), distance=(0.05, 0.05))
    hits = scanner.scan(compiled, position=(0.0, 1.0, 2.5))
    print(f"lidar: {hits} hits out of "
          f"{int(scanner.size[0] / scanner.distance[0]) * int(scanner.size[1] / scanner.distance[1])} rays")
    serialization.save_scanner(scanner, os.path.join(args.out, "scanner.yml"))

    # 4) sorghum canopy under the sun (the reference project's flagship
    # agronomy flow: procedural plants + SingleLightSource render +
    # per-triangle light interception) ------------------------------------
    from raytracerfacility_tpu.enums import EnvironmentalLightingType
    from raytracerfacility_tpu.models.renderer import (
        EnvironmentProperties, RayProperties, RayTracerCamera)
    from raytracerfacility_tpu.scene.procedural import build_canopy_scene

    canopy = build_canopy_scene(rows=4, cols=4, leaf_segments=6)
    ccam = RayTracerCamera(canopy)
    ccam.camera.resize((args.size, args.size))
    ccam.camera.fov = 55.0
    ccam.camera.look_at_target((1.2, 1.4, 1.2), (0.0, 0.5, 0.0))
    sun_env = EnvironmentProperties(
        lighting_type=EnvironmentalLightingType.SINGLE_LIGHT_SOURCE,
        sun_direction=(0.3, 0.9, 0.2), light_size=0.05,
        ambient_light_intensity=0.2)
    img = None
    for _ in range(max(2, args.frames // 2)):
        img = ccam.render(sun_env, RayProperties(bounces=1, samples=1))
    write_png(os.path.join(args.out, "canopy_sun.png"), img)
    print(f"canopy: {canopy.build().geometry.num_triangles} triangles, "
          f"sun-lit render saved")

    # 5) camera persistence -------------------------------------------------
    serialization.save_camera(
        layer.scene_camera.camera, os.path.join(args.out, "camera.yml"))
    print(f"outputs in {args.out}")

    # 6) optional interactive preview (the live-editor-viewport analog,
    # ref RayTracerLayer.cpp:454-712) -----------------------------------
    if args.viewer:
        from raytracerfacility_tpu.viewer import ProgressiveViewer

        viewer = ProgressiveViewer(
            layer.scene, env=layer.environment,
            ray=layer.ray_properties, camera=layer.scene_camera,
            eye=(0.0, 1.0, 2.6), target=(0.0, 0.8, 0.0))
        port = viewer.start(port=args.viewer)
        print(f"interactive preview at http://localhost:{port} "
              "(Ctrl-C stops)")
        try:
            import time

            while True:
                time.sleep(1.0)
        except KeyboardInterrupt:
            viewer.stop()


if __name__ == "__main__":
    main()
