"""Analytic sphere-swept curve intersection + end-to-end strand render."""

import jax.numpy as jnp
import numpy as np

from raytracerfacility_tpu.enums import GeometryType, RendererType
from raytracerfacility_tpu.models.renderer import (
    EnvironmentProperties,
    RayProperties,
    RayTracerCamera,
)
from raytracerfacility_tpu.ops.curve import (
    intersect_round_cone,
    linear_curve_normal,
    subdivide_strand_segments,
)
from raytracerfacility_tpu.scene import MaterialProperties, RayTracerScene


_H = np.linspace(0.0, 1.0, 1024)


def sdf_round_cone(x, p0, p1, r0, r1):
    """Signed distance bound to the sphere-swept segment: the exact
    union-of-spheres distance min_h(|x - c(h)| - r(h)), sampled densely in h
    (an independent oracle; zero level = the swept surface)."""
    c = p0[None, :] + _H[:, None] * (p1 - p0)[None, :]
    r = r0 + _H * (r1 - r0)
    return float(np.min(np.linalg.norm(x[None, :] - c, axis=-1) - r))


def test_round_cone_vs_sdf_marching():
    """Validate analytic hits against conservative sphere tracing of the
    exact SDF (an independent oracle)."""
    rng = np.random.default_rng(0)
    p0 = np.array([0.0, 0.0, 0.0], np.float32)
    p1 = np.array([0.8, 0.4, 0.1], np.float32)
    r0, r1 = 0.3, 0.12

    n = 200
    origins = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    # aim near the segment so a good fraction hit
    targets = rng.uniform(-0.3, 1.0, (n, 3)).astype(np.float32) * [1, 0.6, 0.4]
    dirs = targets - origins
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

    hit, t, u = intersect_round_cone(
        jnp.asarray(origins), jnp.asarray(dirs),
        jnp.asarray(p0), jnp.asarray(p1 - p0),
        jnp.float32(r0), jnp.float32(r1 - r0),
        jnp.float32(0.0), jnp.float32(100.0),
    )
    hit = np.asarray(hit)
    t = np.asarray(t)

    for i in range(n):
        # sphere trace the SDF
        s = 0.0
        ok = False
        for _ in range(400):
            d = sdf_round_cone(origins[i] + s * dirs[i], p0, p1, r0, r1)
            if d < 1e-5:
                ok = True
                break
            s += max(d, 1e-6)
            if s > 50:
                break
        assert bool(hit[i]) == ok, f"ray {i}: analytic {hit[i]} vs sdf {ok}"
        if ok:
            np.testing.assert_allclose(t[i], s, atol=5e-3,
                                       err_msg=f"ray {i} distance")
            # hit point lies on the surface
            x = origins[i] + t[i] * dirs[i]
            assert abs(sdf_round_cone(x, p0, p1, r0, r1)) < 2e-3


def test_curve_normal_unit_and_outward():
    p0 = np.zeros(3, np.float32)
    axis = np.array([1.0, 0.0, 0.0], np.float32)
    r0, dr = 0.2, -0.1
    rng = np.random.default_rng(1)
    o = rng.uniform(-1, 2, (64, 3)).astype(np.float32)
    o[:, 1:] *= 2.0
    d = -o / np.linalg.norm(o, axis=-1, keepdims=True)  # aim at origin-ish
    hit, t, u = intersect_round_cone(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(p0), jnp.asarray(axis),
        jnp.float32(r0), jnp.float32(dr), jnp.float32(0.0), jnp.float32(100.0),
    )
    x = jnp.asarray(o) + np.asarray(t)[:, None] * jnp.asarray(d)
    normal, pos = linear_curve_normal(
        x, jnp.asarray(p0), jnp.asarray(axis), jnp.float32(r0),
        jnp.float32(dr), u,
    )
    normal = np.asarray(normal)[np.asarray(hit)]
    d_np = np.asarray(d)[np.asarray(hit)]
    lengths = np.linalg.norm(normal, axis=-1)
    np.testing.assert_allclose(lengths, 1.0, atol=1e-4)
    # normals face the incoming rays
    assert (np.sum(normal * d_np, axis=-1) < 0.05).mean() > 0.95


def test_subdivision_counts():
    pts = np.array(
        [[0, 0, 0, 0.1], [1, 0, 0, 0.2], [2, 1, 0, 0.15], [3, 1, 1, 0.05]],
        np.float32,
    )
    sub = subdivide_strand_segments(pts, np.array([0], np.int32), "cubic")
    assert sub["p0"].shape[0] == 6  # default 6 subdivisions per segment
    sub_lin = subdivide_strand_segments(pts[:2], np.array([0], np.int32), "linear")
    assert sub_lin["p0"].shape[0] == 1


def test_strand_render_end_to_end():
    """StrandsRenderer path: analytic curves through the full engine,
    matching between BVH and brute-force traversal."""
    rng = np.random.default_rng(2)
    points = []
    segments = []
    idx = 0
    for k in range(12):
        x = -0.6 + 0.1 * k
        points.append([x, -0.5, 0.0, 0.03, 0.2, 0.8, 0.3, 1.0])
        points.append([x + rng.uniform(-0.1, 0.1), 0.5, rng.uniform(-0.2, 0.2),
                       0.01, 0.2, 0.8, 0.3, 1.0])
        segments.append(idx)
        idx += 2
    points = np.asarray(points, np.float32)
    segments = np.asarray(segments, np.int32)

    imgs = {}
    for use_bvh in (True, False):
        scene = RayTracerScene()
        scene.upsert_geometry(
            1, version=0, renderer_type=RendererType.CURVE,
            geometry_type=GeometryType.LINEAR,
            strand_points=points, curve_segments=segments,
        )
        scene.upsert_material(
            2, version=0,
            properties=MaterialProperties(albedo_color=(0.3, 0.7, 0.3),
                                          roughness=0.9, metallic=0.0),
        )
        scene.upsert_instance(3, version=0, geometry=1, material=2)
        cam = RayTracerCamera(scene)
        cam.camera.resize((48, 48))
        cam.camera.fov = 60.0
        cam.camera.look_at_target((0.0, 0.0, 2.0), (0.0, 0.0, 0.0))
        imgs[use_bvh] = cam.render(
            EnvironmentProperties(), RayProperties(bounces=2, samples=1),
            build_bvh=use_bvh,
        )
        assert np.isfinite(imgs[use_bvh]).all()
    # strands visibly darken some pixels vs the white env
    assert (imgs[True][..., :3] < 0.9).any()
    np.testing.assert_allclose(imgs[True], imgs[False], atol=2e-5)
