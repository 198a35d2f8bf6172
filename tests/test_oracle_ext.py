"""Per-pixel oracle extensions: SLS NEE, alpha cutout, BSSRDF.

Extends the scalar recursive transcription of tests/test_oracle.py to the
three paths the round-2 verdict called out as resting on self-goldens
only. All cites into /root/reference:

- SingleLightSource NEE: ambient + one sun-cone shadow ray, terminate at
  the first hit (RayFunctions.cuh:61-92; sun cone draw order
  RayTracerUtilities.cuh:122-133; shadow-miss radiance
  Environment.cuh:168-170).
- Stochastic alpha cutout: anyhit ignores the intersection when
  ``albedo.w <= rand()`` (RayFunctions.cuh:5-23). OptiX leaves the anyhit
  visit order unspecified; the engine defines nearest-first sequential
  testing (models/pathtracer.py segment re-trace) and the oracle
  transcribes that order.
- BSSRDF disk probe (BSSDF.cuh:45-89 + RayFunctions.cuh:96-133): disk
  sample above the entry point, probe ray collecting same-instance
  surface records, random record pick, BRDF re-emission from the exit
  point. The reference forks the first hit deterministically into a
  subsurface child (weight ssFactor) AND a BRDF child (weight
  1-ssFactor); a wavefront engine cannot fork lanes, so the engine
  samples the split with probability ssFactor and both branches drop
  their selection weights (documented in models/pathtracer.py:321-327).
  The oracle transcribes the engine's split so the per-pixel assert
  validates every piece of disk/probe/pick/weight math scalar-side; the
  fork-vs-sample deviation itself is covered statistically by
  tests/test_subsurface.py.

Test scenes keep the subsurface radius small enough that the probe window
contains at most ONE same-instance record, so the (BVH-traversal-order)
record list of the engine and the (t-order) record list of the oracle
agree without reproducing traversal order scalar-side.
"""

from __future__ import annotations

import numpy as np
import pytest

from raytracerfacility_tpu.enums import EnvironmentalLightingType
from tests.test_oracle import Oracle, lcg, tea_init

F = np.float32


def _tangent_space(axis):
    helper = (np.array([0, 0, 1.0]) if abs(axis[0]) > 0.99
              else np.array([1.0, 0, 0]))
    tang = np.cross(axis, helper)
    tang = tang / max(np.linalg.norm(tang), 1e-10)
    bino = np.cross(axis, tang)
    bino = bino / max(np.linalg.norm(bino), 1e-10)
    return tang, bino


def _cone_sample(rng, axis, alpha):
    """RandomSampleHemisphere(random, axis, alpha): cos then phi draw
    (ref RayTracerUtilities.cuh:122-133). NOTE the axis is used AS GIVEN:
    GetTangentSpace normalizes tangent/binormal but not the axis, so a
    non-unit axis (e.g. the raw sun direction) yields a non-unit sample —
    reference behavior the engine reproduces."""
    rng, u_cos = lcg(rng)
    rng, u_phi = lcg(rng)
    one_m = 1.0 - alpha
    cos_t = 1.0 - u_cos * one_m * one_m
    sin_t = np.sqrt(max(0.0, 1.0 - cos_t * cos_t))
    phi = 2.0 * np.pi * u_phi
    tang, bino = _tangent_space(axis)
    d = (tang * np.cos(phi) * sin_t + bino * np.sin(phi) * sin_t
         + axis * cos_t)
    return rng, d.astype(F)


class OracleX(Oracle):
    """Scalar oracle with SLS / alpha-cutout / BSSRDF paths."""

    def __init__(self, compiled, mats, env_rgb, bounces, *,
                 lighting=EnvironmentalLightingType.SCENE,
                 env_color=None, ambient=0.0, sun_dir=None, light_size=0.0,
                 alpha_test=False, alphas=None, subsurface=None):
        super().__init__(compiled, mats, env_rgb, bounces)
        self.instance = np.asarray(compiled.geometry.instance, np.int32)
        self.lighting = lighting
        self.env_color = env_color
        self.ambient = ambient
        self.sun_dir = sun_dir
        self.light_size = light_size
        self.alpha_test = alpha_test
        self.alphas = alphas  # (M,) = 1 - transmission
        self.subsurface = subsurface  # (M, 5): factor, rgb color, radius

    # -- nearest-first sequential cutout (engine order; ref anyhit
    # RayFunctions.cuh:5-23 with unspecified visit order)
    def closest_alpha(self, o, d, tmin, rng):
        while True:
            res = self.closest(o, d, tmin)
            if res is None:
                return None, rng
            j, t, u, v = res
            if not self.alpha_test:
                return res, rng
            rng, ua = lcg(rng)
            if float(self.alphas[self.mat_of_tri[j]]) > ua:
                return res, rng
            tmin = t + 1e-4  # engine _ALPHA_SKIP_EPS

    def collect_same_instance(self, o, d, tmin, tmax, inst):
        """Same-instance surface records in the (tmin, tmax] window,
        t-ascending (ref SSAnyHit, BSSDF.cuh:18-37; <=4 records)."""
        pv = np.cross(np.broadcast_to(d, self.e2.shape), self.e2)
        det = np.sum(self.e1 * pv, axis=1)
        ok = np.abs(det) > 1e-12
        inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
        tv = o - self.v0
        u = np.sum(tv * pv, axis=1) * inv
        qv = np.cross(tv, self.e1)
        v = np.sum(np.broadcast_to(d, qv.shape) * qv, axis=1) * inv
        t = np.sum(self.e2 * qv, axis=1) * inv
        ok &= (u >= 0) & (v >= 0) & (u + v <= 1)
        ok &= (t > tmin) & (t <= tmax) & (self.instance == inst)
        idx = np.where(ok)[0]
        idx = idx[np.argsort(t[idx])][:4]
        return [(int(j), float(t[j]), float(u[j]), float(v[j])) for j in idx]

    def shade(self, o, d, tmin, rng, hit_count, aov):
        res, rng = self.closest_alpha(o, d, tmin, rng)
        if res is None:
            if hit_count == 0:
                aov["albedo"] = self.env.copy()
            return self.env.copy(), rng
        j, t, u, v = res
        prev_hits = hit_count
        hit_count += 1
        w = 1.0 - u - v
        normal = (w * self.n[j, 0] + u * self.n[j, 1] + v * self.n[j, 2])
        normal = normal / max(np.linalg.norm(normal), 1e-10)
        if float(np.dot(d, normal)) > 0.0:
            normal = -normal
        position = self.v0[j] + u * self.e1[j] + v * self.e2[j]
        mslot = self.mat_of_tri[j]
        m = self.mats[mslot]
        albedo = m[:3].astype(F)
        rough, metal, emission = float(m[3]), float(m[4]), float(m[5])
        f = (metal + 2.0) / (metal + 1.0) if metal >= 0.0 else 1.0

        if hit_count == 1:
            aov["normal"] = normal.copy()
            aov["albedo"] = albedo.copy()
            aov["position"] = position.copy()

        if self.lighting == EnvironmentalLightingType.SINGLE_LIGHT_SOURCE:
            # ref RayFunctions.cuh:61-92 + emission :168-171
            rng, sdir = _cone_sample(rng, self.sun_dir, 1.0 - self.light_size)
            energy = self.ambient * self.env_color * albedo
            ndl = float(np.dot(normal, sdir))
            if ndl > 0.0 and self.closest(position, sdir, 1e-3) is None:
                energy = energy + self.env * ndl * albedo
            return energy + emission * albedo, rng

        if hit_count > self.bounces:
            return emission * albedo, rng

        # ---- BRDF cone draw first: the engine samples the BRDF child for
        # every lane BEFORE the subsurface stream forks, so the ss draws
        # continue from the post-BRDF state
        refl = d - 2.0 * np.dot(d, normal) * normal
        rng_b, new_dir = _cone_sample(rng, refl / max(np.linalg.norm(refl),
                                                      1e-10), metal)

        # ---- BSSRDF stochastic split (engine transcription; geometry per
        # ref BSSDF.cuh:45-89)
        ss = self.subsurface[mslot] if self.subsurface is not None else None
        eligible = (ss is not None and prev_hits == 0 and ss[0] > 0.0
                    and ss[4] > 0.0)
        if eligible:
            rng_ss, u_sel = lcg(rng_b)
            if u_sel < float(ss[0]):
                radius = float(ss[4])
                rng_ss, u_r = lcg(rng_ss)
                rng_ss, u_a = lcg(rng_ss)
                disk_radius = radius * np.sqrt(u_r)
                dist = np.sqrt(max(radius * radius
                                   - disk_radius * disk_radius, 0.0))
                # glm::rotate(vec3(n.y, n.z, n.x), 2*pi*u, n) rim point
                swz = np.array([normal[1], normal[2], normal[0]], F)
                ang = 2.0 * np.pi * u_a
                c, s_ = np.cos(ang), np.sin(ang)
                rim = (swz * c + np.cross(normal, swz) * s_
                       + normal * np.dot(normal, swz) * (1.0 - c))
                disk_center = position + radius * normal / 2.0
                sample_pos = (disk_center + disk_radius * rim).astype(F)
                recs = self.collect_same_instance(
                    sample_pos, -normal, dist, radius + dist,
                    int(self.instance[j]))
                rng_ss, u_pick = lcg(rng_ss)
                if recs:
                    pick = min(max(int(u_pick * len(recs)), 0),
                               len(recs) - 1)
                    pj, pt, pu, pv = recs[pick]
                    pw = 1.0 - pu - pv
                    out_n = (pw * self.n[pj, 0] + pu * self.n[pj, 1]
                             + pv * self.n[pj, 2])
                    out_n = out_n / max(np.linalg.norm(out_n), 1e-10)
                    out_pos = (self.v0[pj] + pu * self.e1[pj]
                               + pv * self.e2[pj])
                    if np.linalg.norm(out_pos - position) <= radius:
                        # exit: BRDF(-outN, outN) = cone around outN
                        rng_ss, ss_dir = _cone_sample(rng_ss, out_n, metal)
                        wgt = min(max(abs(float(np.dot(out_n, ss_dir)))
                                      * rough + (1.0 - rough) * f, 0.0), 1.0)
                        origin = (out_pos + out_n * 0.01).astype(F)
                        incoming, rng_ss = self.shade(
                            origin, ss_dir, 1e-3, rng_ss, hit_count, aov)
                        ss_color = ss[1:4].astype(F)
                        return (emission * albedo
                                + ss_color * wgt * incoming), rng_ss
                # chosen but failed: terminate with emission only
                return emission * albedo, rng_ss
            drop_factor = True  # eligible not-chosen: selection weight drops
        else:
            drop_factor = False

        # ---- BRDF child (base recurrence; ss_factor_term per engine:
        # 1 - ssFactor like the reference's deterministic fork weight,
        # except eligible-not-chosen lanes drop it — stochastic split)
        ndotl = abs(float(np.dot(normal, new_dir)))
        weight = min(max(ndotl * rough + (1.0 - rough) * f, 0.0), 1.0)
        term = 1.0 if (drop_factor or ss is None) else (1.0 - float(ss[0]))
        incoming, rng_b = self.shade(position, new_dir, 1e-3, rng_b,
                                     hit_count, aov)
        return emission * albedo + term * weight * albedo * incoming, rng_b


def _render_and_compare(scene, cam, envp, config, oracle_kwargs, size,
                        frame_id=3, q98=1e-3, mean=5e-4):
    import jax.numpy as jnp

    from raytracerfacility_tpu.models.pathtracer import render_samples

    compiled = scene.build(build_bvh=config.enable_subsurface)
    cam_state = cam.state()
    env = envp.state()
    color, normal, albedo, position, _ = render_samples(
        compiled, cam_state, env, config, jnp.int32(frame_id))
    color = np.asarray(color)

    mats = np.concatenate([
        np.asarray(compiled.materials.albedo),
        np.asarray(compiled.materials.roughness)[:, None],
        np.asarray(compiled.materials.metallic)[:, None],
        np.asarray(compiled.materials.emission)[:, None],
    ], axis=1)
    env_rgb = np.asarray(
        np.maximum(np.power(np.maximum(
            np.asarray(env.color) * float(env.skylight_intensity), 0.0),
            1.0 / float(env.gamma)), 0.0), F)
    oracle = OracleX(compiled, mats, env_rgb, config.bounces,
                     **oracle_kwargs)
    diffs = []
    for iy in range(size):
        for ix in range(size):
            o_color, _ = oracle.render_pixel(
                cam_state, ix, iy, size, size, frame_id, 1)
            diffs.append(np.abs(color[iy, ix] - o_color))
    diffs = np.asarray(diffs)
    assert np.quantile(diffs, 0.98) < q98, float(np.quantile(diffs, 0.98))
    assert diffs.mean() < mean, float(diffs.mean())
    assert float(color.std()) > 1e-3  # non-vacuous
    return color


def _base_scene():
    from raytracerfacility_tpu.scene import (
        MaterialProperties, RayTracerScene, make_cube, make_sphere)

    scene = RayTracerScene()
    scene.upsert_geometry(1, version=0, mesh=make_sphere(0.5, rings=6,
                                                         sectors=8))
    scene.upsert_material(2, version=0, properties=MaterialProperties(
        albedo_color=(0.8, 0.6, 0.2), roughness=0.4, metallic=0.6))
    scene.upsert_instance(3, version=0, geometry=1, material=2)
    t = np.eye(4, dtype=np.float32)
    t[:3, 3] = (0.0, -0.8, 0.0)
    t[0, 0] = t[2, 2] = 4.0  # ground slab
    scene.upsert_geometry(4, version=0, mesh=make_cube(0.5))
    scene.upsert_material(5, version=0, properties=MaterialProperties(
        albedo_color=(0.3, 0.7, 0.4), roughness=1.0, metallic=0.0))
    scene.upsert_instance(6, version=0, geometry=4, material=5, transform=t)
    return scene


def test_sls_nee_matches_oracle(monkeypatch):
    monkeypatch.setenv("RTF_TPU_FUSED", "0")
    from raytracerfacility_tpu.models.pathtracer import RenderConfig
    from raytracerfacility_tpu.models.renderer import EnvironmentProperties
    from raytracerfacility_tpu.ops.camera import CameraProperties

    size = 16
    scene = _base_scene()
    cam = CameraProperties(fov=80.0, size=(size, size))
    cam.look_at_target((0.4, 0.8, 2.0), (0.0, 0.0, 0.0))
    envp = EnvironmentProperties(
        lighting_type=EnvironmentalLightingType.SINGLE_LIGHT_SOURCE,
        sun_direction=(0.3, 0.9, 0.2),
        light_size=0.1,
        ambient_light_intensity=0.2,
        skylight_intensity=0.9,
    )
    envp.color = (0.9, 0.8, 1.0)
    config = RenderConfig(
        width=size, height=size, bounces=2, samples=1,
        lighting_type=EnvironmentalLightingType.SINGLE_LIGHT_SOURCE,
        enable_textures=False, enable_vertex_color=False)
    # the raw (non-unit) sun direction, exactly as the state carries it
    sd = np.asarray(envp.sun_direction, F)
    color = _render_and_compare(
        scene, cam, envp, config,
        dict(lighting=EnvironmentalLightingType.SINGLE_LIGHT_SOURCE,
             env_color=np.asarray(envp.color, F),
             ambient=float(envp.ambient_light_intensity),
             sun_dir=sd,
             light_size=float(envp.light_size)),
        size)
    # shadows exist under the sphere
    assert color.std() > 0.02


def test_alpha_cutout_matches_oracle(monkeypatch):
    monkeypatch.setenv("RTF_TPU_FUSED", "0")
    from raytracerfacility_tpu.models.pathtracer import RenderConfig
    from raytracerfacility_tpu.models.renderer import EnvironmentProperties
    from raytracerfacility_tpu.ops.camera import CameraProperties
    from raytracerfacility_tpu.scene import (
        MaterialProperties, RayTracerScene, make_cube)

    size = 16
    scene = RayTracerScene()
    # three stacked translucent slabs in front of an opaque back wall
    for i, (trans, color) in enumerate(
            [(0.6, (0.9, 0.2, 0.2)), (0.5, (0.2, 0.9, 0.2)),
             (0.4, (0.2, 0.2, 0.9))]):
        t = np.eye(4, dtype=np.float32)
        t[:3, 3] = (0.0, 0.0, 0.6 - 0.4 * i)
        t[0, 0] = t[1, 1] = 3.0
        t[2, 2] = 0.02
        scene.upsert_geometry(10 + i, version=0, mesh=make_cube(0.5))
        scene.upsert_material(20 + i, version=0,
                              properties=MaterialProperties(
                                  albedo_color=color, roughness=1.0,
                                  metallic=0.0, transmission=trans))
        scene.upsert_instance(30 + i, version=0, geometry=10 + i,
                              material=20 + i, transform=t)
    tb = np.eye(4, dtype=np.float32)
    tb[:3, 3] = (0.0, 0.0, -1.2)
    tb[0, 0] = tb[1, 1] = 3.0
    scene.upsert_geometry(40, version=0, mesh=make_cube(0.5))
    scene.upsert_material(41, version=0, properties=MaterialProperties(
        albedo_color=(0.8, 0.8, 0.3), roughness=1.0, metallic=0.0))
    scene.upsert_instance(42, version=0, geometry=40, material=41,
                          transform=tb)

    cam = CameraProperties(fov=70.0, size=(size, size))
    cam.look_at_target((0.2, 0.3, 2.5), (0.0, 0.0, 0.0))
    envp = EnvironmentProperties(skylight_intensity=0.8)
    config = RenderConfig(width=size, height=size, bounces=2, samples=1,
                          alpha_test=True, alpha_segments=16,
                          enable_textures=False, enable_vertex_color=False)
    compiled = scene.build()
    alphas = 1.0 - np.asarray(compiled.materials.transmission)
    _render_and_compare(scene, cam, envp, config,
                        dict(alpha_test=True, alphas=alphas), size)


def test_bssrdf_matches_oracle(monkeypatch):
    monkeypatch.setenv("RTF_TPU_FUSED", "0")
    from raytracerfacility_tpu.models.pathtracer import RenderConfig
    from raytracerfacility_tpu.models.renderer import EnvironmentProperties
    from raytracerfacility_tpu.ops.camera import CameraProperties
    from raytracerfacility_tpu.scene import (
        MaterialProperties, RayTracerScene, make_sphere)

    size = 12
    scene = RayTracerScene()
    # subsurface radius 0.12 << sphere radius 0.5: the probe window holds
    # at most one same-instance record, so record order cannot matter
    scene.upsert_geometry(1, version=0, mesh=make_sphere(0.5, rings=8,
                                                         sectors=10))
    scene.upsert_material(2, version=0, properties=MaterialProperties(
        albedo_color=(0.9, 0.5, 0.4), roughness=0.8, metallic=0.1,
        subsurface_factor=0.6, subsurface_color=(1.0, 0.6, 0.5),
        subsurface_radius=(0.12, 0.12, 0.12)))
    scene.upsert_instance(3, version=0, geometry=1, material=2)

    cam = CameraProperties(fov=70.0, size=(size, size))
    cam.look_at_target((0.3, 0.3, 1.8), (0.0, 0.0, 0.0))
    envp = EnvironmentProperties(skylight_intensity=1.0)
    envp.color = (0.8, 0.9, 1.0)
    config = RenderConfig(width=size, height=size, bounces=2, samples=1,
                          enable_subsurface=True,
                          enable_textures=False, enable_vertex_color=False)
    compiled = scene.build(build_bvh=True)
    ss = np.concatenate([
        np.asarray(compiled.materials.subsurface_factor)[:, None],
        np.asarray(compiled.materials.subsurface_color),
        np.asarray(compiled.materials.subsurface_radius)[:, 0:1],
    ], axis=1)
    _render_and_compare(scene, cam, envp, config, dict(subsurface=ss),
                        size)
