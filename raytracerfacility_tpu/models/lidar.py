"""Virtual laser scanner / LiDAR (the __raygen__PCS launch type).

Ports the reference's point-cloud workload:

* grid generation (column x row of parallel rays on a rotated plane,
  ref PointCloudScanner.cpp:70-95 — the CPU ``Jobs::ParallelFor`` becomes a
  jnp meshgrid)
* the single closest-hit query with anyhit disabled
  (ref ptx/PointCloudScanning.cu:44-75)
* hit filtering into points / colors / handles relative to the scanner
  (ref PointCloudScanner.cpp:97-103)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from raytracerfacility_tpu.models.pathtracer import trace_closest
from raytracerfacility_tpu.ops.math3d import rotate_about_axis
from raytracerfacility_tpu.ops.shading import interpolate_hit
from raytracerfacility_tpu.scene.compiled import CompiledScene


@struct.dataclass
class PointCloudSamples:
    """SoA ``PointCloudSample`` (ref RayTracer.hpp:222-232)."""

    start: jax.Array  # (R, 3) input ray origins
    direction: jax.Array  # (R, 3) input ray directions
    hit: jax.Array  # (R,) bool
    handle_words: jax.Array  # (R, 2) uint32 instance entity handle
    position: jax.Array  # (R, 3) HitInfo fields
    normal: jax.Array  # (R, 3)
    tangent: jax.Array  # (R, 3)
    color: jax.Array  # (R, 4)
    tex_coord: jax.Array  # (R, 2)
    data: jax.Array  # (R, 4)


def scan_point_cloud(
    scene: CompiledScene, start: jax.Array, direction: jax.Array
) -> PointCloudSamples:
    """One closest-hit query per sample; anyhit (alpha cutout) disabled,
    like the reference's OPTIX_RAY_FLAG_DISABLE_ANYHIT
    (ref ptx/PointCloudScanning.cu:58-71, tmin = 1e-3)."""
    res = trace_closest(
        scene, start, direction, jnp.float32(1e-3), jnp.float32(1e20),
        coherent=True,
    )
    hit = interpolate_hit(
        scene, res.prim, res.u, res.v, direction, origin=start, t_hit=res.t
    )
    handle = scene.instance_handle[hit.instance]
    zero3 = jnp.zeros_like(start)
    m = res.hit[..., None]
    return PointCloudSamples(
        start=start,
        direction=direction,
        hit=res.hit,
        handle_words=jnp.where(m, handle, 0),
        position=jnp.where(m, hit.position, zero3),
        normal=jnp.where(m, hit.normal, zero3),
        tangent=jnp.where(m, hit.tangent, zero3),
        color=jnp.where(m, hit.color, jnp.ones_like(hit.color)),
        tex_coord=jnp.where(m, hit.tex_coord, 0.0),
        data=jnp.where(m, hit.data, 0.0),
    )


# knob fingerprint in the cache key: trace_closest's sorted-trace
# dispatch reads RTF_TPU_* env vars at trace time (see
# pathtracer._knob_key)
_scan_point_cloud_knobbed = jax.jit(
    lambda knobs, scene, start, direction: scan_point_cloud(
        scene, start, direction),
    static_argnums=(0,))


def scan_point_cloud_jit(scene, start, direction):
    from raytracerfacility_tpu.models.pathtracer import _knob_key

    return _scan_point_cloud_knobbed(_knob_key(), scene, start, direction)


@dataclasses.dataclass
class PointCloudScanner:
    """Host front-end mirroring the reference component
    (ref PointCloudScanner.hpp:10-28 / PointCloudScanner.cpp).

    Pose is (position, rotation quaternion (w, x, y, z)); the scan plane
    spans the scanner's left/up axes, rays go along front rotated by
    ``rotate_angle`` degrees about up.
    """

    size: tuple[float, float] = (1.0, 1.0)
    distance: tuple[float, float] = (0.01, 0.01)
    rotate_angle: float = 0.0

    points: np.ndarray | None = None  # (K, 3) scanner-relative hit positions
    point_colors: np.ndarray | None = None  # (K, 4)
    handles: np.ndarray | None = None  # (K,) uint64

    def scan(
        self,
        scene: CompiledScene,
        position=(0.0, 0.0, 0.0),
        rotation=(1.0, 0.0, 0.0, 0.0),
    ) -> int:
        """Ref PointCloudScanner.cpp:70-104. Returns the number of hits."""
        from raytracerfacility_tpu.ops.camera import quat_rotate

        position = np.asarray(position, np.float32)
        rotation = np.asarray(rotation, np.float32)
        front = quat_rotate(rotation, np.array([0, 0, -1], np.float32))
        up = quat_rotate(rotation, np.array([0, 1, 0], np.float32))
        left = quat_rotate(rotation, np.array([1, 0, 0], np.float32))

        column = int(self.size[0] / self.distance[0])
        row = int(self.size[1] / self.distance[1])
        if column <= 0 or row <= 0:
            self.points = np.zeros((0, 3), np.float32)
            self.point_colors = np.zeros((0, 4), np.float32)
            self.handles = np.zeros(0, np.uint64)
            return 0
        column_start = -(column // 2)
        row_start = -(row // 2)

        actual = rotate_about_axis(
            jnp.asarray(front),
            jnp.asarray(up / np.linalg.norm(up)),
            jnp.float32(np.radians(self.rotate_angle)),
        )
        actual = actual / jnp.linalg.norm(actual)

        ci = jnp.arange(column, dtype=jnp.float32)[:, None] + column_start
        ri = jnp.arange(row, dtype=jnp.float32)[None, :] + row_start
        start = (
            jnp.asarray(position)
            + jnp.asarray(left) * (ci * self.distance[0])[..., None]
            + jnp.asarray(up) * (ri * self.distance[1])[..., None]
        )
        direction = jnp.broadcast_to(actual, start.shape)

        samples = scan_point_cloud_jit(
            scene, start.reshape(-1, 3), direction.reshape(-1, 3)
        )
        from raytracerfacility_tpu.utils.validation import check_finite

        check_finite("ScanPointCloud", position=samples.position,
                     color=samples.color)
        hit = np.asarray(samples.hit)
        self.points = np.asarray(samples.position)[hit] - position
        self.point_colors = np.asarray(samples.color)[hit]
        words = np.asarray(samples.handle_words)[hit].astype(np.uint64)
        # vectorized combine_handle_words (a per-hit Python loop here was
        # O(hits) interpreter work on 250k-beam sweeps)
        self.handles = words[:, 0] | (words[:, 1] << np.uint64(32))
        return int(hit.sum())

    def clear(self) -> None:
        self.points = None
        self.point_colors = None
        self.handles = None

    def construct_point_cloud(self) -> np.ndarray:
        """Ref PointCloudScanner.cpp:106-110."""
        return np.array(self.points) if self.points is not None else np.zeros((0, 3))
