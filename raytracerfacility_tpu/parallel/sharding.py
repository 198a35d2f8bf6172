"""SPMD rendering over a device mesh: the multi-chip scale axis.

The reference is single-GPU by construction (device 0, one CUDA stream —
ref CUDAModule.cpp:25, RayTracer.cu:826-828); its only scale axis is the
launch grid. The TPU-native scale-out (SURVEY.md section 2.6) shards the
*ray batch* over a 2D ``jax.sharding.Mesh``:

* ``tile`` axis — image rows are split across devices (each device traces
  its own pixel band; zero communication),
* ``spp`` axis — samples-per-pixel are split across devices; the linear
  sample sums reduce with one ``lax.psum`` over ICI before the (nonlinear)
  progressive-accumulation finalize runs replicated.

The scene (BVH + materials) is replicated on every chip — renderer scenes
are small next to HBM, and replication keeps traversal entirely local, so
the only collective per frame is the spp psum. This matches the
"replicated scene, sharded rays" recipe in SURVEY.md section 7.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from raytracerfacility_tpu.models.pathtracer import (
    FrameBuffers,
    RenderConfig,
    finalize_frame,
    render_samples,
)


def make_mesh(
    n_devices: int | None = None,
    tile: int | None = None,
    spp: int = 1,
    devices=None,
) -> Mesh:
    """Build a ('tile', 'spp') mesh over the first ``n_devices`` devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if tile is None:
        tile = n // spp
    assert tile * spp == n, f"mesh {tile}x{spp} != {n} devices"
    dev_array = np.asarray(devices).reshape(tile, spp)
    return Mesh(dev_array, ("tile", "spp"))


def render_frame_sharded(
    scene,
    camera,
    env,
    config: RenderConfig,
    frame: FrameBuffers,
    mesh: Mesh,
) -> FrameBuffers:
    """One progressive frame, SPMD over the mesh.

    Requires ``config.height % tile == 0`` and
    ``config.samples % spp == 0``. Frame buffers are sharded by rows over
    'tile'; the scene and camera are replicated.
    """
    n_tile = mesh.shape["tile"]
    n_spp = mesh.shape["spp"]
    assert config.height % n_tile == 0, "height must divide the tile axis"
    assert config.samples % n_spp == 0, "samples must divide the spp axis"
    local_h = config.height // n_tile
    local_s = config.samples // n_spp

    from jax import shard_map

    @jax.jit
    def step(scene, camera, env, frame):
        def shard_fn(scene, camera, env, frame):
            tile_idx = jax.lax.axis_index("tile")
            spp_idx = jax.lax.axis_index("spp")
            color, normal, albedo, position, _ = render_samples(
                scene,
                camera,
                env,
                config,
                frame.frame_id,
                row_offset=tile_idx * local_h,
                local_height=local_h,
                sample_count=local_s,
                sample_stream=spp_idx,
            )
            # combine partial sample sums across the spp axis (ICI psum)
            color = jax.lax.psum(color, "spp")
            normal = jax.lax.psum(normal, "spp")
            albedo = jax.lax.psum(albedo, "spp")
            position = jax.lax.psum(position, "spp")
            return finalize_frame(
                camera, config, frame, color, normal, albedo, position
            )

        frame_spec = FrameBuffers(
            color=P("tile", None, None),
            normal=P("tile", None, None),
            albedo=P("tile", None, None),
            frame_id=P(),
        )
        return shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(), P(), P(), frame_spec),
            out_specs=frame_spec,
            check_vma=False,
        )(scene, camera, env, frame)

    # place inputs according to the sharding so jit does not re-layout
    frame_sharding = jax.tree.map(
        lambda spec: NamedSharding(mesh, spec),
        FrameBuffers(
            color=P("tile", None, None),
            normal=P("tile", None, None),
            albedo=P("tile", None, None),
            frame_id=P(),
        ),
        is_leaf=lambda x: isinstance(x, P),
    )
    frame = jax.tree.map(jax.device_put, frame, frame_sharding)
    return step(scene, camera, env, frame)


def _pad_axis0(tree, pad: int):
    """Zero-pad every leaf's leading axis by ``pad`` rows."""
    return jax.tree.map(
        lambda x: jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0
        ),
        tree,
    )


def estimate_illumination_sharded(
    scene,
    env,
    config: RenderConfig,
    probes,
    mesh: Mesh,
    seed: int = 0,
    push_normal_distance: float = 0.001,
):
    """Probe-axis SPMD illumination estimate (the flagship batch workload,
    BASELINE config 4): probes shard over EVERY device of the mesh (both
    named axes), the scene replicates, and each shard runs the standard
    estimator with its global probe offset so RNG streams — and therefore
    energies — are bit-identical to the single-device launch. Probes are
    independent, so the only communication is the initial shard scatter
    and final gather (no collective in the hot loop)."""
    from raytracerfacility_tpu.models.illumination import (
        LightProbes,
        estimate_illumination,
    )
    from jax import shard_map

    n = mesh.size
    p = probes.num_probes
    pad = (-p) % n
    padded = _pad_axis0(probes, pad) if pad else probes
    local = (p + pad) // n
    axes = tuple(mesh.axis_names)
    spec = P(axes)
    probes_spec = jax.tree.map(lambda _: spec, padded)
    n_inner = mesh.shape[axes[1]] if len(axes) > 1 else 1

    @jax.jit
    def step(scene, env, probes, seed):
        def shard_fn(scene, env, probes, seed):
            idx = jax.lax.axis_index(axes[0])
            if len(axes) > 1:
                idx = idx * n_inner + jax.lax.axis_index(axes[1])
            return estimate_illumination(
                scene, env, config, probes, seed,
                push_normal_distance, probe_offset=idx * local,
            )

        return shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(), P(), probes_spec, P()),
            out_specs=probes_spec,
            check_vma=False,
        )(scene, env, probes, seed)

    out = step(scene, env, padded, jnp.asarray(seed, jnp.uint32))
    if pad:
        out = jax.tree.map(lambda x: x[:p], out)
    return out


def scan_point_cloud_sharded(scene, start, direction, mesh: Mesh):
    """Beam-axis SPMD LiDAR sweep (ref launch ScanPointCloud,
    RayTracer.cu:758-795): beams shard over every device; the single
    closest-hit query needs no RNG and no collectives, so shards are
    exactly the single-device results restitched."""
    from raytracerfacility_tpu.models.lidar import scan_point_cloud
    from jax import shard_map

    n = mesh.size
    r = start.shape[0]
    pad = (-r) % n
    if pad:
        # pad rays point along +z from far outside the scene: guaranteed
        # valid direction, results sliced off below
        start = jnp.concatenate(
            [start, jnp.full((pad, 3), 1e8, jnp.float32)], axis=0)
        direction = jnp.concatenate(
            [direction,
             jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32),
                      (pad, 1))], axis=0)
    spec = P(tuple(mesh.axis_names))

    @jax.jit
    def step(scene, start, direction):
        return shard_map(
            lambda sc, st, d: scan_point_cloud(sc, st, d),
            mesh=mesh,
            in_specs=(P(), spec, spec),
            out_specs=spec,
            check_vma=False,
        )(scene, start, direction)

    out = step(scene, start, direction)
    if pad:
        out = jax.tree.map(lambda x: x[:r], out)
    return out
