"""CudaModule-equivalent facade: the L3 API surface.

The reference funnels everything through a singleton ``CudaModule``
(ref CUDAModule.hpp:29-46 / CUDAModule.cpp:14-64): ``Init`` (device 0 +
OptiX handle + RayTracer construction), ``Terminate``, and the two batch
workloads with host<->device marshalling. The TPU framework needs no
singleton or manual marshalling (jax owns devices and transfers), but the
facade is preserved so reference users find the same entry points.
"""

from __future__ import annotations

import numpy as np


class RayTracerModule:
    """API-parity facade over the scene store + workload front-ends."""

    _instance = None

    def __init__(self) -> None:
        import jax

        from raytracerfacility_tpu.scene.scene import RayTracerScene

        # ref CUDAModule.cpp:25 hardcodes device 0; we record the default
        # jax device (and the framework can still shard across all of them)
        self.device = jax.devices()[0]
        self.scene = RayTracerScene()

    # ------------------------------------------------------------------
    @classmethod
    def init(cls) -> "RayTracerModule":
        """Ref CudaModule::Init (CUDAModule.cpp:23-28)."""
        if cls._instance is None:
            cls._instance = cls()
        return cls._instance

    @classmethod
    def terminate(cls) -> None:
        """Ref CudaModule::Terminate."""
        cls._instance = None

    @classmethod
    def get_ray_tracer(cls):
        """Ref CudaModule::GetRayTracer — exposes the scene store."""
        return cls.init().scene

    # ------------------------------------------------------------------
    def estimate_illumination_ray_tracing(
        self, environment, ray_properties, probes, seed: int = 0,
        push_normal_distance: float = 0.001,
    ):
        """Ref CudaModule::EstimateIlluminationRayTracing
        (CUDAModule.cpp:39-50): run the illumination estimator over
        prepared probes against the current scene."""
        from raytracerfacility_tpu.models.illumination import (
            estimate_illumination_jit,
        )
        from raytracerfacility_tpu.models.pathtracer import RenderConfig

        compiled = self.scene.build()
        config = RenderConfig(
            bounces=ray_properties.bounces,
            samples=ray_properties.samples,
            lighting_type=environment.lighting_type,
        )
        return estimate_illumination_jit(
            compiled, environment.state(), config, probes, seed,
            push_normal_distance,
        )

    def sample_point_cloud(self, environment, start, direction):
        """Ref CudaModule::SamplePointCloud (CUDAModule.cpp:52-64)."""
        from raytracerfacility_tpu.models.lidar import scan_point_cloud_jit

        del environment  # the reference passes it but PCS ignores lighting
        compiled = self.scene.build()
        import jax.numpy as jnp

        return scan_point_cloud_jit(
            compiled, jnp.asarray(start, jnp.float32),
            jnp.asarray(direction, jnp.float32),
        )

    def load_btf_materials(self, folder_paths: list[str], base_handle: int = 1 << 20):
        """Ref RayTracer::LoadBtfMaterials (RayTracer.hpp:394): import UBO
        databases and register them as CompressedBTF materials. Returns the
        material handles."""
        from raytracerfacility_tpu.enums import MaterialType
        from raytracerfacility_tpu.mlvq.importer import import_btf_folder

        handles = []
        for i, folder in enumerate(folder_paths):
            data = import_btf_folder(folder)
            handle = base_handle + i
            self.scene.upsert_material(
                handle, version=0,
                material_type=MaterialType.COMPRESSED_BTF, btf=data,
            )
            handles.append(handle)
        return handles
