"""RayTracerFacility-TPU: a TPU-native (JAX/XLA/Pallas) path-tracing framework.

A ground-up rebuild of the capabilities of ``edisonlee0212/RayTracerFacility``
(an OptiX 7 / CUDA renderer) as an idiomatic TPU framework:

* OptiX GAS/IAS hardware BVH        -> XLA-built LBVH over a flattened,
                                       world-space triangle soup
                                       (`ops/bvh.py`, `ops/traverse.py`)
* RT-core traversal + recursion     -> wavefront rendering: `lax.scan` bounce
                                       loop over SoA ray pools with masked
                                       lanes (`models/pathtracer.py`)
* SBT material/program dispatch     -> vectorized gather + `jnp.where` switch
                                       over a material table
* CUDA kernels (skinning, instance) -> batched `jnp.einsum` bakes
                                       (`scene/builder.py`)
* OptiX AI denoiser                 -> small flax U-Net (`models/denoiser.py`)
* single GPU, device 0              -> SPMD sharding of the ray batch over a
                                       `jax.sharding.Mesh` (`parallel/`)

The four launch types of the reference are preserved:

1. camera render    (`models/pathtracer.py`, ref ptx/CameraRendering.cu)
2. illumination     (`models/illumination.py`, ref ptx/IlluminationEstimation.cu)
3. LiDAR scan       (`models/lidar.py`, ref ptx/PointCloudScanning.cu)
4. CompressedBTF    (`mlvq/`, ref MLVQ/*.cuh + CompressedBTF.cpp)
"""

from raytracerfacility_tpu.enums import (
    EnvironmentalLightingType,
    GeometryType,
    MaterialType,
    OutputType,
    RayType,
    RendererType,
)

__version__ = "0.1.0"

__all__ = [
    "EnvironmentalLightingType",
    "GeometryType",
    "MaterialType",
    "OutputType",
    "RayType",
    "RendererType",
]
