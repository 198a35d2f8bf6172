"""Device-side display encode — the TPU-native stand-in for the
reference's zero-copy display path.

The reference never moves its frame to the host for display: the f32
frame buffer blits straight into a GL texture via CUDA-GL interop
(ref RayTracer.cu:2232-2256, the OutputTextureHelper at :400-420). A
tunneled TPU has no display-adjacent memory, so "zero-copy" becomes
"smallest possible copy": quantize the gamma-encoded image to uint8 ON
DEVICE and transfer 3 bytes/pixel instead of 16 — a 5.3x cut through a
link that moves ~12 MB/s on the benchmark runtime (a 1080p frame drops
from ~2.7 s to ~0.5 s of transfer).

The quantization matches :func:`raytracerfacility_tpu.utils.image.write_png`
exactly (clip to [0, 1], scale by 255, TRUNCATE — numpy's astype), so a
PNG written from the u8 path is byte-identical to one written from the
f32 path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def encode_u8(image: jax.Array) -> jax.Array:
    """Gamma-encoded (H, W, >=3) f32 image -> (H, W, 3) uint8, on
    device. Same truncating quantization as ``utils.image.write_png``."""
    rgb = jnp.clip(image[..., :3], 0.0, 1.0) * 255.0
    return rgb.astype(jnp.uint8)
