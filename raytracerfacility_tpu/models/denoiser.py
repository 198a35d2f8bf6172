"""CNN denoiser: the TPU replacement for the OptiX AI denoiser.

The reference feeds color + albedo + normal guide layers to
``optixDenoiserInvoke`` and blends the result with the noisy input by
``blendFactor = (1 - strength) / frameId`` when accumulating
(ref RayTracer.cu:494-557, CameraProperties::Resize denoiser setup
:48-92). Here the denoiser is a small residual U-Net (flax linen) over the
same 9 guide channels, trained on (low-spp, high-spp) pairs rendered by the
framework itself; blending semantics are preserved exactly.

MXU notes: convolutions run in bf16 with f32 accumulation
(``preferred_element_type``), channel counts are multiples of 8, and the
network is shallow (3 scales) so a 1080p denoise is a few ms.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
import optax


class ConvBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), dtype=jnp.bfloat16,
                    param_dtype=jnp.float32)(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (3, 3), dtype=jnp.bfloat16,
                    param_dtype=jnp.float32)(x)
        return nn.relu(x)


class DenoiserUNet(nn.Module):
    """3-scale residual U-Net: 9 input channels (demodulated log
    irradiance, albedo, normal) -> residual correction added to the
    input irradiance (see ``_demodulate`` for the domain)."""

    base_features: int = 24

    @nn.compact
    def __call__(self, color, albedo, normal):
        x = jnp.concatenate([color, albedo, normal], axis=-1)
        x = x.astype(jnp.bfloat16)

        e0 = ConvBlock(self.base_features)(x)
        d1 = nn.avg_pool(e0, (2, 2), strides=(2, 2))
        e1 = ConvBlock(self.base_features * 2)(d1)
        d2 = nn.avg_pool(e1, (2, 2), strides=(2, 2))
        e2 = ConvBlock(self.base_features * 4)(d2)

        u1 = jax.image.resize(
            e2, e1.shape[:-1] + (e2.shape[-1],), method="nearest"
        )
        m1 = ConvBlock(self.base_features * 2)(
            jnp.concatenate([u1, e1], axis=-1)
        )
        u0 = jax.image.resize(
            m1, e0.shape[:-1] + (m1.shape[-1],), method="nearest"
        )
        m0 = ConvBlock(self.base_features)(jnp.concatenate([u0, e0], axis=-1))

        # DIRECT prediction (not input + residual): the 1-spp input is
        # dominated by fireflies/zero-pixels; a residual head passes every
        # spike the net fails to exactly cancel, and the leftover speckle
        # is what SSIM punishes hardest (measured: residual head wins MSE
        # but loses SSIM to a plain gaussian blur). A direct head biases
        # toward the smooth target instead.
        out = nn.Conv(3, (3, 3), dtype=jnp.bfloat16,
                      param_dtype=jnp.float32)(m0)
        return out.astype(jnp.float32)


def compute_intensity(color: jax.Array) -> jax.Array:
    """HDR exposure normalizer: the ``optixDenoiserComputeIntensity``
    analog the reference computes before every invoke
    (ref RayTracer.cu:523-531). Returns k = 1 / exp(mean(log(luminance)))
    — the inverse average log-luminance — over the leading image axes, so
    ``color * k`` has average log-luminance 0 regardless of exposure.
    Shapes: (..., H, W, C) -> broadcastable (..., 1, 1, 1)."""
    lum = (0.2126 * color[..., 0] + 0.7152 * color[..., 1]
           + 0.0722 * color[..., 2])
    log_l = jnp.log(jnp.maximum(lum, 1e-8))
    avg = jnp.exp(jnp.mean(log_l, axis=(-2, -1), keepdims=True))
    k = 1.0 / jnp.clip(avg, 1e-4, 1e4)
    return k[..., None]


_ALBEDO_EPS = 0.02


def _demodulate(color: jax.Array, albedo: jax.Array) -> jax.Array:
    """Albedo demodulation + log range compression: the network denoises
    ``log1p(color / max(albedo, eps))`` — approximately the surface
    IRRADIANCE — instead of radiance. The albedo factor carries all the
    texture/material detail and is noise-free (it comes from the first-hit
    AOV), so dividing it out leaves the network a smooth low-frequency
    signal; log1p tames 1-spp fireflies, whose magnitudes otherwise
    dominate an L1 loss. Both maps are exactly inverted by
    ``_remodulate``, and both run AFTER the intensity normalization, so
    exposure equivariance stays exact. Color clamps at 0 (radiance is
    non-negative; log1p is undefined below -1)."""
    return jnp.log1p(jnp.maximum(color, 0.0) / jnp.maximum(albedo, _ALBEDO_EPS))


def _remodulate(pred: jax.Array, albedo: jax.Array) -> jax.Array:
    # the target domain is log1p(non-negative), so a valid prediction is
    # in [0, ~13] (log1p(max_color / eps)); clamping keeps a bf16
    # activation blow-up from overflowing expm1 to inf (pred > 88)
    return jnp.expm1(jnp.clip(pred, 0.0, 30.0)) * jnp.maximum(albedo, _ALBEDO_EPS)


def _albedo_guide(albedo: jax.Array) -> jax.Array:
    """Normalize the albedo GUIDE INPUT to [0, 1] (the OptiX denoiser's
    guide-layer range contract, which the reference satisfies implicitly
    for LDR materials). HDR albedo AOVs (a decoded BTF can reach 1e3+)
    otherwise explode the bf16 conv activations far outside the training
    distribution. Frames whose albedo is already <= 1 (the training
    distribution) pass through unchanged, so the packaged checkpoint is
    unaffected. Only the network input is scaled — the demodulation
    divisor stays raw, so _remodulate still inverts _demodulate exactly."""
    peak = jnp.max(albedo, axis=(-3, -2, -1), keepdims=True)
    return albedo / jnp.maximum(1.0, peak)


def _pad_to_multiple(img: jax.Array, multiple: int = 4) -> tuple[jax.Array, tuple]:
    h, w = img.shape[-3], img.shape[-2]
    ph = (-h) % multiple
    pw = (-w) % multiple
    if ph or pw:
        pad = [(0, 0)] * (img.ndim - 3) + [(0, ph), (0, pw), (0, 0)]
        img = jnp.pad(img, pad, mode="edge")
    return img, (h, w)


@partial(jax.jit, static_argnames=("base_features",))
def _denoise_jit(params, color, albedo, normal, blend, base_features):
    """Whole-invoke jit: unjitted, the ~60-op U-Net pays the tunneled
    runtime's ~1.5 ms/eager-dispatch per op (measured 850 ms for a 1080p
    denoise); jitted it is one dispatch (measured ~23 ms)."""
    model = DenoiserUNet(base_features)
    c = color[None, ..., :3]
    a = albedo[None, ..., :3]
    n = normal[None, ..., :3]
    k = compute_intensity(c)
    c, (h, w) = _pad_to_multiple(_demodulate(c * k, a))
    a, _ = _pad_to_multiple(a)
    n, _ = _pad_to_multiple(n)
    pred = model.apply(params, c, _albedo_guide(a), n)
    out = _remodulate(pred, a)[0, :h, :w] / k[0]
    return out * (1.0 - blend) + color[..., :3] * blend


@dataclasses.dataclass
class Denoiser:
    """Host-side wrapper mirroring the OptiX denoiser lifecycle
    (create/setup/invoke, ref RayTracer.cu:48-92, 508-556)."""

    base_features: int = 24
    params: dict | None = None

    def __post_init__(self):
        self.model = DenoiserUNet(self.base_features)

    def init(self, seed: int = 0) -> dict:
        dummy = jnp.zeros((1, 32, 32, 3))
        self.params = self.model.init(
            jax.random.PRNGKey(seed), dummy, dummy, dummy
        )
        return self.params

    def denoise(
        self,
        color: jax.Array,  # (H, W, 3/4) linear or gamma-encoded color
        albedo: jax.Array,
        normal: jax.Array,
        blend_factor: float | jax.Array = 0.0,
    ) -> jax.Array:
        """Single-image denoise with the reference's blend semantics:
        output = denoised * (1 - blend) + noisy * blend. The input is
        exposure-normalized by the inverse average log-luminance before
        the network and de-normalized after (the
        optixDenoiserComputeIntensity step the reference runs per invoke,
        ref RayTracer.cu:523-531) — exposure ranges outside the training
        distribution denoise identically to nominal ones."""
        assert self.params is not None, "init() or load params first"
        blend = jnp.asarray(blend_factor, jnp.float32)
        return _denoise_jit(self.params, color, albedo, normal, blend,
                            self.base_features)

    @staticmethod
    def blend_factor(strength: float, frame_id: int, accumulate: bool) -> float:
        """Ref RayTracer.cu:515-521."""
        if accumulate and frame_id > 1:
            return (1.0 - strength) / frame_id
        return 1.0 - strength

    def save(self, path: str) -> None:
        """Checkpoint params as an npz of '/'-joined flax dict paths."""
        from flax.traverse_util import flatten_dict

        assert self.params is not None
        flat = flatten_dict(self.params, sep="/")
        np.savez_compressed(path, **{k: np.asarray(v) for k, v in flat.items()})

    def load(self, path: str) -> "Denoiser":
        from flax.traverse_util import unflatten_dict

        z = np.load(path)
        flat = {k: jnp.asarray(z[k]) for k in z.files}
        self.params = unflatten_dict(flat, sep="/")
        return self


_WEIGHTS_BASENAME = "denoiser_weights.npz"


def default_denoiser() -> Denoiser | None:
    """The packaged pretrained denoiser (the counterpart of the OptiX
    denoiser's built-in weights): trained by scripts/train_denoiser.py on
    (1-spp, 64-spp) pairs rendered by this framework. Returns None when no
    checkpoint ships (the renderer then skips denoising)."""
    import os

    path = os.path.join(os.path.dirname(__file__), _WEIGHTS_BASENAME)
    if not os.path.exists(path):
        return None
    d = Denoiser()
    return d.load(path)


# --------------------------------------------------------------------------
# training
# --------------------------------------------------------------------------


def denoiser_loss(model: DenoiserUNet, params, batch) -> jax.Array:
    """L1 + gradient loss on (noisy, albedo, normal, clean) batches.

    Each element normalizes by its own inverse average log-luminance
    (matching the inference path), so the network only ever sees
    exposure-normalized input and the loss weights every exposure
    equally."""
    noisy, albedo, normal, clean = batch
    k = compute_intensity(noisy)
    noisy = _demodulate(noisy * k, albedo)
    clean = _demodulate(clean * k, albedo)
    pred = model.apply(params, noisy, _albedo_guide(albedo), normal)
    l1 = jnp.mean(jnp.abs(pred - clean))
    dy_p = pred[:, 1:] - pred[:, :-1]
    dy_c = clean[:, 1:] - clean[:, :-1]
    dx_p = pred[:, :, 1:] - pred[:, :, :-1]
    dx_c = clean[:, :, 1:] - clean[:, :, :-1]
    grad = jnp.mean(jnp.abs(dy_p - dy_c)) + jnp.mean(jnp.abs(dx_p - dx_c))
    return l1 + 0.5 * grad


def make_train_step(model: DenoiserUNet, optimizer):
    @jax.jit
    def train_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(
            lambda p: denoiser_loss(model, p, batch)
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def make_sharded_train_step(model: DenoiserUNet, optimizer, mesh, axis: str = "tile"):
    """Data-parallel training step over a device mesh: batch sharded on
    ``axis``, gradients all-reduced with ``lax.pmean`` over ICI. This is the
    multi-chip training path exercised by ``dryrun_multichip``."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    def step(params, opt_state, batch):
        def shard_fn(params, opt_state, batch):
            loss, grads = jax.value_and_grad(
                lambda p: denoiser_loss(model, p, batch)
            )(params)
            grads = jax.lax.pmean(grads, axis)
            loss = jax.lax.pmean(loss, axis)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        batch_spec = tuple(P(axis) for _ in batch)
        return shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(), P(), batch_spec),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )(params, opt_state, batch)

    return jax.jit(step)


def render_training_pairs(
    scene,
    camera,
    env,
    config,
    num_pairs: int = 4,
    clean_spp: int = 64,
    seed: int = 0,
):
    """Self-supervised data: (1-spp noisy, AOVs, high-spp clean) tiles
    rendered by the framework's own path tracer."""
    import dataclasses as dc

    from raytracerfacility_tpu.models.pathtracer import (
        init_frame,
        render_frame_jit,
    )

    noisy_cfg = dc.replace(config, samples=1, accumulate=False)
    clean_cfg = dc.replace(config, samples=clean_spp, accumulate=False)
    batches = []
    for i in range(num_pairs):
        frame_n = init_frame(config.width, config.height)
        frame_n = dc.replace(frame_n, frame_id=jnp.int32(seed + i * 7919))
        noisy = render_frame_jit(scene, camera, env, noisy_cfg, frame_n)
        frame_c = init_frame(config.width, config.height)
        frame_c = dc.replace(frame_c, frame_id=jnp.int32(seed + i * 7919))
        clean = render_frame_jit(scene, camera, env, clean_cfg, frame_c)
        batches.append(
            (
                noisy.color[..., :3],
                noisy.albedo[..., :3],
                noisy.normal[..., :3],
                clean.color[..., :3],
            )
        )
    return tuple(jnp.stack(x) for x in zip(*batches))
