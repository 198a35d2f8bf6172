"""Train the packaged denoiser checkpoint on framework-rendered pairs.

The OptiX denoiser ships pretrained weights (ref RayTracer.cu:48-92 just
creates it); this framework trains its own on (1-spp noisy, 64-spp clean)
pairs produced by its own path tracer over a mix of scenes — the
self-supervised recipe from models/denoiser.py::render_training_pairs,
widened across cameras and scenes for generalization.

Run on the TPU:  python scripts/train_denoiser.py  (writes
raytracerfacility_tpu/models/denoiser_weights.npz, ~1.6 MB).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from raytracerfacility_tpu.models.denoiser import (
    Denoiser,
    make_train_step,
    render_training_pairs,
)
from raytracerfacility_tpu.models.pathtracer import RenderConfig
from raytracerfacility_tpu.models.renderer import EnvironmentProperties
from raytracerfacility_tpu.ops.camera import CameraProperties

TILE = 128
CLEAN_SPP = 64
STEPS = int(os.environ.get("RTF_DENOISER_STEPS", "1500"))
BATCH = 8


def _scenes():
    from __graft_entry__ import _bench_scene
    from raytracerfacility_tpu.scene.procedural import build_canopy_scene
    from tests.test_smoke import build_test_scene

    out = []
    # bench Cornell variant, several cameras
    scene, cam, _ = _bench_scene(TILE, TILE)
    compiled = scene.build()
    for pose in [((0.0, 1.1, 2.6), (0.0, 0.8, 0.0)),
                 ((1.2, 1.6, 2.0), (0.0, 0.5, 0.0)),
                 ((-1.0, 0.6, 2.2), (0.2, 0.9, 0.0)),
                 ((0.0, 2.2, 1.2), (0.0, 0.0, 0.0))]:
        c = CameraProperties(fov=70.0, size=(TILE, TILE))
        c.look_at_target(*pose)
        out.append((compiled, c))
    # smoke-test scene
    compiled2 = build_test_scene().build()
    for pose in [((0.0, 1.0, 2.4), (0.0, 0.9, 0.0)),
                 ((1.5, 1.2, 1.8), (0.0, 0.7, 0.0))]:
        c = CameraProperties(fov=80.0, size=(TILE, TILE))
        c.look_at_target(*pose)
        out.append((compiled2, c))
    # canopy
    compiled3 = build_canopy_scene(rows=5, cols=5).build()
    for pose in [((1.5, 1.8, 1.5), (0.0, 0.6, 0.0)),
                 ((0.0, 2.5, 2.5), (0.0, 0.2, 0.0))]:
        c = CameraProperties(fov=60.0, size=(TILE, TILE))
        c.look_at_target(*pose)
        out.append((compiled3, c))
    return out


def main() -> None:
    env = EnvironmentProperties(skylight_intensity=1.0)
    config = RenderConfig(width=TILE, height=TILE, bounces=4, samples=1,
                          enable_textures=False, enable_vertex_color=False)
    batches = []
    t0 = time.time()
    for si, (compiled, cam) in enumerate(_scenes()):
        pairs = render_training_pairs(
            compiled, cam.state(), env.state(), config,
            num_pairs=6, clean_spp=CLEAN_SPP, seed=si * 1000 + 1,
        )
        batches.append(pairs)
        print(f"scene {si}: rendered 6 pairs ({time.time()-t0:.0f}s)",
              flush=True)
    data = tuple(jnp.concatenate(parts, axis=0) for parts in zip(*batches))
    n = data[0].shape[0]
    print(f"dataset: {n} pairs", flush=True)

    den = Denoiser()
    den.init(seed=0)
    opt = optax.adam(optax.cosine_decay_schedule(2e-4, STEPS, 0.05))
    opt_state = opt.init(den.params)
    step = make_train_step(den.model, opt)

    rng = np.random.default_rng(0)
    params = den.params
    for it in range(STEPS):
        idx = rng.integers(0, n, BATCH)
        batch = tuple(d[jnp.asarray(idx)] for d in data)
        params, opt_state, loss = step(params, opt_state, batch)
        if it % 100 == 0 or it == STEPS - 1:
            print(f"step {it}: loss {float(loss):.5f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    den.params = params

    out = os.path.join(os.path.dirname(__file__), "..",
                       "raytracerfacility_tpu", "models",
                       "denoiser_weights.npz")
    den.save(out)
    print("saved", out, flush=True)

    # quick quality report: denoised 1-spp vs clean on a held-out render
    from raytracerfacility_tpu.utils.image import ssim

    noisy, albedo, normal, clean = (np.asarray(d[-1]) for d in data)
    den_img = np.asarray(den.denoise(
        jnp.asarray(noisy), jnp.asarray(albedo), jnp.asarray(normal)))
    print("SSIM noisy vs clean:   ", ssim(noisy, clean))
    print("SSIM denoised vs clean:", ssim(den_img, clean))


if __name__ == "__main__":
    main()
