"""Counter-free per-ray RNG: TEA hash init + 24-bit LCG draws.

Behavioral parity with the reference's ``LinearCongruenceGenerator<16>``
(``include/RayTracerFacility/RayTracer/LinearCongruenceGenerator.hpp:6-36``):
a 16-round TEA-style hash mixes ``(index, seed)`` into a 32-bit state, and each
draw advances the classic ``1664525 * s + 1013904223`` LCG, returning the low
24 bits scaled to ``[0, 1)``.

Everything here is elementwise uint32 arithmetic, so it vectorizes trivially
over SoA ray pools of any shape on the VPU. State is carried *functionally*
(state in, state out) so the bounce loop can thread it through ``lax.scan``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_TEA_ROUNDS = 16
# NOTE: plain Python literals, NOT jnp scalars. A module-level jnp constant
# is a committed device array that jitted callers close over, and gathers /
# fusions against closed-over device constants take a catastrophic slow
# path on the TPU runtime (measured 1000x+). Python ints inline as HLO
# literals and preserve uint32 wraparound via weak typing.
_LCG_A = 1664525
_LCG_C = 1013904223
_MASK24 = 0x00FFFFFF
_INV_2_24 = float(1.0 / 0x01000000)


def lcg_init(val0: jax.Array, val1: jax.Array) -> jax.Array:
    """Hash two uint32 arrays (e.g. pixel index, frame id) into RNG states.

    Ref: LinearCongruenceGenerator.hpp:15-26 (``Init``).
    """
    v0 = jnp.asarray(val0, jnp.uint32)
    v1 = jnp.asarray(val1, jnp.uint32)
    v0, v1 = jnp.broadcast_arrays(v0, v1)
    s0 = jnp.uint32(0)
    for _ in range(_TEA_ROUNDS):
        s0 = s0 + jnp.uint32(0x9E3779B9)
        v0 = v0 + (
            ((v1 << 4) + jnp.uint32(0xA341316C))
            ^ (v1 + s0)
            ^ ((v1 >> 5) + jnp.uint32(0xC8013EA4))
        )
        v1 = v1 + (
            ((v0 << 4) + jnp.uint32(0xAD90777D))
            ^ (v0 + s0)
            ^ ((v0 >> 5) + jnp.uint32(0x7E95761E))
        )
    return v0


def lcg_next(state: jax.Array) -> tuple[jax.Array, jax.Array]:
    """One LCG draw. Returns ``(new_state, uniform_f32 in [0, 1))``.

    Ref: LinearCongruenceGenerator.hpp:28-33 (``operator()``).
    """
    state = _LCG_A * state + _LCG_C
    value = (state & _MASK24).astype(jnp.float32) * _INV_2_24
    return state, value


def lcg_next2(state: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Two sequential draws (the common case: 2D jitter, (theta, phi) pairs)."""
    state, a = lcg_next(state)
    state, b = lcg_next(state)
    return state, a, b
