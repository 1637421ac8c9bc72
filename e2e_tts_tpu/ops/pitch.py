"""On-device pitch quantization (reference: function.py:8-14, 178-187)."""

from __future__ import annotations

import math

import jax.numpy as jnp

F0_BIN = 256
F0_MIN = 50.0
F0_MAX = 1100.0
# Pure-Python constants: importing this module must never touch a JAX
# backend (a module-level jnp op here initialized the TPU client at import
# time and crashed bench runs when the tunnel was briefly unavailable).
_F0_MEL_MIN = 1127.0 * math.log(1 + F0_MIN / 700.0)
_F0_MEL_MAX = 1127.0 * math.log(1 + F0_MAX / 700.0)


def f0_to_coarse(f0: jnp.ndarray) -> jnp.ndarray:
    """Quantize f0 in Hz to 256 mel-spaced bins; 0 Hz (unvoiced) -> bin 1.

    Jittable mirror of the reference's ``tensor_f0_to_coarse``
    (function.py:178-187) without its host-side assert.
    """
    f0_mel = 1127.0 * jnp.log(1 + jnp.maximum(f0, 0.0) / 700.0)
    scaled = (f0_mel - _F0_MEL_MIN) * (F0_BIN - 2) / (_F0_MEL_MAX - _F0_MEL_MIN) + 1
    scaled = jnp.where(f0_mel > 0, scaled, 1.0)
    scaled = jnp.clip(scaled, 1.0, F0_BIN - 1)
    return jnp.floor(scaled + 0.5).astype(jnp.int32)


def bucketize(x: jnp.ndarray, boundaries: jnp.ndarray) -> jnp.ndarray:
    """torch.bucketize (right=False) equivalent: number of boundaries
    strictly below x — a value exactly ON a boundary belongs to the LOWER
    bin (side="left"), matching the reference's prosody-bin lookups."""
    return jnp.searchsorted(boundaries, x, side="left").astype(jnp.int32)
