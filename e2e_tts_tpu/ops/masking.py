"""Length/mask utilities.

Convention: masks are boolean with **True = valid position** (the reference
uses the inverted convention, True = padded, function.py:17-25; we flip it
once here so every downstream op multiplies instead of masked-filling).
"""

from __future__ import annotations

import jax.numpy as jnp


def sequence_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) lengths -> (B, max_len) bool mask, True where index < length."""
    ids = jnp.arange(max_len, dtype=lengths.dtype)
    return ids[None, :] < lengths[:, None]


def attn_mask(q_mask: jnp.ndarray, k_mask: jnp.ndarray) -> jnp.ndarray:
    """(B, Lq), (B, Lk) -> (B, Lq, Lk) pairwise validity mask."""
    return q_mask[:, :, None] & k_mask[:, None, :]


def mask_fill(x: jnp.ndarray, mask: jnp.ndarray, value: float) -> jnp.ndarray:
    """Set positions where mask is False to `value` (broadcasts on trailing dims)."""
    while mask.ndim < x.ndim:
        mask = mask[..., None]
    return jnp.where(mask, x, value)
