"""Mel postnet: 5x conv(512, k5) + BatchNorm + tanh, residual added by the
caller (reference: unsupervised_fastspeech2/layers.py:508-563)."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .common import Conv1d


class Postnet(nn.Module):
    n_mel_channels: int
    embedding_dim: int = 512
    n_layers: int = 5
    kernel_size: int = 5
    dropout: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mel, train: bool = False):
        """(B, T, n_mels) -> residual correction (B, T, n_mels)."""
        x = mel
        for i in range(self.n_layers):
            last = i == self.n_layers - 1
            x = Conv1d(
                self.n_mel_channels if last else self.embedding_dim,
                self.kernel_size,
                dtype=self.dtype,
                name=f"conv_{i}",
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train, dtype=self.dtype, name=f"bn_{i}"
            )(x)
            if not last:
                x = jnp.tanh(x)
            x = nn.Dropout(self.dropout)(x, deterministic=not train)
        return x
