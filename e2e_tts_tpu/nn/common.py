"""Shared nn primitives (flax.linen, feature-last layout).

All sequence tensors are (B, T, H) — channels last, the native TPU conv
layout — unlike the reference's (B, C, T) torch convention.  Masks are
True=valid (see ops.masking).
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def grad_scale(x: jnp.ndarray, alpha: float) -> jnp.ndarray:
    """Identity in value; scales the gradient by ``alpha``.

    The reference's ``x.detach() + a * (x - x.detach())`` trick that keeps
    variance-predictor gradients from swamping the encoder
    (reference: layers.py:198-199, predictor_grad=0.1).
    """
    return jax.lax.stop_gradient(x) * (1.0 - alpha) + alpha * x


def sinusoid_table(n_position: int, d_hid: int) -> np.ndarray:
    """Interleaved sin/cos positional table (reference blocks/utils.py:14-34).

    angle[p, i] = p / 10000^(2*(i//2)/d); sin on even dims, cos on odd.
    """
    pos = np.arange(n_position)[:, None].astype(np.float64)
    dim = np.arange(d_hid)[None, :]
    angle = pos / np.power(10000.0, 2 * (dim // 2) / d_hid)
    table = np.zeros((n_position, d_hid), np.float32)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table


def t2t_sinusoid(n_position: int, d_hid: int) -> np.ndarray:
    """tensor2tensor-style [sin | cos] concatenated table with a zero row 0
    (reference sublayers.py:27-44, used by the variance predictors)."""
    half = d_hid // 2
    emb = np.exp(np.arange(half) * -(np.log(10000.0) / (half - 1)))
    ang = np.arange(n_position)[:, None] * emb[None, :]
    table = np.concatenate([np.sin(ang), np.cos(ang)], axis=1)
    if d_hid % 2 == 1:
        table = np.concatenate([table, np.zeros((n_position, 1))], axis=1)
    table[0] = 0.0  # padding position
    return table.astype(np.float32)


class Conv1d(nn.Module):
    """1-D convolution over (B, T, H) with SAME or causal padding."""

    features: int
    kernel_size: int
    dilation: int = 1
    use_bias: bool = True
    padding: str = "SAME"  # "SAME" | "CAUSAL" | "VALID"
    dtype: Any = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x):
        if self.padding == "CAUSAL":
            pad = [( (self.kernel_size - 1) * self.dilation, 0 )]
            pad_mode = pad
        elif self.padding == "SAME":
            total = (self.kernel_size - 1) * self.dilation
            pad_mode = [(total // 2, total - total // 2)]
        else:
            pad_mode = "VALID"
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size,),
            kernel_dilation=(self.dilation,),
            padding=pad_mode,
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=self.kernel_init,
        )(x)


class LayerNorm(nn.Module):
    """LayerNorm over the feature axis; eps matches the reference predictors
    (sublayers.py:159, eps=1e-12)."""

    eps: float = 1e-12
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=self.eps, dtype=self.dtype)(x)


class WNConv1d(nn.Module):
    """Weight-normalized Conv1d storing (v, g) explicitly.

    JAX has no parameterization hooks, so weight norm is expressed in apply:
    ``w = g * v / ||v||`` with the norm over (kernel, in) axes per output
    channel (reference uses torch weight_norm on every vocoder conv,
    vocoder/generator.py:18-33).  ``fuse_weight_norm`` in models/vocoder.py
    bakes (v, g) -> w for serving, the remove_weight_norm equivalent.
    """

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    padding: Any = "SAME"
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        k_shape = (self.kernel_size, in_features // self.groups, self.features)
        v = self.param(
            "v",
            nn.initializers.normal(0.01),
            k_shape,
            jnp.float32,
        )
        g = self.param(
            "g",
            lambda key, shape: jnp.linalg.norm(
                v.reshape(-1, self.features), axis=0
            ),
            (self.features,),
        )
        norm = jnp.linalg.norm(v.reshape(-1, self.features), axis=0)
        w = v * (g / jnp.maximum(norm, 1e-12))[None, None, :]
        if isinstance(self.padding, str):
            padding = self.padding
        else:
            padding = [tuple(self.padding)]
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            w.astype(self.dtype),
            window_strides=(self.stride,),
            padding=padding if isinstance(padding, str) else padding,
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=self.groups,
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(self.dtype)
        return y


class WNConvTranspose1d(nn.Module):
    """Weight-normalized transposed Conv1d (HiFi-GAN upsampling stages).

    Matches torch ConvTranspose1d(k, stride=u, padding=(k-u)//2) semantics:
    output length = T*u (reference vocoder/generator.py:22-25).
    """

    features: int
    kernel_size: int
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        k_shape = (self.kernel_size, in_features, self.features)
        v = self.param("v", nn.initializers.normal(0.01), k_shape, jnp.float32)
        g = self.param(
            "g",
            lambda key, shape: jnp.linalg.norm(v.reshape(-1, self.features), axis=0),
            (self.features,),
        )
        norm = jnp.linalg.norm(v.reshape(-1, self.features), axis=0)
        w = v * (g / jnp.maximum(norm, 1e-12))[None, None, :]

        # torch-equivalent transposed conv: lhs dilation by stride, then a
        # plain convolution with the spatially-flipped kernel and padding
        # k-1-p on both sides, where p = (k - u) // 2.
        # out_len = (T-1)*u - 2p + k = T*u for p = (k-u)//2 (k-u even here)
        p = (self.kernel_size - self.stride) // 2
        pad = self.kernel_size - 1 - p
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            jnp.flip(w, 0).astype(self.dtype),
            window_strides=(1,),
            padding=[(pad, pad)],
            lhs_dilation=(self.stride,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return y + b.astype(self.dtype)
