"""HiFi-GAN discriminators (multi-period + multi-scale).

Reference: e2e_tts/models/vocoder/discriminator.py:6-62, layers.py:72-133.
Period folding reshapes audio (B, T) -> (B, T/p, p, 1) and runs 2-D convs
with kernel (5,1) — on TPU these lower to batched 1-D convs over the folded
axis.  Channels-last throughout.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .common import WNConv1d

LRELU_SLOPE = 0.1


def _lrelu(x):
    return nn.leaky_relu(x, LRELU_SLOPE)


class WNConv2d(nn.Module):
    """Weight-normalized 2-D conv, NHWC."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[Tuple[int, int], Tuple[int, int]] = ((0, 0), (0, 0))
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        import jax

        in_features = x.shape[-1]
        k_shape = (*self.kernel_size, in_features, self.features)
        v = self.param("v", nn.initializers.normal(0.01), k_shape, jnp.float32)
        g = self.param(
            "g",
            lambda key, shape: jnp.linalg.norm(v.reshape(-1, self.features), axis=0),
            (self.features,),
        )
        norm = jnp.linalg.norm(v.reshape(-1, self.features), axis=0)
        w = v * (g / jnp.maximum(norm, 1e-12))[None, None, None, :]
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            w.astype(self.dtype),
            window_strides=self.strides,
            padding=list(self.padding),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return y + b.astype(self.dtype)


class PeriodDiscriminator(nn.Module):
    """One period discriminator (reference layers.py:72-105).

    ``channels`` defaults to the reference widths; dryruns/tests shrink it so
    the GAN step stays cheap on virtual CPU meshes."""

    period: int
    kernel_size: int = 5
    stride: int = 3
    channels: Tuple[int, ...] = (32, 128, 512, 1024)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, audio):
        B, T = audio.shape
        p = self.period
        n_pad = (p - T % p) % p
        if n_pad:
            # reflect-pad the tail so T is divisible by the period
            audio = jnp.concatenate([audio, audio[:, T - n_pad - 1 : T - 1][:, ::-1]], axis=1)
        x = audio.reshape(B, -1, p, 1)  # (B, T/p, p, 1) NHWC

        fmaps = []
        pad = ((self.kernel_size - 1) // 2, (self.kernel_size - 1) // 2)
        for i, ch in enumerate(self.channels):
            x = WNConv2d(
                ch, (self.kernel_size, 1), (self.stride, 1),
                (pad, (0, 0)), dtype=self.dtype, name=f"conv_{i}",
            )(x)
            x = _lrelu(x)
            fmaps.append(x)
        x = WNConv2d(
            self.channels[-1], (self.kernel_size, 1), (1, 1), ((2, 2), (0, 0)),
            dtype=self.dtype, name=f"conv_{len(self.channels)}",
        )(x)
        x = _lrelu(x)
        fmaps.append(x)
        x = WNConv2d(1, (3, 1), (1, 1), ((1, 1), (0, 0)), dtype=self.dtype, name="conv_post")(x)
        fmaps.append(x)
        return x.reshape(B, -1), fmaps


REFERENCE_MSD_SPECS = (
    # (features, kernel, stride, groups, pad) — reference layers.py:108-133
    (128, 15, 1, 1, 7),
    (128, 41, 2, 4, 20),
    (256, 41, 2, 16, 20),
    (512, 41, 4, 16, 20),
    (1024, 41, 4, 16, 20),
    (1024, 41, 1, 16, 20),
    (1024, 5, 1, 1, 2),
)

TINY_MSD_SPECS = (
    # shrunken layer stack for virtual-CPU dryruns / tests
    (8, 15, 1, 1, 7),
    (16, 41, 4, 4, 20),
    (16, 5, 1, 1, 2),
)


class ScaleDiscriminator(nn.Module):
    """One scale discriminator (reference layers.py:108-133)."""

    specs: Tuple[Tuple[int, int, int, int, int], ...] = REFERENCE_MSD_SPECS
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, audio):
        x = audio[..., None]  # (B, T, 1)
        fmaps = []
        for i, (ch, k, s, grp, pad) in enumerate(self.specs):
            x = WNConv1d(
                ch, k, stride=s, groups=grp, padding=(pad, pad),
                dtype=self.dtype, name=f"conv_{i}",
            )(x)
            x = _lrelu(x)
            fmaps.append(x)
        x = WNConv1d(1, 3, padding=(1, 1), dtype=self.dtype, name="conv_post")(x)
        fmaps.append(x)
        return x.reshape(audio.shape[0], -1), fmaps


class MultiPeriodDiscriminator(nn.Module):
    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    channels: Tuple[int, ...] = (32, 128, 512, 1024)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, real, fake):
        r_logits, r_fmaps, f_logits, f_fmaps = [], [], [], []
        for p in self.periods:
            d = PeriodDiscriminator(
                p, channels=self.channels, dtype=self.dtype, name=f"period_{p}"
            )
            lr, fr = d(real)
            lf, ff = d(fake)
            r_logits.append(lr)
            r_fmaps.append(fr)
            f_logits.append(lf)
            f_fmaps.append(ff)
        return r_logits, f_logits, r_fmaps, f_fmaps


class MultiScaleDiscriminator(nn.Module):
    n_scales: int = 3
    specs: Tuple[Tuple[int, int, int, int, int], ...] = REFERENCE_MSD_SPECS
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, real, fake):
        r_logits, r_fmaps, f_logits, f_fmaps = [], [], [], []
        for i in range(self.n_scales):
            d = ScaleDiscriminator(specs=self.specs, dtype=self.dtype, name=f"scale_{i}")
            lr, fr = d(real)
            lf, ff = d(fake)
            r_logits.append(lr)
            r_fmaps.append(fr)
            f_logits.append(lf)
            f_fmaps.append(ff)
            if i < self.n_scales - 1:
                real = nn.avg_pool(
                    real[..., None], (4,), strides=(2,), padding=((2, 2),)
                )[..., 0]
                fake = nn.avg_pool(
                    fake[..., None], (4,), strides=(2,), padding=((2, 2),)
                )[..., 0]
        return r_logits, f_logits, r_fmaps, f_fmaps


# --- GAN losses (reference vocoder/loss.py:4-35) ----------------------------


def feature_loss(real_fmaps: List, fake_fmaps: List) -> jnp.ndarray:
    loss = 0.0
    for fr, ff in zip(real_fmaps, fake_fmaps):
        for r, f in zip(fr, ff):
            loss = loss + jnp.mean(jnp.abs(r - f))
    return loss * 2.0


def discriminator_loss(real_logits: List, fake_logits: List) -> jnp.ndarray:
    loss = 0.0
    for r, f in zip(real_logits, fake_logits):
        loss = loss + jnp.mean((1.0 - r) ** 2) + jnp.mean(f**2)
    return loss


def generator_adv_loss(fake_logits: List) -> jnp.ndarray:
    loss = 0.0
    for f in fake_logits:
        loss = loss + jnp.mean((1.0 - f) ** 2)
    return loss
