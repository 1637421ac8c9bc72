"""HiFi-GAN and iSTFTNet vocoder generators.

TPU-native rebuild of the reference generators (reference:
e2e_tts/models/vocoder/generator.py, layers.py:10-69):

- channels-last (B, T, C) layout so every conv lowers to NWC convolutions;
- weight norm carried as explicit (v, g) parameters (WNConv*), with
  ``fuse_weight_norm`` baking them into plain kernels for serving — the
  ``remove_weight_norm()`` equivalent (generator.py:55-62);
- the three parallel ResBlocks per upsample stage are averaged exactly as
  the reference does (generator.py:42-48).

The RTF-dominant compute is the stack of dilated convs at high sample rates;
kernels/ provides a fused Pallas path, this module is the XLA reference.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .common import WNConv1d, WNConvTranspose1d

LRELU_SLOPE = 0.1


def _lrelu(x):
    return nn.leaky_relu(x, LRELU_SLOPE)


class ResBlock1(nn.Module):
    """2-conv residual unit x3 dilations (reference layers.py:10-46)."""

    channels: int
    kernel_size: int = 3
    dilations: Tuple[int, ...] = (1, 3, 5)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            h = _lrelu(x)
            h = WNConv1d(
                self.channels, self.kernel_size, dilation=d, dtype=self.dtype,
                name=f"conv1_{i}",
            )(h)
            h = _lrelu(h)
            h = WNConv1d(
                self.channels, self.kernel_size, dilation=1, dtype=self.dtype,
                name=f"conv2_{i}",
            )(h)
            x = x + h
        return x


class ResBlock2(nn.Module):
    """1-conv residual unit x2 dilations (reference layers.py:49-69)."""

    channels: int
    kernel_size: int = 3
    dilations: Tuple[int, ...] = (1, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            h = _lrelu(x)
            h = WNConv1d(
                self.channels, self.kernel_size, dilation=d, dtype=self.dtype,
                name=f"conv_{i}",
            )(h)
            x = x + h
        return x


class _GeneratorTrunk(nn.Module):
    """conv_pre + upsample/resblock pyramid shared by both generator heads."""

    upsample_rates: Tuple[int, ...]
    upsample_kernel_sizes: Tuple[int, ...]
    upsample_initial_channel: int
    resblock_kernel_sizes: Tuple[int, ...]
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...]
    resblock_type: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mel):
        Res = ResBlock1 if self.resblock_type == 1 else ResBlock2
        x = WNConv1d(
            self.upsample_initial_channel, 7, dtype=self.dtype, name="conv_pre"
        )(mel)
        for i, (u, k) in enumerate(
            zip(self.upsample_rates, self.upsample_kernel_sizes)
        ):
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            x = _lrelu(x)
            x = WNConvTranspose1d(ch, k, u, dtype=self.dtype, name=f"up_{i}")(x)
            acc = None
            for j, (rk, rd) in enumerate(
                zip(self.resblock_kernel_sizes, self.resblock_dilation_sizes)
            ):
                h = Res(ch, rk, tuple(rd), dtype=self.dtype, name=f"res_{i}_{j}")(x)
                acc = h if acc is None else acc + h
            x = acc / len(self.resblock_kernel_sizes)
        return x


class HifiGanGenerator(nn.Module):
    """mel (B, T, 80) -> waveform (B, T*prod(rates)) in [-1, 1]."""

    upsample_rates: Tuple[int, ...] = (8, 8, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = (
        (1, 3, 5), (1, 3, 5), (1, 3, 5),
    )
    resblock_type: int = 1
    dtype: Any = jnp.float32

    @classmethod
    def from_config(cls, cfg, dtype=jnp.float32):
        return cls(
            upsample_rates=tuple(cfg.upsample_rates),
            upsample_kernel_sizes=tuple(cfg.upsample_kernel_sizes),
            upsample_initial_channel=cfg.upsample_initial_channel,
            resblock_kernel_sizes=tuple(cfg.resblock_kernel_sizes),
            resblock_dilation_sizes=tuple(cfg.resblock_dilation_sizes),
            resblock_type=cfg.resblock,
            dtype=dtype,
        )

    @nn.compact
    def __call__(self, mel):
        x = _GeneratorTrunk(
            self.upsample_rates,
            self.upsample_kernel_sizes,
            self.upsample_initial_channel,
            self.resblock_kernel_sizes,
            self.resblock_dilation_sizes,
            self.resblock_type,
            self.dtype,
            name="trunk",
        )(mel)
        # the reference's final activation uses torch's default slope 0.01,
        # not LRELU_SLOPE (generator.py:49)
        x = nn.leaky_relu(x, 0.01)
        x = WNConv1d(1, 7, dtype=jnp.float32, name="conv_post")(x)
        return jnp.tanh(x)[..., 0]


class IstftNetGenerator(nn.Module):
    """iSTFTNet head: 2 upsample stages then per-frame spectrum prediction
    (magnitude exp + phase sin), inverted to audio by audio.inverse_stft
    (reference generator.py:65-109; config model_config.yaml istft)."""

    gen_istft_n_fft: int = 16
    upsample_rates: Tuple[int, ...] = (8, 8)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = (
        (1, 3, 5), (1, 3, 5), (1, 3, 5),
    )
    resblock_type: int = 1
    dtype: Any = jnp.float32

    @classmethod
    def from_config(cls, cfg, dtype=jnp.float32):
        return cls(
            gen_istft_n_fft=cfg.gen_istft_n_fft,
            upsample_rates=tuple(cfg.upsample_rates),
            upsample_kernel_sizes=tuple(cfg.upsample_kernel_sizes),
            upsample_initial_channel=cfg.upsample_initial_channel,
            resblock_kernel_sizes=tuple(cfg.resblock_kernel_sizes),
            resblock_dilation_sizes=tuple(cfg.resblock_dilation_sizes),
            resblock_type=cfg.resblock,
            dtype=dtype,
        )

    @nn.compact
    def __call__(self, mel):
        x = _GeneratorTrunk(
            self.upsample_rates,
            self.upsample_kernel_sizes,
            self.upsample_initial_channel,
            self.resblock_kernel_sizes,
            self.resblock_dilation_sizes,
            self.resblock_type,
            self.dtype,
            name="trunk",
        )(mel)
        # default torch slope 0.01 here, matching the reference quirk
        # (generator.py:103)
        x = nn.leaky_relu(x, 0.01)
        # reflection pad (1, 0) on time (reference generator.py:89,104)
        x = jnp.concatenate([x[:, 1:2, :], x], axis=1)
        x = WNConv1d(
            self.gen_istft_n_fft + 2, 7, dtype=jnp.float32, name="conv_post"
        )(x)
        half = self.gen_istft_n_fft // 2 + 1
        spec = jnp.exp(x[..., :half])
        phase = jnp.sin(x[..., half:])
        # (B, T, bins) -> (B, bins, T) for the iSTFT
        return jnp.swapaxes(spec, 1, 2), jnp.swapaxes(phase, 1, 2)
