"""Variance adaptor: duration / pitch / energy modelling + alignment.

TPU-native redesign of the reference adaptor (reference:
unsupervised_fastspeech2/layers.py:12-272):

- the unsupervised aligner's Gaussian attention is computed as a squared-
  distance matmul expansion (MXU) instead of an O(B*C*T1*T2) broadcast cube;
- MAS binarization runs on device (ops.mas) instead of a host numba round
  trip every step;
- length regulation is a static-shape gather (ops.length_regulator);
- frame->phoneme prosody pooling is a one-hot segment-mean matmul instead of
  per-item numpy loops (function.py:155-175).

Supervised (MFA-duration) and unsupervised (aligner) modes are one module:
pass ``duration_target`` for supervised training, ``attn_prior`` + ``mel``
for unsupervised (reference keeps two near-duplicate trees, SURVEY §2.3).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import (
    average_by_segments,
    durations_to_mel2ph,
    f0_to_coarse,
    bucketize,
    monotonic_align,
    regulate_length,
    sequence_mask,
)
from .common import Conv1d, LayerNorm, grad_scale, t2t_sinusoid

NEG_INF = -1e9


@dataclass(frozen=True)
class FeatureStats:
    """Corpus statistics bundle (the deploy-time stats.json,
    reference src/api/utils.py:36)."""

    pitch_min: float = 0.0
    pitch_max: float = 800.0
    pitch_mean: float = 200.0
    pitch_std: float = 50.0
    energy_min: float = 0.0
    energy_max: float = 100.0
    energy_mean: float = 30.0
    energy_std: float = 15.0
    f0_mean: float = 200.0
    f0_std: float = 50.0

    @classmethod
    def from_dict(cls, d: Dict) -> "FeatureStats":
        def g(k, f, default):
            return float(d.get(k, {}).get(f, default))

        return cls(
            pitch_min=g("pitch", "min", 0.0),
            pitch_max=g("pitch", "max", 800.0),
            pitch_mean=g("pitch", "mean", 200.0),
            pitch_std=g("pitch", "std", 50.0),
            energy_min=g("energy", "min", 0.0),
            energy_max=g("energy", "max", 100.0),
            energy_mean=g("energy", "mean", 30.0),
            energy_std=g("energy", "std", 15.0),
            f0_mean=g("f0", "mean", 200.0),
            f0_std=g("f0", "std", 50.0),
        )

    def to_dict(self) -> Dict:
        return {
            "pitch": {
                "min": self.pitch_min, "max": self.pitch_max,
                "mean": self.pitch_mean, "std": self.pitch_std,
            },
            "energy": {
                "min": self.energy_min, "max": self.energy_max,
                "mean": self.energy_mean, "std": self.energy_std,
            },
            "f0": {"mean": self.f0_mean, "std": self.f0_std},
        }


class ConvPredictorStack(nn.Module):
    """N x (conv -> relu -> LN -> dropout) -> linear head; the shared body of
    the duration and variance predictors (reference layers.py:372-505)."""

    n_chans: int
    n_layers: int
    kernel_size: int
    odim: int
    dropout: float
    padding: str = "SAME"
    head_bias_init: float = 0.0
    ln_eps: float = 1e-12
    mask_between: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        for i in range(self.n_layers):
            x = Conv1d(
                self.n_chans, self.kernel_size,
                padding="CAUSAL" if self.padding != "SAME" else "SAME",
                dtype=self.dtype, name=f"conv_{i}",
            )(x)
            x = nn.relu(x)
            x = LayerNorm(eps=self.ln_eps, dtype=self.dtype, name=f"ln_{i}")(x)
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
            if mask is not None and self.mask_between:
                x = x * mask[..., None]
        return nn.Dense(
            self.odim,
            dtype=self.dtype,
            bias_init=nn.initializers.constant(self.head_bias_init),
            name="linear",
        )(x)


class DurationPredictor(nn.Module):
    """Log-domain duration predictor.

    Two architectures matching the reference's two trees:
    - style="espnet" (unsupervised tree, layers.py:372-420): channels =
      n_mel, per-layer masking, LN eps 1e-12;
    - style="ming024" (supervised tree, supervised layers.py:240-297):
      channels = filter_size, no inter-layer masking, LN eps 1e-5.
    """

    n_chans: int
    n_layers: int = 2
    kernel_size: int = 3
    dropout: float = 0.5
    padding: str = "SAME"
    style: str = "espnet"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        # head bias starts at log(5+1): a fresh model predicts ~5 frames per
        # phoneme instead of zero-length speech (the reference starts at 0
        # and relies on the aligner to bootstrap durations)
        out = ConvPredictorStack(
            self.n_chans, self.n_layers, self.kernel_size, 1, self.dropout,
            self.padding, head_bias_init=1.7918,
            ln_eps=1e-12 if self.style == "espnet" else 1e-5,
            mask_between=self.style == "espnet",
            dtype=self.dtype, name="stack",
        )(x, mask if self.style == "espnet" else None, deterministic)
        return (out * mask[..., None])[..., 0]


class VariancePredictor(nn.Module):
    """Pitch/energy predictor with t2t sinusoidal positions
    (reference layers.py:460-505)."""

    n_chans: int
    n_layers: int
    kernel_size: int
    odim: int
    dropout: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        T = x.shape[1]
        alpha = self.param("pos_alpha", nn.initializers.ones, (1,))
        pos = jnp.asarray(t2t_sinusoid(T + 1, x.shape[-1]), self.dtype)
        # positions follow non-padding frames (reference make_positions,
        # function.py:28-38).  Reference-parity caveat: by the time x gets
        # here the speaker embedding has been added to EVERY position
        # (adaptor __call__), so padded rows are nonzero and positions
        # count straight through them — exactly like the reference, whose
        # make_positions keys on xs[..., 0] after the same addition and
        # whose conv stack is equally unmasked.  Masking here would
        # diverge from converted torch checkpoints.
        nonpad = (jnp.abs(x).sum(-1) > 0).astype(jnp.int32)
        positions = jnp.cumsum(nonpad, axis=1) * nonpad
        x = x + alpha * pos[positions]
        out = ConvPredictorStack(
            self.n_chans, self.n_layers, self.kernel_size, self.odim,
            self.dropout, "SAME", dtype=self.dtype, name="stack",
        )(x, None, deterministic)
        return out


class AlignmentEncoder(nn.Module):
    """Gaussian-distance text/mel aligner (reference layers.py:275-369).

    Returns (attn_soft, attn_logprob), both (B, T_mel, T_text).
    """

    n_att_channels: int
    temperature: float = 0.0005
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mel, txt_emb, txt_mask, attn_prior=None, spk_emb=None):
        if spk_emb is not None:
            txt_emb = txt_emb + nn.Dense(
                txt_emb.shape[-1], use_bias=False, dtype=self.dtype,
                name="key_spk_proj",
            )(spk_emb)[:, None, :]
            mel = mel + nn.Dense(
                mel.shape[-1], use_bias=False, dtype=self.dtype,
                name="query_spk_proj",
            )(spk_emb)[:, None, :]

        k = Conv1d(txt_emb.shape[-1] * 2, 3, dtype=self.dtype, name="key_conv1")(txt_emb)
        k = nn.relu(k)
        k = Conv1d(self.n_att_channels, 1, dtype=self.dtype, name="key_conv2")(k)

        q = Conv1d(mel.shape[-1] * 2, 3, dtype=self.dtype, name="query_conv1")(mel)
        q = nn.relu(q)
        q = Conv1d(mel.shape[-1], 1, dtype=self.dtype, name="query_conv2")(q)
        q = nn.relu(q)
        q = Conv1d(self.n_att_channels, 1, dtype=self.dtype, name="query_conv3")(q)

        # -t * ||q - k||^2 expanded so the cross term is one MXU matmul
        q2 = jnp.sum(q * q, axis=-1)[:, :, None]
        k2 = jnp.sum(k * k, axis=-1)[:, None, :]
        qk = jnp.einsum("bqc,bkc->bqk", q, k)
        attn = -self.temperature * (q2 + k2 - 2.0 * qk)

        if attn_prior is not None:
            attn = jax.nn.log_softmax(attn, axis=-1) + jnp.log(attn_prior + 1e-8)
        attn_logprob = attn
        attn = jnp.where(txt_mask[:, None, :], attn, NEG_INF)
        attn_soft = jax.nn.softmax(attn, axis=-1)
        return attn_soft, attn_logprob


class VarianceAdaptor(nn.Module):
    """Duration + pitch + energy adaptation between encoder and decoder."""

    n_mel_channels: int
    hidden_dim: int
    stats: FeatureStats
    # variance_predictor config
    predictor_grad: float = 0.1
    filter_size: int = 256
    dropout: float = 0.5
    dur_layers: int = 2
    dur_kernel: int = 3
    pit_layers: int = 2
    pit_kernel: int = 5
    ener_layers: int = 2
    ener_kernel: int = 5
    ffn_padding: str = "SAME"
    # variance_embedding config
    use_uv: bool = True
    n_bins: int = 256
    f0_bins: int = 300
    pitch_feature: str = "phoneme_level"
    pitch_quantization: str = "linear"
    energy_feature: str = "phoneme_level"
    energy_quantization: str = "linear"
    # duration modelling
    learn_alignment: bool = True
    aligner_temperature: float = 0.0005
    binarization_start_steps: int = 6000
    dtype: Any = jnp.float32

    def setup(self):
        # each reference tree ships its own duration-predictor architecture;
        # follow the tree that matches the duration mode
        if self.learn_alignment:
            self.duration_predictor = DurationPredictor(
                n_chans=self.n_mel_channels,
                n_layers=self.dur_layers,
                kernel_size=self.dur_kernel,
                dropout=self.dropout,
                padding=self.ffn_padding,
                style="espnet",
                dtype=self.dtype,
            )
        else:
            self.duration_predictor = DurationPredictor(
                n_chans=self.filter_size,
                n_layers=2,
                kernel_size=self.dur_kernel,
                dropout=self.dropout,
                padding=self.ffn_padding,
                style="ming024",
                dtype=self.dtype,
            )
        if self.learn_alignment:
            self.aligner = AlignmentEncoder(
                n_att_channels=self.n_mel_channels,
                temperature=self.aligner_temperature,
                dtype=self.dtype,
            )
        self.pitch_predictor = VariancePredictor(
            n_chans=self.filter_size,
            n_layers=self.pit_layers,
            kernel_size=self.pit_kernel,
            odim=2 if self.use_uv else 1,
            dropout=self.dropout,
            dtype=self.dtype,
        )
        self.pitch_embedding = nn.Embed(
            self.n_bins if self.use_uv else self.f0_bins, self.hidden_dim
        )
        self.energy_predictor = VariancePredictor(
            n_chans=self.filter_size,
            n_layers=self.ener_layers,
            kernel_size=self.ener_kernel,
            odim=1,
            dropout=self.dropout,
            dtype=self.dtype,
        )
        self.energy_embedding = nn.Embed(self.n_bins, self.hidden_dim)

    def _pitch_bins(self):
        import numpy as np

        if self.pitch_quantization == "log":
            return jnp.asarray(
                np.exp(
                    np.linspace(
                        np.log(max(self.stats.pitch_min, 1e-4)),
                        np.log(self.stats.pitch_max),
                        self.n_bins - 1,
                    )
                ),
                jnp.float32,
            )
        return jnp.linspace(
            self.stats.pitch_min, self.stats.pitch_max, self.n_bins - 1
        )

    def _energy_bins(self):
        import numpy as np

        if self.energy_quantization == "log":
            return jnp.asarray(
                np.exp(
                    np.linspace(
                        np.log(max(self.stats.energy_min, 1e-4)),
                        np.log(self.stats.energy_max),
                        self.n_bins - 1,
                    )
                ),
                jnp.float32,
            )
        return jnp.linspace(
            self.stats.energy_min, self.stats.energy_max, self.n_bins - 1
        )

    def _pitch_embed(self, x, target, control, deterministic):
        """(prediction, embedding) — reference layers.py:136-162."""
        x = grad_scale(x, self.predictor_grad)
        pred = self.pitch_predictor(x, deterministic)
        if self.use_uv:
            if target is not None:
                f0s, uvs = target["f0"], target["uv"]
            else:
                pred = pred * control
                f0s = pred[..., 0]
                uvs = pred[..., 1] > 0
            if self.pitch_quantization == "log":
                f0_denorm = 2.0**f0s
            else:
                f0_denorm = f0s * self.stats.f0_std + self.stats.f0_mean
            f0_denorm = jnp.where(uvs > 0, 0.0, f0_denorm)
            emb = self.pitch_embedding(f0_to_coarse(f0_denorm))
        else:
            pred = pred[..., 0]
            pitch = target if target is not None else pred * control
            emb = self.pitch_embedding(bucketize(pitch, self._pitch_bins()))
        return pred, emb.astype(self.dtype)

    def _energy_embed(self, x, target, control, deterministic):
        x = grad_scale(x, self.predictor_grad)
        pred = self.energy_predictor(x, deterministic)[..., 0]
        energy = target if target is not None else pred * control
        emb = self.energy_embedding(bucketize(energy, self._energy_bins()))
        return pred, emb.astype(self.dtype)

    def __call__(
        self,
        x,                      # (B, L, H) encoder output
        txt_emb,                # (B, L, H) raw phoneme embeddings
        txt_lens,               # (B,)
        txt_mask,               # (B, L) True=valid
        spk_emb,                # (B, H)
        max_mel_len: int,
        mel=None,               # (B, T, n_mels) training target
        mel_lens=None,          # (B,)
        attn_prior=None,        # (B, T, L) beta-binomial prior
        duration_target=None,   # (B, L) supervised durations
        pitch_target=None,
        energy_target=None,
        step=None,
        p_control: float = 1.0,
        e_control: float = 1.0,
        d_control: float = 1.0,
        deterministic: bool = True,
    ):
        x = x + spk_emb[:, None, :]

        log_duration_prediction = self.duration_predictor(
            grad_scale(x, self.predictor_grad), txt_mask, deterministic
        )

        attn_soft = attn_hard = attn_logprob = None
        training = mel is not None or duration_target is not None

        if duration_target is not None:
            duration_rounded = duration_target
        elif self.learn_alignment and mel is not None:
            attn_soft, attn_logprob = self.aligner(
                mel, txt_emb, txt_mask, attn_prior, spk_emb
            )
            attn_hard = monotonic_align(attn_soft, txt_lens, mel_lens)
            duration_rounded = attn_hard.sum(axis=1)  # (B, L)
        else:
            duration_rounded = jnp.clip(
                jnp.round(jnp.exp(log_duration_prediction) - 1.0) * d_control,
                min=0.0,
            )
            duration_rounded = duration_rounded * txt_mask

        # phoneme-level prosody
        if self.pitch_feature == "phoneme_level" or self.energy_feature == "phoneme_level":
            dur_int = duration_rounded.astype(jnp.int32)
            if training and (pitch_target is not None or energy_target is not None):
                L = x.shape[1]
                T_frames = (
                    pitch_target["f0"].shape[1]
                    if isinstance(pitch_target, dict)
                    else (energy_target.shape[1] if energy_target is not None else max_mel_len)
                )
                ph_mel2ph = durations_to_mel2ph(dur_int, T_frames)
                pool = lambda f: average_by_segments(f, ph_mel2ph, mel_lens, L)
                if isinstance(pitch_target, dict):
                    pitch_target = {
                        "f0": pool(pitch_target["f0"]),
                        # a phoneme is unvoiced only when all its frames are
                        # (reference layers.py:227-231)
                        "uv": (pool(pitch_target["uv"]) >= 1.0 - 1e-6).astype(jnp.float32),
                    }
                elif pitch_target is not None:
                    pitch_target = pool(pitch_target)
                if energy_target is not None:
                    energy_target = pool(energy_target)

        # both predictors read the same base features; embeddings accumulate
        # separately (reference x_tmp pattern, layers.py:224-241)
        pitch_prediction = energy_prediction = None
        if self.pitch_feature == "phoneme_level" or self.energy_feature == "phoneme_level":
            x_base = x
            if self.pitch_feature == "phoneme_level":
                pitch_prediction, pitch_emb = self._pitch_embed(
                    x_base, pitch_target if training else None, p_control, deterministic
                )
                x = x + pitch_emb
            if self.energy_feature == "phoneme_level":
                energy_prediction, energy_emb = self._energy_embed(
                    x_base, energy_target if training else None, e_control, deterministic
                )
                x = x + energy_emb

        # expand phoneme-rate to frame-rate
        if training and self.learn_alignment and mel is not None and step is not None:
            # soft expansion during aligner warmup, hard after
            # (reference layers.py:244-248)
            x_soft = jnp.einsum("btl,blh->bth", attn_soft, x)
            x_hard, hard_lens, _ = regulate_length(
                x, duration_rounded.astype(jnp.int32), max_mel_len
            )
            use_soft = step < self.binarization_start_steps
            x = jnp.where(use_soft, x_soft, x_hard)
            out_mel_lens = mel_lens
        else:
            x, out_mel_lens, _ = regulate_length(
                x, duration_rounded.astype(jnp.int32), max_mel_len
            )
            if training and mel_lens is not None:
                out_mel_lens = mel_lens
        mel_mask = sequence_mask(out_mel_lens, max_mel_len)

        # frame-level prosody (same x_tmp pattern, layers.py:251-258)
        if self.pitch_feature == "frame_level" or self.energy_feature == "frame_level":
            x_base = x
            if self.pitch_feature == "frame_level":
                pitch_prediction, pitch_emb = self._pitch_embed(
                    x_base, pitch_target if training else None, p_control, deterministic
                )
                x = x + pitch_emb
            if self.energy_feature == "frame_level":
                energy_prediction, energy_emb = self._energy_embed(
                    x_base, energy_target if training else None, e_control, deterministic
                )
                x = x + energy_emb

        return {
            "x": x,
            "log_duration_prediction": log_duration_prediction,
            "duration_rounded": duration_rounded,
            "pitch_prediction": pitch_prediction,
            "energy_prediction": energy_prediction,
            "mel_lens": out_mel_lens,
            "mel_mask": mel_mask,
            "attn_soft": attn_soft,
            "attn_hard": attn_hard,
            "attn_logprob": attn_logprob,
            "pitch_target": pitch_target,
            "energy_target": energy_target,
        }
