"""Learned MOS-proxy predictor.

The reference scores synthesized speech with a pretrained MOSNet through the
``speechmetrics`` package (reference: modules/metrics/mos_test.py:16-35).
That checkpoint cannot ship here, so the quality metric is *trained
in-framework*: a small convolutional regressor over log-mels learns to
predict a degradation-severity score on speech corrupted by calibrated
distortions (additive noise, clipping, time dropouts, lowpass smearing,
mains hum).  Scores live on MOSNet's [1, 5] scale — 5 = clean, 1 = severely
degraded.

Honesty note: this is a learned *degradation* metric, trained on synthetic
corruptions, not on human opinion scores; it ranks cleaner audio above
degraded audio but is not a human-MOS estimate.  The harness in
utils/metrics.py labels it accordingly.

TPU notes: the network is conv + global statistics pooling only (no
recurrence, static shapes) so it jits to a single MXU-friendly program at a
fixed analysis window; long audio is scored as a mean over windows.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# fixed analysis window (mel frames); ~3 s at hop 256 / 22050 Hz
MOS_WINDOW = 256


class MosPredictor(nn.Module):
    """log-mel (B, T, n_mels) -> score in [1, 5] per clip."""

    hidden: int = 64

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        x = mel
        # strided conv stack: time downsample 8x, channels to `hidden`
        for i, stride in enumerate((2, 2, 2)):
            x = nn.Conv(self.hidden, (5,), strides=(stride,), name=f"conv_{i}")(x)
            x = nn.LayerNorm(name=f"ln_{i}")(x)
            x = nn.gelu(x)
        # global statistics pooling (mean + std over time) -> utterance vector
        mu = x.mean(axis=1)
        sd = jnp.sqrt(jnp.clip(x.var(axis=1), 1e-6))
        h = jnp.concatenate([mu, sd], axis=-1)
        h = nn.gelu(nn.Dense(self.hidden, name="fc1")(h))
        raw = nn.Dense(1, name="fc2")(h)[..., 0]
        return 1.0 + 4.0 * jax.nn.sigmoid(raw)


# ---------------------------------------------------------------------------
# Calibrated degradations.  severity in [0, 1]; target = 5 - 4 * severity.
# ---------------------------------------------------------------------------


def _snr_noise(audio, severity, rng):
    """White noise from 40 dB SNR (imperceptible) down to 0 dB."""
    snr_db = 40.0 * (1.0 - severity)
    sig_pow = np.mean(audio**2) + 1e-12
    noise_pow = sig_pow / (10 ** (snr_db / 10))
    return audio + rng.randn(len(audio)) * np.sqrt(noise_pow)


def _clip(audio, severity, rng):
    """Hard clipping from none down to 10% of peak."""
    peak = np.abs(audio).max() + 1e-9
    thresh = peak * (1.0 - 0.9 * severity)
    return np.clip(audio, -thresh, thresh)


def _dropout(audio, severity, rng):
    """Zeroed segments covering up to 40% of the clip (packet loss)."""
    out = audio.copy()
    total = int(len(audio) * 0.4 * severity)
    seg = max(1, int(0.02 * 22050))  # 20 ms holes
    n = max(0, total // seg)
    for _ in range(n):
        s = rng.randint(0, max(1, len(audio) - seg))
        out[s : s + seg] = 0.0
    return out


def _lowpass(audio, severity, rng):
    """Spectral smearing: FFT brickwall from 11 kHz down to 1 kHz."""
    cutoff = 11025.0 * (1.0 - severity) + 1000.0 * severity
    spec = np.fft.rfft(audio)
    freqs = np.fft.rfftfreq(len(audio), 1 / 22050.0)
    return np.fft.irfft(spec * (freqs <= cutoff), n=len(audio))


def _hum(audio, severity, rng):
    """50 Hz mains hum + harmonic, up to half the signal RMS."""
    t = np.arange(len(audio)) / 22050.0
    rms = np.sqrt(np.mean(audio**2)) + 1e-9
    amp = 0.5 * rms * severity
    return audio + amp * (np.sin(2 * np.pi * 50 * t) + 0.5 * np.sin(2 * np.pi * 150 * t))


DEGRADATIONS = (_snr_noise, _clip, _dropout, _lowpass, _hum)


def degrade(
    audio: np.ndarray, severity: float, rng: np.random.RandomState,
    kind: Optional[int] = None,
) -> np.ndarray:
    """Apply one (or a random) calibrated degradation at ``severity``."""
    fn = DEGRADATIONS[
        int(kind) if kind is not None else rng.randint(len(DEGRADATIONS))
    ]
    out = fn(audio.astype(np.float64), float(severity), rng)
    peak = np.abs(out).max()
    if peak > 1.0:
        out = out / peak
    return out.astype(np.float32)


def severity_to_score(severity: float) -> float:
    return 5.0 - 4.0 * float(severity)


# ---------------------------------------------------------------------------
# Inference helper: audio -> windows of log-mel -> mean score.
# ---------------------------------------------------------------------------


def mel_windows(audio: np.ndarray, sample_rate: int) -> np.ndarray:
    """(n_windows, MOS_WINDOW, 80) log-mel windows of a waveform."""
    from ..audio.mel import MelParams, mel_spectrogram

    p = MelParams(sample_rate=sample_rate)
    hop = p.hop_length
    need = MOS_WINDOW * hop
    if len(audio) < need:
        audio = np.pad(audio, (0, need - len(audio)))
    n_win = len(audio) // need
    wins = []
    for w in range(n_win):
        seg = audio[w * need : (w + 1) * need]
        mel = np.asarray(mel_spectrogram(seg[None], p)[0], np.float32)
        wins.append(mel.T[:MOS_WINDOW])
    return np.stack(wins)


_APPLY = None


def score_audio(params, audio: np.ndarray, sample_rate: int) -> float:
    """Mean window score for a waveform (float in [-1, 1])."""
    global _APPLY
    if _APPLY is None:
        _APPLY = jax.jit(MosPredictor().apply)  # one cached program set
    wins = mel_windows(audio, sample_rate)
    # one-window batches per call: every n_windows shape would otherwise be
    # a fresh XLA program; scoring window-by-window reuses a single (1, ...)
    # program regardless of clip length
    scores = [
        float(_APPLY(params, jnp.asarray(wins[i : i + 1]))[0])
        for i in range(len(wins))
    ]
    return float(np.mean(scores))
