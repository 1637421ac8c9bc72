"""Vocoder bias denoiser (reference: models/vocoder/denoiser.py:55-186).

HiFi-GAN leaves a constant bias hum; the reference estimates it by vocoding
an all-zeros mel, taking the magnitude spectrum of the first frame, and
spectrally subtracting it (keeping the noisy phase).  Same algorithm here on
the JAX STFT ops — jittable end to end, no hard-coded .cuda() (the
reference's denoiser only runs on GPU, denoiser.py).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..audio.filters import hann_window
from ..audio.mel import inverse_stft


def _stft_mag_phase(audio, n_fft, hop, win):
    assert win <= n_fft, (win, n_fft)
    window = jnp.asarray(hann_window(win))
    if win < n_fft:
        # center-pad a short window to n_fft (same as inverse_stft) so the
        # frame product and the mag/phase round trip stay consistent
        lpad = (n_fft - win) // 2
        window = jnp.pad(window, (lpad, n_fft - win - lpad))
    pad = n_fft // 2
    x = jnp.pad(audio, [(0, 0), (pad, pad)], mode="reflect")
    n_frames = 1 + (x.shape[-1] - n_fft) // hop
    idx = (
        np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    )
    frames = x[:, idx] * window
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    spec = jnp.swapaxes(spec, -1, -2)  # (B, bins, frames)
    return jnp.abs(spec), jnp.angle(spec)


class Denoiser:
    """Spectral-subtraction denoiser for a vocoder's bias floor."""

    def __init__(
        self,
        vocode_fn,
        n_mel_channels: int = 80,
        n_fft: int = 1024,
        hop_length: int = 256,
        win_length: int = 1024,
        mode: str = "zeros",
        bias_frames: int = 88,
    ):
        """vocode_fn: mel (B, T, n_mels) -> audio (B, samples)."""
        self.n_fft = n_fft
        self.hop = hop_length
        self.win = win_length
        if mode == "zeros":
            mel = jnp.zeros((1, bias_frames, n_mel_channels))
        elif mode == "normal":
            import jax

            mel = jax.random.normal(
                jax.random.PRNGKey(0), (1, bias_frames, n_mel_channels)
            )
        else:
            raise ValueError(f"unknown denoiser mode {mode!r}")
        bias_audio = vocode_fn(mel)
        mag, _ = _stft_mag_phase(bias_audio, n_fft, hop_length, win_length)
        # first-frame magnitude is the bias spectrum (reference denoiser.py:178)
        self.bias_spec = mag[:, :, 0:1]

    def __call__(self, audio: jnp.ndarray, strength: float = 0.1) -> jnp.ndarray:
        """audio (B, T) -> denoised audio (B, ~T)."""
        mag, phase = _stft_mag_phase(audio, self.n_fft, self.hop, self.win)
        mag = jnp.clip(mag - self.bias_spec * strength, min=0.0)
        return inverse_stft(mag, phase, self.n_fft, self.hop, self.win)
