"""Voice conversion interface.

The reference wires FreeVC through Coqui-TTS (reference: synthesizer.py:26-28,
58-65) — an external torch checkpoint.  This module defines the same
``convert(src, target, out)`` interface with two backends:

- ``SpectralVoiceConverter`` (always available): spectral-envelope transfer —
  morphs the source's smoothed log-spectrum toward the target speaker's
  average envelope and resynthesizes with Griffin-Lim phase from the source.
  A classical DSP baseline, not FreeVC quality, but fully self-contained.
- any object with the same ``convert`` signature (e.g. a future JAX FreeVC)
  can be swapped in at the router.
"""

from __future__ import annotations

import numpy as np

from ..audio.filters import hann_window
from ..audio.wav import read_wav, write_wav


def _stft(x, n_fft=1024, hop=256):
    w = hann_window(n_fft)
    n = 1 + (len(x) - n_fft) // hop if len(x) >= n_fft else 0
    if n <= 0:
        x = np.pad(x, (0, n_fft - len(x) + 1))
        n = 1
    idx = np.arange(n)[:, None] * hop + np.arange(n_fft)[None, :]
    return np.fft.rfft(x[idx] * w, axis=1)


def _istft(spec, n_fft=1024, hop=256):
    w = hann_window(n_fft)
    frames = np.fft.irfft(spec, n=n_fft, axis=1) * w
    out_len = n_fft + hop * (len(frames) - 1)
    out = np.zeros(out_len)
    norm = np.zeros(out_len)
    for i, f in enumerate(frames):
        out[i * hop : i * hop + n_fft] += f
        norm[i * hop : i * hop + n_fft] += w**2
    return (out / np.maximum(norm, 1e-8)).astype(np.float32)


def _smooth_envelope(mag: np.ndarray, width: int = 31) -> np.ndarray:
    """Cepstral-ish smoothing of the average log magnitude spectrum."""
    log_avg = np.log(np.maximum(mag, 1e-8)).mean(axis=0)
    kernel = np.ones(width) / width
    return np.convolve(log_avg, kernel, mode="same")


class SpectralVoiceConverter:
    def __init__(self, n_fft: int = 1024, hop: int = 256, strength: float = 1.0):
        self.n_fft = n_fft
        self.hop = hop
        self.strength = strength

    def convert(self, source_path: str, target_path: str, out_path: str) -> str:
        src, sr = read_wav(source_path)
        tgt, sr_t = read_wav(target_path)

        S = _stft(src, self.n_fft, self.hop)
        T = _stft(tgt, self.n_fft, self.hop)

        env_src = _smooth_envelope(np.abs(S))
        env_tgt = _smooth_envelope(np.abs(T))
        # move source envelope toward target's, keep fine structure + phase
        correction = np.exp(self.strength * (env_tgt - env_src))
        out_spec = S * correction[None, :]

        audio = _istft(out_spec, self.n_fft, self.hop)
        peak = np.abs(audio).max()
        if peak > 1.0:
            audio = audio / peak
        write_wav(out_path, audio, sr)
        return out_path
