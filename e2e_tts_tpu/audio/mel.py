"""STFT / mel-spectrogram ops in JAX.

TPU-native counterpart of the reference's ``TorchSTFT``
(reference: src/tools/stft.py:11-148).  Everything here is a pure function of
arrays plus a hashable static ``MelParams``, so it jits and fuses into larger
programs (e.g. the vocoder training step computes mel loss on-device instead
of the reference's host-side torch.stft round trip).

Framing is expressed as a gather into (frames, win) tiles followed by an
rfft — XLA lowers this to efficient batched FFTs; the mel projection is a
single (n_mels, n_bins) x (n_bins, frames) matmul on the MXU.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .filters import hann_window, mel_filterbank


@dataclass(frozen=True)
class MelParams:
    sample_rate: int = 22050
    n_fft: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    n_mels: int = 80
    fmin: float = 0.0
    fmax: Optional[float] = 8000.0
    clip_val: float = 1e-5

    @classmethod
    def from_config(cls, audio_cfg, loss: bool = False) -> "MelParams":
        mel = audio_cfg.mel
        return cls(
            sample_rate=audio_cfg.signal.sampling_rate,
            n_fft=audio_cfg.stft.filter_length,
            hop_length=audio_cfg.stft.hop_length,
            win_length=audio_cfg.stft.win_length,
            n_mels=mel.channels,
            fmin=mel.mel_fmin,
            fmax=mel.mel_fmax_loss if loss else mel.mel_fmax,
        )


@functools.lru_cache(maxsize=8)
def _basis(p: MelParams) -> Tuple[np.ndarray, np.ndarray]:
    # torch.stft center-pads a short window to n_fft (librosa pad_center
    # semantics, reference stft.py); match that so win_length < n_fft configs
    # broadcast correctly against the n_fft-long frames.
    if p.win_length > p.n_fft:
        raise ValueError(f"win_length {p.win_length} > n_fft {p.n_fft}")
    window = hann_window(p.win_length)
    if p.win_length < p.n_fft:
        lpad = (p.n_fft - p.win_length) // 2
        window = np.pad(window, (lpad, p.n_fft - p.win_length - lpad))
    return (
        mel_filterbank(p.sample_rate, p.n_fft, p.n_mels, p.fmin, p.fmax),
        window,
    )


def _frame(x: jnp.ndarray, frame_len: int, hop: int) -> jnp.ndarray:
    """(..., T) -> (..., n_frames, frame_len) via strided gather."""
    n_frames = 1 + (x.shape[-1] - frame_len) // hop
    idx = (
        np.arange(n_frames)[:, None] * hop + np.arange(frame_len)[None, :]
    )  # static index matrix
    return x[..., idx]


def stft_magnitude(
    audio: jnp.ndarray, p: MelParams, center: bool = False
) -> jnp.ndarray:
    """Magnitude spectrogram |STFT|, shape (..., n_bins, n_frames).

    Matches torch.stft with the reference's settings: pre-padding
    reflect((n_fft - hop)/2) on both sides, center=False, periodic Hann,
    magnitude = sqrt(re^2 + im^2 + 1e-9)  (stft.py:59-77).
    """
    _, window = _basis(p)
    pad = (p.n_fft - p.hop_length) // 2
    if center:
        pad = p.n_fft // 2
    audio = jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(pad, pad)], mode="reflect")
    frames = _frame(audio, p.n_fft, p.hop_length)
    frames = frames * jnp.asarray(window)
    spec = jnp.fft.rfft(frames, n=p.n_fft, axis=-1)
    mag = jnp.sqrt(jnp.real(spec) ** 2 + jnp.imag(spec) ** 2 + 1e-9)
    return jnp.swapaxes(mag, -1, -2)


def dynamic_range_compression(x: jnp.ndarray, C: float = 1.0, clip_val: float = 1e-5):
    return jnp.log(jnp.clip(x, min=clip_val) * C)


def dynamic_range_decompression(x: jnp.ndarray, C: float = 1.0):
    return jnp.exp(x) / C


def mel_spectrogram(
    audio: jnp.ndarray,
    p: MelParams,
    return_energy: bool = False,
):
    """Log-mel spectrogram of (..., T) audio in [-1, 1].

    Returns (..., n_mels, n_frames) [+ per-frame energy (L2 of magnitudes),
    reference stft.py:84].
    """
    mel_basis, _ = _basis(p)
    mag = stft_magnitude(audio, p)
    mel = jnp.einsum(
        "mf,...ft->...mt", jnp.asarray(mel_basis), mag,
        preferred_element_type=jnp.float32,
    )
    mel = dynamic_range_compression(mel, clip_val=p.clip_val)
    if return_energy:
        energy = jnp.linalg.norm(mag, axis=-2)
        return mel, energy
    return mel


def inverse_stft(
    magnitude: jnp.ndarray,
    phase: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
) -> jnp.ndarray:
    """Inverse STFT with Hann overlap-add and COLA window normalization.

    Equivalent to ``torch.istft(mag * exp(i*phase), ...)`` with
    center=True (reference: src/tools/stft.py:91-101, 138-148); used by the
    iSTFTNet vocoder head.  magnitude/phase: (..., n_bins, n_frames).
    """
    assert win_length <= n_fft, (win_length, n_fft)
    window = jnp.asarray(hann_window(win_length))
    if win_length < n_fft:
        # torch.istft center-pads a short window to n_fft (the forward
        # _basis does the same) — without this the n_fft-long irfft frames
        # and the OLA envelope would mix mismatched lengths
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    spec = magnitude * jnp.exp(1j * phase)
    frames = jnp.fft.irfft(jnp.swapaxes(spec, -1, -2), n=n_fft, axis=-1)
    frames = frames * window

    n_frames = frames.shape[-2]
    out_len = n_fft + hop_length * (n_frames - 1)

    # overlap-add via scatter-add over static indices
    idx = np.arange(n_frames)[:, None] * hop_length + np.arange(n_fft)[None, :]
    flat_idx = jnp.asarray(idx.reshape(-1))

    def _ola(fr):
        sig = jnp.zeros((out_len,), fr.dtype).at[flat_idx].add(fr.reshape(-1))
        return sig

    batch_shape = frames.shape[:-2]
    sig = jax.vmap(_ola)(frames.reshape((-1,) + frames.shape[-2:]))
    sig = sig.reshape(batch_shape + (out_len,))

    # window-envelope normalization (sum of squared windows)
    wsq = (window ** 2)[None, :].repeat(n_frames, axis=0)
    envelope = jnp.zeros((out_len,), window.dtype).at[flat_idx].add(wsq.reshape(-1))
    sig = sig / jnp.maximum(envelope, 1e-11)

    # center=True trimming: drop n_fft//2 from both ends
    half = n_fft // 2
    return sig[..., half : out_len - half]


def num_frames(num_samples: int, p: MelParams) -> int:
    """Frame count produced by mel_spectrogram for a T-sample input."""
    padded = num_samples + 2 * ((p.n_fft - p.hop_length) // 2)
    return 1 + (padded - p.n_fft) // p.hop_length
