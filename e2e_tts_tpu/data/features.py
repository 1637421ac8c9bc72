"""Per-utterance feature cache construction (preprocessing, host-side).

Reference: src/tools/tools_for_data.py:80-213 writes sibling .npy caches
(``mels/ f0/ pitch/ energy/``) next to each corpus's ``wavs/``; this module
keeps the same on-disk layout so prepared corpora are interchangeable, but
computes mels with the JAX pipeline (batched on the accelerator when
available) and f0 with the native YIN extractor.
"""

from __future__ import annotations

import os
from contextlib import nullcontext
from typing import Dict

import numpy as np

from ..audio import (
    MelParams,
    extract_f0,
    extract_pitch,
    mel_spectrogram,
    read_wav,
)
from ..config import Config

FEATURE_DIRS = ("mels", "f0", "pitch", "energy")


def utterance_paths(wav_path: str) -> Dict[str, str]:
    base = os.path.splitext(os.path.basename(wav_path))[0]
    root = os.path.dirname(os.path.dirname(wav_path))
    return {d: os.path.join(root, d, f"{base}.npy") for d in FEATURE_DIRS}


def create_utterance_features(
    wav_path: str,
    config: Config,
    overwrite: bool = False,
) -> Dict[str, np.ndarray]:
    """Compute + cache mel/f0/pitch/energy for one utterance."""
    paths = utterance_paths(wav_path)
    if not overwrite and all(os.path.exists(p) for p in paths.values()):
        return {k: np.load(p) for k, p in paths.items()}

    audio, sr = read_wav(wav_path)
    assert sr == config.audio.signal.sampling_rate, (wav_path, sr)
    p = MelParams.from_config(config.audio)

    # Pad to a sample bucket and compute on the host CPU backend: utterance
    # lengths are all distinct, so unbucketed extraction would trigger one
    # XLA compile per file (minutes each through a remote-TPU tunnel).
    # Bucketing bounds the program cache; frames beyond the true length are
    # trimmed (only the last 1-2 boundary frames see zero-padding instead of
    # reflection — preprocessing noise well below feature variance).
    from ..audio.mel import num_frames

    bucket = 4 * p.hop_length * 16  # 16384 samples at hop 256
    n_pad = -len(audio) % bucket
    padded = np.pad(audio, (0, n_pad)) if n_pad else audio
    mel_len = num_frames(len(audio), p)

    import jax

    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = None
    ctx = jax.default_device(cpu) if cpu is not None else nullcontext()
    with ctx:
        mel, energy = mel_spectrogram(padded[None], p, return_energy=True)
        mel = np.asarray(mel[0], np.float32)[:, :mel_len]   # (n_mels, T)
        energy = np.asarray(energy[0], np.float32)[:mel_len]

    f0 = extract_f0(audio, mel_len, sr, p.hop_length).astype(np.float32)
    pitch = extract_pitch(audio, sr, p.hop_length)[:mel_len].astype(np.float32)
    if len(pitch) < mel_len:
        pitch = np.pad(pitch, (0, mel_len - len(pitch)), mode="edge")

    out = {"mels": mel, "f0": f0, "pitch": pitch, "energy": energy}
    for key, path in paths.items():
        os.makedirs(os.path.dirname(path), exist_ok=True)
        np.save(path, out[key])
    return out


def load_utterance_features(wav_path: str) -> Dict[str, np.ndarray]:
    return {k: np.load(p) for k, p in utterance_paths(wav_path).items()}


def compute_stats(
    filelist_entries,
    use_cached: bool = True,
) -> Dict[str, Dict[str, float]]:
    """Corpus statistics over pitch/f0/energy with IQR outlier removal
    (reference: src/tools/dataloader.py:106-151)."""
    from ..audio.features import remove_outliers

    pitches, f0s, energies = [], [], []
    for wav, *_ in filelist_entries:
        feats = load_utterance_features(wav)
        pitches.append(feats["pitch"])
        f0s.append(feats["f0"][feats["f0"] > 0])
        energies.append(feats["energy"])
    pitch = remove_outliers(np.concatenate(pitches))
    energy = remove_outliers(np.concatenate(energies))
    f0 = np.concatenate(f0s) if f0s else np.zeros(1)

    def d(x):
        # min/max are stored in the NORMALIZED domain ((x - mean) / std),
        # matching the reference's stats (its default_stats show pitch
        # mean 185 / std 62.5 with min -2.05 / max 10.33, dataloader.py:
        # 26-43): the dataset normalizes targets by mean/std before they
        # reach the variance adaptor, so the quantization bin edges built
        # from min/max (nn/variance.py _pitch_bins/_energy_bins) must live
        # in that same domain — raw-domain edges collapse the embedding to
        # a handful of bins.
        mean = float(x.mean())
        std = float(x.std() + 1e-8)
        z = (x - mean) / std
        return {
            "min": float(z.min()),
            "max": float(z.max()),
            "mean": mean,
            "std": std,
        }

    return {"pitch": d(pitch), "energy": d(energy), "f0": d(f0)}
