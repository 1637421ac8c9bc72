"""Voice conversion interface.

The reference wires FreeVC through Coqui-TTS (reference: synthesizer.py:26-28,
58-65) — an external torch checkpoint.  This module defines the same
``convert(src, target, out)`` interface with two backends:

- ``KnnVoiceConverter`` (preferred when a trained vocoder is available):
  kNN-VC-style any-to-any conversion — every source mel frame is replaced by
  a similarity-weighted average of its k nearest frames from the target
  utterance, matched on per-utterance-normalized, context-stacked log-mels
  (a content-driven metric; raw target frames carry the speaker timbre), and
  the converted mel is rendered by the engine's trained HiFi-GAN.  The
  matching is one (Ts, D) @ (D, Tt) matmul + top-k on the MXU.
- ``SpectralVoiceConverter`` (always available): spectral-envelope transfer —
  morphs the source's smoothed log-spectrum toward the target speaker's
  average envelope and resynthesizes with Griffin-Lim phase from the source.
  A classical DSP baseline, not FreeVC quality, but fully self-contained.
- any object with the same ``convert`` signature (e.g. a future JAX FreeVC)
  can be swapped in at the router.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
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
        if sr_t != sr:
            # resample the reference to the source rate so both STFTs put
            # the same Hz in the same bin — otherwise the envelope transfer
            # compares unrelated frequencies
            n_out = int(round(len(tgt) * sr / sr_t))
            tgt = np.interp(
                np.arange(n_out) * (len(tgt) - 1) / max(n_out - 1, 1),
                np.arange(len(tgt)),
                tgt,
            ).astype(tgt.dtype)

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


def _bucket_up(n: int, step: int = 256) -> int:
    return max(step, ((n + step - 1) // step) * step)


@partial(jax.jit, static_argnames=("k", "temperature"))
def _knn_match(src_feat, tgt_feat, tgt_mel, tgt_mask, k: int = 4,
               temperature: float = 10.0):
    """Each source frame -> softmax-weighted mean of its k nearest target
    mel frames (cosine similarity on normalized features).  One MXU matmul
    (Ts, D) @ (D, Tt), lax.top_k over the target axis, one gather."""

    def norm(x):
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-6)

    sim = norm(src_feat) @ norm(tgt_feat).T          # (Ts, Tt)
    sim = jnp.where(tgt_mask[None, :], sim, -1e9)
    vals, idx = jax.lax.top_k(sim, k)                 # (Ts, k)
    w = jax.nn.softmax(vals * temperature, axis=-1)
    return (tgt_mel[idx] * w[..., None]).sum(axis=1)  # (Ts, n_mels)


class KnnVoiceConverter:
    """kNN-VC over mel features + trained HiFi-GAN rendering.

    Follows the kNN-VC recipe (Baas et al. 2023, "Voice Conversion With
    Just Nearest Neighbors") with the engine's own features in place of
    WavLM: matching runs on per-utterance mean/variance-normalized log-mels
    stacked with +-``context`` neighbor frames, which removes global speaker
    timbre from the metric so matches are content-driven, while the output
    frames are the *raw* target mels, which carry the target's timbre.
    Replaces the reference's external FreeVC checkpoint
    (reference synthesizer.py:26-28,58-65) with a self-contained path.
    """

    def __init__(
        self,
        engine=None,
        k: int = 4,
        context: int = 2,
        temperature: float = 10.0,
        fallback: Optional[object] = None,
        feature_mode: str = "auto",
        prosody_weight: float = 0.0,
    ):
        """``engine``: a SynthesisEngine whose trained vocoder renders the
        converted mel; without one, conversion falls back to ``fallback``
        (default SpectralVoiceConverter).

        ``feature_mode``: the matching space —
        - "ppg": phoneme posteriorgrams from the engine's trained aligner
          (engine.mel_content_features) — content-by-construction, the
          closest in-framework analogue of kNN-VC's WavLM features;
        - "cmvn": per-utterance-normalized context-stacked log-mels —
          no model needed, but formant structure (speaker-dependent)
          remains in the metric;
        - "auto": "ppg" when the engine has the unsupervised aligner,
          else "cmvn".

        ``prosody_weight``: > 0 turns on prosody transfer — each frame's
        per-utterance-normalized log-f0 (plus a voicing flag) joins the
        matching features, so matched target frames track the SOURCE's
        intonation contour (rendered in the target's own range, since the
        normalization removes register).  Plain kNN-VC discards source
        prosody entirely: the output contour is whatever the matched
        target frames happen to carry.  Weight 1.0 makes the prosody
        block count about as much as the content block in the cosine
        metric (the block is pre-scaled to the content features' frame
        norm); 0 preserves exact pre-prosody behavior.
        """
        self.engine = engine
        self.k = k
        self.context = context
        self.temperature = temperature
        self.prosody_weight = prosody_weight
        self.fallback = fallback or SpectralVoiceConverter()
        if feature_mode == "auto":
            feature_mode = "ppg" if self._engine_has_aligner() else "cmvn"
        if feature_mode == "ppg" and not self._engine_has_aligner():
            raise ValueError("feature_mode='ppg' needs an engine with the aligner")
        self.feature_mode = feature_mode

    def _engine_has_aligner(self) -> bool:
        if self.engine is None:
            return False
        fs2 = self.engine.config.models.fastspeech2
        return bool(fs2.variance.duration_modelling.learn_alignment)

    # --- features ----------------------------------------------------------

    def _mel(self, audio: np.ndarray, sr: int) -> np.ndarray:
        from ..audio.mel import MelParams, mel_spectrogram, num_frames

        p = MelParams.from_config(self.engine.config.audio)
        assert sr == self.engine.sample_rate, (sr, self.engine.sample_rate)
        # pad to a sample bucket: bounds XLA program count across utterances

        bucket = 16 * p.hop_length * 4
        n_pad = -len(audio) % bucket
        padded = np.pad(audio, (0, n_pad)) if n_pad else audio
        T = num_frames(len(audio), p)
        mel = np.asarray(mel_spectrogram(padded[None], p)[0], np.float32)
        return mel.T[:T]  # (T, n_mels)

    def _stack_context(self, z: np.ndarray) -> np.ndarray:
        """Stack +-context neighbor frames: (T, D) -> (T, (2c+1) * D)."""
        c = self.context
        padded = np.pad(z, ((c, c), (0, 0)), mode="edge")
        return np.concatenate(
            [padded[i : i + len(z)] for i in range(2 * c + 1)], axis=1
        )

    def _features(
        self,
        mel: np.ndarray,
        prosody: Optional[np.ndarray] = None,
        prosody_norm: Optional[float] = None,
    ) -> np.ndarray:
        """Matching features for one utterance's mel (T, n_mels).

        ``prosody``: optional (T, 2) [normalized log-f0, voicing] track
        (``prosody_track``); appended per frame — before context stacking,
        so the metric sees the contour SHAPE over +-context frames —
        scaled so ``prosody_weight`` is feature-mode independent (ppg
        frames are unit-norm on the Bhattacharyya sphere, cmvn frames
        have ~sqrt(D) norm from D unit-variance dims).

        ``prosody_norm``: the RMS frame norm the prosody block is divided
        by.  ``convert_mel`` passes the norm measured over BOTH tracks so
        the effective weight is utterance-independent (a mostly-unvoiced
        track would otherwise dilute the block — unvoiced frames are
        [0, 0]) while src and tgt still share one metric.  Defaults to
        sqrt(2), the fully-voiced ideal."""
        if self.feature_mode == "ppg":
            # sqrt maps the probability simplex onto the unit sphere, so the
            # kernel's cosine similarity becomes the Bhattacharyya affinity
            ppg = self.engine.mel_content_features(mel)
            base, frame_norm = np.sqrt(np.maximum(ppg, 0.0)), 1.0
        else:
            mu, sd = mel.mean(axis=0), mel.std(axis=0) + 1e-5
            base = (mel - mu) / sd
            frame_norm = float(np.sqrt(mel.shape[1]))
        if prosody is not None and self.prosody_weight > 0.0:
            norm = prosody_norm if prosody_norm else float(np.sqrt(2.0))
            scale = self.prosody_weight * frame_norm / norm
            base = np.concatenate(
                [base, scale * prosody.astype(base.dtype)], axis=1
            )
        return self._stack_context(base)

    @staticmethod
    def _prosody_rms_norm(*tracks: np.ndarray) -> float:
        """RMS per-frame norm over all frames of all given (T, 2) tracks;
        sqrt(2) (the fully-voiced ideal) when every frame is silent."""
        sq = np.concatenate(
            [np.sum(np.square(t.astype(np.float64)), axis=1) for t in tracks]
        )
        rms = float(np.sqrt(sq.mean())) if sq.size else 0.0
        return rms if rms > 1e-6 else float(np.sqrt(2.0))

    def prosody_track(
        self, audio: np.ndarray, mel_len: int, sample_rate: int,
        hop_length: int,
    ) -> np.ndarray:
        """(T, 2) [per-utterance z-normalized log-f0, voicing flag] aligned
        to mel frames, library-free AC tracker (audio/features.py).  The
        z-normalization over voiced frames keeps the contour SHAPE and
        drops the speaker's register, so matching on it imposes source
        intonation without dragging source pitch range into the output."""
        from ..audio.features import extract_f0

        f0 = extract_f0(
            np.asarray(audio, np.float32), mel_len, sample_rate,
            hop_length, backend="ac",
        )
        voiced = f0 > 0
        z = np.zeros(mel_len, np.float32)
        if int(voiced.sum()) >= 2:
            lf = np.log(f0[voiced])
            z[voiced] = (lf - lf.mean()) / (lf.std() + 1e-5)
        return np.stack([z, voiced.astype(np.float32)], axis=1)

    # --- conversion --------------------------------------------------------

    def convert_mel(
        self,
        src_mel: np.ndarray,
        tgt_mel: np.ndarray,
        src_prosody: Optional[np.ndarray] = None,
        tgt_prosody: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """(Ts, n_mels), (Tt, n_mels) -> converted (Ts, n_mels).

        ``src_prosody``/``tgt_prosody``: optional (T, 2) ``prosody_track``
        outputs; consulted only when ``prosody_weight`` > 0 (both sides
        must be given — matching a prosody-augmented source against a
        bare target would compare unrelated dimensions)."""
        import jax.numpy as jnp

        if (src_prosody is None) != (tgt_prosody is None):
            raise ValueError(
                "src_prosody and tgt_prosody must be given together"
            )
        if src_prosody is not None and self.prosody_weight <= 0.0:
            raise ValueError(
                "prosody tracks were supplied but prosody_weight is 0 — "
                "construct KnnVoiceConverter(prosody_weight=...) > 0 to "
                "enable prosody transfer"
            )
        if self.prosody_weight > 0.0 and src_prosody is None:
            import warnings

            warnings.warn(
                "prosody_weight > 0 but convert_mel received no prosody "
                "tracks; running plain content matching (pass "
                "prosody_track outputs, or call convert() which extracts "
                "them)",
                stacklevel=2,
            )
        pn = (
            self._prosody_rms_norm(src_prosody, tgt_prosody)
            if src_prosody is not None
            else None
        )
        src_feat = self._features(src_mel, src_prosody, prosody_norm=pn)
        tgt_feat = self._features(tgt_mel, tgt_prosody, prosody_norm=pn)
        Ts, Tt = len(src_feat), len(tgt_feat)
        Tsb, Ttb = _bucket_up(Ts), _bucket_up(Tt)
        sf = np.zeros((Tsb, src_feat.shape[1]), np.float32)
        sf[:Ts] = src_feat
        tf = np.zeros((Ttb, tgt_feat.shape[1]), np.float32)
        tf[:Tt] = tgt_feat
        tm = np.zeros((Ttb, tgt_mel.shape[1]), np.float32)
        tm[:Tt] = tgt_mel
        mask = np.arange(Ttb) < Tt
        out = _knn_match(
            jnp.asarray(sf), jnp.asarray(tf), jnp.asarray(tm),
            jnp.asarray(mask), k=min(self.k, Tt),
            temperature=self.temperature,
        )
        return np.asarray(out, np.float32)[:Ts]

    def convert(self, source_path: str, target_path: str, out_path: str) -> str:
        if self.engine is None:
            return self.fallback.convert(source_path, target_path, out_path)
        src, sr_s = read_wav(source_path)
        tgt, sr_t = read_wav(target_path)
        if sr_s != self.engine.sample_rate or sr_t != self.engine.sample_rate:
            return self.fallback.convert(source_path, target_path, out_path)
        src_mel, tgt_mel = self._mel(src, sr_s), self._mel(tgt, sr_t)
        sp = tp = None
        if self.prosody_weight > 0.0:
            hop = self.engine.hop_length
            sp = self.prosody_track(src, len(src_mel), sr_s, hop)
            tp = self.prosody_track(tgt, len(tgt_mel), sr_t, hop)
        converted = self.convert_mel(src_mel, tgt_mel, sp, tp)
        audio = self.engine.vocode_mel(converted)
        peak = np.abs(audio).max()
        if peak > 1.0:
            audio = audio / peak
        write_wav(out_path, audio, self.engine.sample_rate)
        return out_path
