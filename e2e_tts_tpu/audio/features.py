"""Host-side acoustic feature extraction (preprocessing time, CPU).

The reference wraps two native libraries for pitch: Praat/parselmouth
``to_pitch_ac`` for the f0 stream (src/tools/utils.py:46-78) and pyworld
dio+stonemask for the interpolated pitch stream (utils.py:93-117).  This
module ships a self-contained YIN estimator (de Cheveigné & Kawahara 2002)
with the same interface contracts, PLUS optional parity wrappers that
reproduce the reference's exact extraction (padding quirks included) and
are used automatically whenever parselmouth / pyworld are importable:

- ``extract_f0``      f0 per mel frame, 0 where unvoiced, padded/truncated
                      to exactly ``mel_len`` frames.
- ``extract_pitch``   f0 per frame with linear interpolation over unvoiced
                      regions (matching the pyworld path's post-processing).

CHECKPOINT-MIGRATION CAVEAT: YIN is a numeric substitute, not an equivalent
— Praat's autocorrelation method differs in voicing decisions and octave
handling (tests/test_audio.py quantifies YIN at <1% median error on
synthetic harmonics, but real-speech tracks diverge frame-by-frame).  A
reference checkpoint trained on Praat f0 statistics will be mis-conditioned
if served with YIN-derived stats: re-extract features (and stats.json) with
the SAME backend the checkpoint was trained on — install parselmouth/
pyworld to get the reference backends, or retrain on YIN features.

These run once per utterance at dataset-preparation time; NumPy on host is
the right tool (SURVEY.md §7 step 2).
"""

from __future__ import annotations

import numpy as np
from scipy.stats import betabinom

# f0 quantization constants (reference: src/tools/utils.py:15-19)
F0_BIN = 256
F0_MIN = 50.0
F0_MAX = 1100.0
F0_MEL_MIN = 1127 * np.log(1 + F0_MIN / 700)
F0_MEL_MAX = 1127 * np.log(1 + F0_MAX / 700)


def yin_f0(
    audio: np.ndarray,
    sample_rate: int,
    hop_length: int,
    fmin: float = 80.0,
    fmax: float = 750.0,
    frame_length: int = 2048,
    threshold: float = 0.2,
    use_native: bool = True,
) -> np.ndarray:
    """YIN fundamental-frequency track. Returns f0 per hop frame, 0=unvoiced.

    Uses the C++ implementation (native/yin.cc) when built; this NumPy body
    is the reference/fallback path.
    """
    if use_native:
        try:
            from ..native import native_yin_f0

            out = native_yin_f0(
                audio, sample_rate, hop_length, fmin, fmax, frame_length, threshold
            )
            if out is not None:
                return out
        except Exception:
            pass
    audio = np.asarray(audio, dtype=np.float64)
    tau_min = max(2, int(sample_rate / fmax))
    tau_max = min(frame_length // 2, int(sample_rate / fmin) + 1)

    pad = frame_length // 2
    x = np.pad(audio, (pad, pad), mode="constant")
    n_frames = 1 + (len(x) - frame_length) // hop_length
    if n_frames <= 0:
        return np.zeros(0)

    idx = np.arange(n_frames)[:, None] * hop_length + np.arange(frame_length)[None, :]
    frames = x[idx]  # (n_frames, frame_length)

    # difference function via FFT autocorrelation:
    # d(tau) = sum_{j} (x_j - x_{j+tau})^2 over the first W/2 samples
    w = frame_length // 2
    a = frames[:, :w]
    # cumulative energy terms
    sq = frames**2
    cums = np.cumsum(sq, axis=1)
    e_a = cums[:, w - 1][:, None]  # energy of x[0:w]
    # energy of x[tau : tau+w] for each tau
    tail = np.concatenate([np.zeros((n_frames, 1)), cums], axis=1)
    e_tau = tail[:, w : w + tau_max] - tail[:, 0:tau_max]

    # cross term via FFT correlation of full frame with its first half
    nfft = 1 << int(np.ceil(np.log2(2 * frame_length)))
    fa = np.fft.rfft(frames, nfft, axis=1)
    fb = np.fft.rfft(a[:, ::-1], nfft, axis=1)
    corr = np.fft.irfft(fa * fb, nfft, axis=1)[:, w - 1 : w - 1 + tau_max]

    d = e_a + e_tau - 2 * corr  # (n_frames, tau_max)
    d = np.maximum(d, 0.0)

    # cumulative-mean-normalized difference
    taus = np.arange(1, tau_max)
    cmnd = np.ones_like(d)
    denom = np.cumsum(d[:, 1:], axis=1)
    cmnd[:, 1:] = d[:, 1:] * taus[None, :] / np.maximum(denom, 1e-12)

    f0 = np.zeros(n_frames)
    region = cmnd[:, tau_min:tau_max]
    below = region < threshold
    any_below = below.any(axis=1)
    first = np.where(any_below, below.argmax(axis=1), 0) + tau_min

    for i in range(n_frames):
        if not any_below[i]:
            continue
        tau = first[i]
        # descend to the local minimum following the first threshold crossing
        while tau + 1 < tau_max and cmnd[i, tau + 1] < cmnd[i, tau]:
            tau += 1
        # parabolic interpolation around the minimum
        if 1 <= tau < tau_max - 1:
            s0, s1, s2 = cmnd[i, tau - 1], cmnd[i, tau], cmnd[i, tau + 1]
            denom_p = 2 * (2 * s1 - s2 - s0)
            shift = (s2 - s0) / denom_p if abs(denom_p) > 1e-12 else 0.0
            tau_refined = tau + np.clip(shift, -1, 1)
        else:
            tau_refined = float(tau)
        f0[i] = sample_rate / tau_refined

    f0[(f0 < fmin) | (f0 > fmax)] = 0.0
    return f0


def _praat_f0(
    wav_data: np.ndarray, mel_len: int, sample_rate: int, hop_length: int
):
    """Reference-exact Praat f0 (utils.py:46-78), incl. the lpad/rpad
    alignment fix-up.  Returns None when parselmouth is not installed."""
    try:
        import parselmouth
    except ImportError:
        return None
    assert hop_length in (128, 256)
    pad_size = 4 if hop_length == 128 else 2
    f0 = (
        parselmouth.Sound(np.asarray(wav_data, np.float64), sample_rate)
        .to_pitch_ac(
            time_step=hop_length / sample_rate,
            voicing_threshold=0.5,
            pitch_floor=80,
            pitch_ceiling=750,
        )
        .selected_array["frequency"]
    )
    f0 = f0[: mel_len - 8]  # avoid negative rpad (reference comment)
    lpad = pad_size - 2
    rpad = mel_len - len(f0) - lpad
    f0 = np.pad(f0, [[lpad, rpad]], mode="constant")
    delta = mel_len - len(f0)
    if delta > 0:
        f0 = np.concatenate([f0, [f0[-1]] * delta], 0)
    return f0[:mel_len]


def _pyworld_pitch(
    wav_data: np.ndarray, sample_rate: int, hop_length: int
):
    """Reference-exact pyworld dio+stonemask pitch (utils.py:93-117).
    Returns None when pyworld is not installed."""
    try:
        import pyworld as pw
    except ImportError:
        return None
    x = np.asarray(wav_data, np.float64)
    pitch, t = pw.dio(x, sample_rate, frame_period=hop_length / sample_rate * 1000)
    return pw.stonemask(x, pitch, t, sample_rate)


def extract_f0(
    wav_data: np.ndarray,
    mel_len: int,
    sample_rate: int,
    hop_length: int,
    with_pitch: bool = False,
    backend: str = "auto",
):
    """f0 stream aligned to mel frames (reference contract utils.py:46-78):
    zero where unvoiced, length exactly ``mel_len``.

    backend: "auto" uses Praat when parselmouth is importable (numeric
    parity with reference-trained checkpoints) and falls back to YIN;
    "praat" requires parselmouth; "yin" forces the built-in estimator.
    """
    f0 = None
    if backend in ("auto", "praat"):
        f0 = _praat_f0(wav_data, mel_len, sample_rate, hop_length)
        if f0 is None and backend == "praat":
            raise ImportError("backend='praat' requires parselmouth")
    if f0 is None:
        f0 = yin_f0(wav_data, sample_rate, hop_length, fmin=80.0, fmax=750.0)
        if len(f0) >= mel_len:
            f0 = f0[:mel_len]
        else:
            f0 = np.pad(
                f0, (0, mel_len - len(f0)), mode="edge" if len(f0) else "constant"
            )
    if with_pitch:
        return f0, f0_to_coarse(f0)
    return f0


def extract_pitch(
    wav_data: np.ndarray, sample_rate: int, hop_length: int,
    backend: str = "auto",
) -> np.ndarray:
    """Pitch stream with linear interpolation over unvoiced gaps
    (reference contract utils.py:93-117).

    backend: "auto" uses pyworld dio+stonemask when importable, else YIN;
    "pyworld" requires pyworld; "yin" forces the built-in estimator.
    """
    pitch = None
    if backend in ("auto", "pyworld"):
        pitch = _pyworld_pitch(wav_data, sample_rate, hop_length)
        if pitch is None and backend == "pyworld":
            raise ImportError("backend='pyworld' requires pyworld")
    if pitch is None:
        pitch = yin_f0(wav_data, sample_rate, hop_length, fmin=71.0, fmax=800.0)
    nonzero = np.nonzero(pitch)[0]
    if len(nonzero) == 0:
        return pitch
    interp = np.interp(
        np.arange(len(pitch)), nonzero, pitch[nonzero]
    )
    return interp


def f0_to_coarse(f0: np.ndarray) -> np.ndarray:
    """Quantize f0 (Hz) to 256 mel-spaced bins (reference utils.py:81-90)."""
    f0_mel = 1127 * np.log(1 + np.asarray(f0, dtype=np.float64) / 700)
    pos = f0_mel > 0
    f0_mel[pos] = (f0_mel[pos] - F0_MEL_MIN) * (F0_BIN - 2) / (
        F0_MEL_MAX - F0_MEL_MIN
    ) + 1
    f0_mel[f0_mel <= 1] = 1
    f0_mel[f0_mel > F0_BIN - 1] = F0_BIN - 1
    coarse = np.rint(f0_mel).astype(np.int64)
    assert coarse.max() <= 255 and coarse.min() >= 1, (coarse.max(), coarse.min())
    return coarse


def beta_binomial_prior(
    phoneme_count: int, mel_count: int, scaling_factor: float = 1.0
) -> np.ndarray:
    """Beta-binomial alignment prior, shape (mel_count, phoneme_count)
    (reference utils.py:129-139; "One TTS Alignment To Rule Them All")."""
    P, M = phoneme_count, mel_count
    x = np.arange(P)
    rows = []
    for i in range(1, M + 1):
        rv = betabinom(P, scaling_factor * i, scaling_factor * (M + 1 - i))
        rows.append(rv.pmf(x))
    return np.asarray(rows)


def remove_outliers(values: np.ndarray) -> np.ndarray:
    """IQR outlier filter used for corpus statistics (reference utils.py:142-150)."""
    p25, p75 = np.percentile(values, 25), np.percentile(values, 75)
    lower = p25 - 1.5 * (p75 - p25)
    upper = p75 + 1.5 * (p75 - p25)
    return values[np.logical_and(values > lower, values < upper)]
