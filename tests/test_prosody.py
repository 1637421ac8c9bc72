"""Prosody-control tests: p/e/d_control must actually act on the output
(VERDICT r4 item 2 — voices shipped before round 4 had near-inert
controls: raw-domain stats collapsed the bins, and the constant-pitch
synthetic corpus let the decoder ignore the pitch embedding entirely).

Pitch is measured in the MEL domain (filterbank pseudo-inverse ->
harmonic salience): the tiny vocoder's pitch rendering is a separate
concern covered by its own test, and mel is what the acoustic model —
the component p_control conditions — actually emits.

Reference semantics (unsupervised_fastspeech2/layers.py:136-162):
p_control scales the NORMALIZED pitch prediction, so the direction of
the f0 shift follows the sign of the speaker's mean normalized pitch
(below-average voices move down, above-average voices move up); the
contract is a consistent, monotone, material shift.
"""

import json
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUNDLE = os.path.join(REPO, "assets", "bundles", "vie_tiny")


def _new_style_bundle() -> bool:
    stats = os.path.join(BUNDLE, "stats.json")
    if not os.path.exists(stats):
        return False
    with open(stats) as f:
        pitch = json.load(f)["pitch"]
    # fixed (normalized-domain) stats straddle zero; the broken raw-domain
    # stats of pre-round-4 bundles are strictly positive Hz
    return pitch["min"] < 0 < pitch["max"]


pytestmark = pytest.mark.skipif(
    not _new_style_bundle(),
    reason="bundle predates the fixed prosody bins (raw-domain stats)",
)


@pytest.fixture(scope="module")
def engine():
    from e2e_tts_tpu.serve import SynthesisEngine

    return SynthesisEngine.from_checkpoint(BUNDLE, batch_size=2)


@pytest.fixture(scope="module")
def mel_f0():
    """Mel-domain f0 estimator: pinv(filterbank) -> harmonic salience.
    Validated on ground-truth synthetic mels (monotone, ~8% bias)."""
    from e2e_tts_tpu.audio.filters import mel_filterbank

    M = mel_filterbank(22050, 1024, 80)
    Minv = np.linalg.pinv(M)
    freqs = np.arange(513) * 22050 / 1024

    def estimate(mel: np.ndarray, lo: float = 90.0, hi: float = 380.0) -> float:
        spec = np.maximum(Minv @ np.exp(mel).T, 1e-10).mean(1)
        cands = np.arange(lo, hi, 1.0)
        sal = [
            np.mean(
                np.log(
                    np.asarray(
                        [np.interp(h * f0, freqs, spec) for h in range(1, 9)]
                    )
                    + 1e-12
                )
            )
            for f0 in cands
        ]
        return float(cands[int(np.argmax(sal))])

    return estimate


def _out_mel(engine, spk: str, pc=1.0, ec=1.0, dc=1.0) -> np.ndarray:
    from e2e_tts_tpu.text import text_to_sequence

    seq = np.asarray(
        text_to_sequence("hôm nay trời đẹp quá bạn ơi"), np.int32
    )[None]
    lens = np.asarray([seq.shape[1]], np.int32)
    spkid = np.asarray([engine.speakers[spk]], np.int32)
    x, durs = engine.acoustic.apply(
        engine.acoustic_params, spkid, seq, lens,
        p_control=pc, e_control=ec, d_control=dc,
        method=engine.acoustic.synthesize_stage1,
    )
    T = int(np.asarray(durs).sum())
    mel, mel_lens = engine.acoustic.apply(
        engine.acoustic_params, x, durs, max_mel_len=T + 8,
        method=engine.acoustic.synthesize_stage2,
    )
    return np.asarray(mel)[0, : int(np.asarray(mel_lens)[0])]


def test_pitch_control_shifts_f0_monotonically(engine, mel_f0):
    """Every speaker must shift monotonically and materially (>5 Hz over a
    4x control range), and at least one speaker strongly (>15 Hz).  The
    per-speaker magnitude is NOT uniform by construction: the control
    scales the predicted normalized pitch, so the lever equals what the
    predictor emits for that speaker — MSE training regresses the
    less-marked speaker toward the corpus mean at tiny scale (measured:
    nam ~40 Hz vs nu ~9 Hz on the 48-sentence voice)."""
    spans = {}
    for spk in sorted(engine.speakers):
        f = [mel_f0(_out_mel(engine, spk, pc=pc)) for pc in (0.5, 1.0, 2.0)]
        increasing = f[0] < f[1] < f[2]
        decreasing = f[0] > f[1] > f[2]
        assert increasing or decreasing, (spk, f)
        spans[spk] = abs(f[2] - f[0])
        assert spans[spk] > 5.0, (spk, f)
    assert max(spans.values()) > 15.0, spans


def test_duration_control_scales_length(engine):
    for spk in sorted(engine.speakers):
        n1 = _out_mel(engine, spk, dc=1.0).shape[0]
        n2 = _out_mel(engine, spk, dc=2.0).shape[0]
        nh = _out_mel(engine, spk, dc=0.5).shape[0]
        assert 1.8 * n1 < n2 < 2.2 * n1, (spk, n1, n2)
        assert 0.4 * n1 < nh < 0.6 * n1, (spk, n1, nh)


def test_energy_control_is_consulted(engine):
    """The energy embedding path must be live (its audible direction on
    the tiny synthetic voice is weak, so this asserts effect, not sign)."""
    for spk in sorted(engine.speakers):
        lo = _out_mel(engine, spk, ec=0.5)
        hi = _out_mel(engine, spk, ec=2.0)
        n = min(lo.shape[0], hi.shape[0])
        assert np.abs(lo[:n] - hi[:n]).mean() > 1e-3, spk
