"""Trained-quality regression: a checked-in tiny bundle must reproduce its
golden mel snapshots and DSP health stats.

The bundles under assets/bundles/ are trained by tools/make_tiny_bundle.py on
the deterministic formant-synthetic corpus (e2e_tts_tpu/data/synthetic.py);
golden snapshots live in tests/assets/golden_<name>/.  This proves the full
train -> export -> serve loop yields voiced, text-dependent, reproducible
audio (the reference's deployed-model role, reference src/api/utils.py:23-62)
— evidence the framework trains, not just compiles.

Skipped when no bundle is checked in (e.g. a fresh clone before training).
"""

import glob
import json
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN_ROOT = os.path.join(REPO, "tests", "assets")


def _bundles():
    out = []
    for stats in sorted(glob.glob(os.path.join(GOLDEN_ROOT, "golden_*", "stats.json"))):
        name = os.path.basename(os.path.dirname(stats))[len("golden_"):]
        bundle = os.path.join(REPO, "assets", "bundles", name)
        if os.path.isdir(bundle):
            out.append((name, bundle, os.path.dirname(stats)))
    return out

BUNDLES = _bundles()


@pytest.mark.skipif(not BUNDLES, reason="no trained tiny bundle checked in")
@pytest.mark.parametrize("name,bundle,golden", BUNDLES, ids=[b[0] for b in BUNDLES])
def test_tiny_bundle_reproduces_golden(name, bundle, golden):
    from e2e_tts_tpu.audio.mel import MelParams, mel_spectrogram
    from e2e_tts_tpu.serve import SynthesisEngine

    eng = SynthesisEngine.from_checkpoint(bundle)
    with open(os.path.join(golden, "stats.json")) as f:
        meta = json.load(f)
    texts, golden_stats = meta["texts"], meta["stats"]

    p = MelParams.from_config(eng.config.audio)
    for i, text in enumerate(texts):
        for spk in sorted(eng.speakers):
            key = f"{i}_{spk}"
            if key not in golden_stats:
                continue
            audio = eng.synthesize(text, speaker_id=spk, silence_distance=0.0)
            f32 = audio.astype(np.float32) / 32768.0
            ref = golden_stats[key]

            # length within 2% of golden (duration predictor regression)
            assert abs(len(f32) - ref["n_samples"]) <= max(
                0.02 * ref["n_samples"], 2 * eng.hop_length
            ), (key, len(f32), ref["n_samples"])

            # voiced: strong periodicity in the speech band, energy present
            assert ref["periodicity"] > 0.3, "golden itself unvoiced?"
            rms = float(np.sqrt((f32 ** 2).mean()))
            assert 0.25 * ref["rms"] < rms < 4.0 * ref["rms"], (key, rms)

            # mel snapshot: same trained weights + deterministic serving
            # must reproduce the mel closely (fp16 storage + bf16-ish noise)
            mel = np.asarray(mel_spectrogram(f32[None], p)[0], np.float32)
            gold = np.load(
                os.path.join(golden, f"mel_{i}_{spk}.npy")
            ).astype(np.float32)
            T = min(mel.shape[1], gold.shape[1])
            assert abs(mel.shape[1] - gold.shape[1]) <= 4, key
            mae = float(np.abs(mel[:, :T] - gold[:, :T]).mean())
            assert mae < 0.15, (key, mae)


@pytest.mark.skipif(not BUNDLES, reason="no trained tiny bundle checked in")
def test_tiny_bundle_output_is_text_dependent():
    """Different texts -> substantially different audio (not a collapsed
    model that emits one sound for everything)."""
    from e2e_tts_tpu.serve import SynthesisEngine

    name, bundle, golden = BUNDLES[0]
    eng = SynthesisEngine.from_checkpoint(bundle)
    with open(os.path.join(golden, "stats.json")) as f:
        texts = json.load(f)["texts"]
    spk = sorted(eng.speakers)[0]
    a = eng.synthesize(texts[0], speaker_id=spk, silence_distance=0.0)
    b = eng.synthesize(texts[1], speaker_id=spk, silence_distance=0.0)
    assert abs(len(a) - len(b)) > eng.hop_length or (
        np.abs(
            a[: min(len(a), len(b))].astype(np.float32)
            - b[: min(len(a), len(b))].astype(np.float32)
        ).mean()
        > 100.0
    )
