"""Learned MOS-proxy tests: degradation calibration, model plumbing, and —
when the trained asset is checked in — ranking correctness of the shipped
scorer (reference slot: modules/metrics/mos_test.py MOSNet scoring)."""

import os

import numpy as np
import pytest

from e2e_tts_tpu.data.synthetic import synth_text
from e2e_tts_tpu.models.mos import (
    MOS_WINDOW,
    DEGRADATIONS,
    MosPredictor,
    degrade,
    mel_windows,
    severity_to_score,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MOS_ASSET = os.path.join(REPO, "assets", "mos", "mos.msgpack")


def test_degradations_change_audio_monotonically():
    clean = synth_text("xin chào bạn tôi yêu nước non", f0=180.0, seed=0)
    rng = np.random.RandomState(0)
    for k in range(len(DEGRADATIONS)):
        d_small = degrade(clean, 0.2, np.random.RandomState(1), kind=k)
        d_big = degrade(clean, 0.9, np.random.RandomState(1), kind=k)
        e_small = float(np.mean((d_small - clean[: len(d_small)]) ** 2))
        e_big = float(np.mean((d_big - clean[: len(d_big)]) ** 2))
        assert e_big >= e_small, (k, e_small, e_big)
    assert severity_to_score(0.0) == 5.0 and severity_to_score(1.0) == 1.0
    del rng


def test_mos_model_shapes():
    import jax
    import jax.numpy as jnp

    model = MosPredictor()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, MOS_WINDOW, 80)))
    out = model.apply(params, jnp.zeros((3, MOS_WINDOW, 80)))
    assert out.shape == (3,)
    assert ((out >= 1.0) & (out <= 5.0)).all()


def test_mel_windows_pads_and_stacks():
    wins = mel_windows(np.zeros(1000, np.float32), 22050)
    assert wins.shape == (1, MOS_WINDOW, 80)
    wins2 = mel_windows(np.zeros(MOS_WINDOW * 256 * 2 + 5, np.float32), 22050)
    assert wins2.shape[0] == 2


@pytest.mark.skipif(not os.path.exists(MOS_ASSET), reason="no trained MOS asset")
def test_trained_scorer_ranks_degradations():
    from e2e_tts_tpu.utils.metrics import LearnedMosScorer

    scorer = LearnedMosScorer()
    rng = np.random.RandomState(3)
    # held-out sentences (different seeds than training)
    clips = [
        synth_text("em yêu hoa lá trên núi cao", f0=200.0, seed=1234),
        synth_text("ngày đêm sông nước mây trời", f0=150.0, seed=4321),
    ]
    by_sev = {}
    for sev in (0.0, 0.5, 1.0):
        scores = [
            scorer(degrade(c, sev, rng, kind=k), 22050)
            for c in clips
            for k in range(len(DEGRADATIONS))
        ]
        by_sev[sev] = float(np.mean(scores))
    assert by_sev[0.0] > by_sev[0.5] > by_sev[1.0], by_sev
    assert by_sev[0.0] - by_sev[1.0] > 1.0, by_sev


@pytest.mark.skipif(not os.path.exists(MOS_ASSET), reason="no trained MOS asset")
def test_make_scorer_prefers_learned():
    from e2e_tts_tpu.utils.metrics import LearnedMosScorer, make_scorer

    scorer = make_scorer()
    assert isinstance(scorer, LearnedMosScorer)


@pytest.mark.skipif(not os.path.exists(MOS_ASSET), reason="no trained MOS asset")
def test_tts_bundle_scores_above_noise():
    """The trained tiny voice scores higher than white noise — the metric
    is usable for regression-testing synthesis quality."""
    from e2e_tts_tpu.serve import SynthesisEngine
    from e2e_tts_tpu.utils.metrics import LearnedMosScorer

    bundle = os.path.join(REPO, "assets", "bundles", "vie_tiny")
    if not os.path.isdir(bundle):
        pytest.skip("no tiny bundle")
    scorer = LearnedMosScorer()
    eng = SynthesisEngine.from_checkpoint(bundle)
    audio = eng.synthesize(
        "xin chào việt nam", speaker_id=sorted(eng.speakers)[0],
        silence_distance=0.0,
    ).astype(np.float32) / 32768.0
    noise = np.random.RandomState(0).randn(len(audio)).astype(np.float32) * 0.1
    assert scorer(audio, 22050) > scorer(noise, 22050)


def test_anchor_set_scored_by_current_proxy():
    """The frozen anchor-clip set (assets/mos/anchors/, VERDICT r4 ask #3)
    must carry a score table for the CURRENTLY shipped proxy weights: the
    latest anchor_versions entry in meta.json has to match a fresh scoring
    run within rounding, and scores must fall monotonically with anchor
    severity per language.  This is what keeps MOS numbers comparable
    across proxy retrains — forgetting tools/score_anchors.py after a
    retrain fails here."""
    import json

    anchor_dir = os.path.join(REPO, "assets", "mos", "anchors")
    meta_path = os.path.join(REPO, "assets", "mos", "meta.json")
    if not os.path.isdir(anchor_dir) or not os.path.exists(MOS_ASSET):
        pytest.skip("no anchors / trained proxy checked in")
    with open(meta_path) as f:
        meta = json.load(f)
    assert meta.get("anchor_versions"), "run tools/score_anchors.py"
    recorded = meta["anchor_versions"][-1]["scores"]

    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from score_anchors import score_anchor_set

    fresh = score_anchor_set()
    assert set(fresh) == set(recorded)
    for name, score in fresh.items():
        assert abs(score - recorded[name]) < 0.02, (name, score, recorded[name])

    # per language: clean anchors outscore every degraded severity, and the
    # heaviest degradation scores lowest
    langs = sorted({k.rsplit("_", 1)[0] for k in fresh})
    for lang in langs:
        sevs = sorted(
            (float(k.rsplit("_", 1)[1]), v)
            for k, v in fresh.items()
            if k.rsplit("_", 1)[0] == lang
        )
        scores = [v for _, v in sevs]
        assert scores[0] == max(scores), (lang, sevs)
        assert scores[-1] == min(scores), (lang, sevs)
