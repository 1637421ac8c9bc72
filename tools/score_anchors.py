"""Score the frozen anchor-clip set with the CURRENT MOS-proxy weights.

VERDICT r4 ask #3: every proxy retrain rescales its output, which severed
comparability across rounds (vie_tiny's golden history reads
4.587 -> 3.63 -> 4.159 -> 3.889 across proxy versions).  The anchor clips in
assets/mos/anchors/ are FROZEN (tools/make_anchors.py, run once); scoring
them with each proxy version gives a cross-version mapping so any
historical score can be interpreted on the current scale.

Run this after EVERY tools/train_mos.py retrain.  It appends an entry to
``anchor_versions`` in assets/mos/meta.json:

    {"version": N, "date": ..., "scores": {"vie_0.0": 4.1, ...}}

Version N is monotonically assigned.  tests/test_mos.py asserts the latest
entry matches the shipped weights, so forgetting this step fails CI.
Reference role: the externally-fixed MOSNet checkpoint in
modules/metrics/mos_test.py:16-35 never rescales; the anchor table is what
makes a retrainable in-framework proxy behave comparably.
"""

from __future__ import annotations

import datetime
import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MOS_DIR = os.path.join(REPO, "assets", "mos")
ANCHOR_DIR = os.path.join(MOS_DIR, "anchors")


def score_anchor_set(asset_dir: str = MOS_DIR) -> dict:
    """Score every anchor wav with the proxy weights in ``asset_dir``."""
    from e2e_tts_tpu.audio.wav import read_wav
    from e2e_tts_tpu.utils.metrics import LearnedMosScorer

    scorer = LearnedMosScorer(asset_dir=asset_dir)
    scores = {}
    for path in sorted(glob.glob(os.path.join(ANCHOR_DIR, "*.wav"))):
        audio, sr = read_wav(path)  # float32 in [-1, 1]
        name = os.path.splitext(os.path.basename(path))[0]
        scores[name] = round(scorer(audio, sr), 3)
    return scores


def main():
    meta_path = os.path.join(MOS_DIR, "meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    versions = meta.setdefault("anchor_versions", [])
    scores = score_anchor_set()
    if not scores:
        raise SystemExit(
            "no anchors found — run tools/make_anchors.py once (then never again)"
        )
    entry = {
        "version": (versions[-1]["version"] + 1) if versions else 1,
        "date": datetime.date.today().isoformat(),
        "scores": scores,
    }
    versions.append(entry)
    with open(meta_path, "w") as f:
        json.dump(meta, f, indent=1)
    print(f"[anchors] recorded proxy version {entry['version']}:")
    for k, v in scores.items():
        print(f"  {k}: {v}")


if __name__ == "__main__":
    main()
