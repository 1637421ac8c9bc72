"""Score a deploy bundle with the learned MOS-proxy.

Synthesizes a fixed text set from the bundle and prints the per-text and
mean proxy scores — the measurement harness for fine-tune experiments
(e.g. judging whether a joint e2e fine-tune helped or hurt a voice).

Usage: python tools/score_bundle.py --bundle assets/bundles/vie_tiny \
           [--platform cpu] [--texts t1 t2 ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_TEXTS = {
    "vie": [
        "xin chào việt nam",
        "em yêu hoa lá trên núi",
        "hôm nay trời đẹp quá",
        "tôi yêu nước non quê mình",
    ],
    "eng": [
        "hello world we sing",
        "the sun and the moon",
        "we love the river and tree",
    ],
    "mya": [
        "နေ ကောင်း လမ်း",
        "ရေ မိုး တောင်",
        "ပန်း အိမ် ည",
    ],
}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--bundle", required=True)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--texts", nargs="*", default=None)
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import numpy as np

    from e2e_tts_tpu.serve import SynthesisEngine
    from e2e_tts_tpu.utils.metrics import LearnedMosScorer

    eng = SynthesisEngine.from_checkpoint(args.bundle)
    texts = args.texts or DEFAULT_TEXTS.get(eng.language, DEFAULT_TEXTS["vie"])
    scorer = LearnedMosScorer()
    scores = {}
    for t in texts:
        audio = eng.synthesize(t, silence_distance=0.0)
        scores[t] = round(
            scorer(audio.astype(np.float32) / 32768.0, eng.sample_rate), 4
        )
    out = {
        "bundle": args.bundle,
        "scores": scores,
        "mean": round(float(np.mean(list(scores.values()))), 4),
    }
    print(json.dumps(out, ensure_ascii=False, indent=1))


if __name__ == "__main__":
    main()
