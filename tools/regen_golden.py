"""Regenerate the golden snapshots (mels + DSP stats + MOS baseline) for an
existing deploy bundle — used when a bundle's weights are replaced by an
improved fine-tune (e.g. shipping an e2e-fine-tuned vocoder, VERDICT r3
item 2) so the quality regressions in tests/test_quality.py re-anchor on
the new, better voice.

Goldens MUST be generated on CPU (the test environment): CI forces the CPU
platform, and TPU-rendered audio diverges far beyond the gate's tolerance
(bf16 decoder numerics shift duration rounding, time-misaligning the mel —
measured MAE ~1.0 vs the CPU gate's 0.15).  The platform is forced below via
jax.config.update: a JAX_PLATFORMS env var set inside a script is silently
ignored in this environment because the interpreter's sitecustomize imports
jax (with JAX_PLATFORMS=axon) before any user code runs.

  python tools/regen_golden.py --name vie_tiny
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from make_tiny_bundle import dsp_stats  # noqa: E402

GOLDEN_TEXTS = {
    "vie": ["xin chào việt nam", "em yêu hoa lá trên núi"],
    "eng": ["hello world we sing", "the sun and the moon"],
    "mya": ["နေ ကောင်း လမ်း", "ရေ မိုး တောင်"],
}
MOS_TEXTS = {
    "vie": "xin chào việt nam hôm nay trời đẹp",
    "eng": "hello world we sing the sun and moon",
    "mya": "နေ ကောင်း လမ်း ရေ မိုး တောင်",
}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--name", default="vie_tiny")
    ap.add_argument("--bundle", default=None)
    ap.add_argument("--golden", default=None)
    args = ap.parse_args(argv)

    bundle = args.bundle or os.path.join(REPO, "assets", "bundles", args.name)
    golden = args.golden or os.path.join(
        REPO, "tests", "assets", f"golden_{args.name}"
    )

    # force the CPU platform (see module docstring: env vars are too late
    # here — sitecustomize already imported jax)
    import jax

    jax.config.update("jax_platforms", "cpu")

    from e2e_tts_tpu.audio.mel import MelParams, mel_spectrogram
    from e2e_tts_tpu.serve import SynthesisEngine
    from e2e_tts_tpu.utils.metrics import LearnedMosScorer

    eng = SynthesisEngine.from_checkpoint(bundle)
    texts = GOLDEN_TEXTS[eng.language]
    os.makedirs(golden, exist_ok=True)

    p = MelParams.from_config(eng.config.audio)
    stats_all = {}
    for i, text in enumerate(texts):
        for spk in sorted(eng.speakers):
            audio = eng.synthesize(text, speaker_id=spk, silence_distance=0.0)
            f32 = audio.astype(np.float32) / 32768.0
            mel = np.asarray(mel_spectrogram(f32[None], p)[0])
            np.save(
                os.path.join(golden, f"mel_{i}_{spk}.npy"), mel.astype(np.float16)
            )
            stats_all[f"{i}_{spk}"] = dsp_stats(f32, eng.sample_rate)
    with open(os.path.join(golden, "stats.json"), "w") as f:
        json.dump({"texts": texts, "stats": stats_all}, f, indent=1)

    scorer = LearnedMosScorer()
    mos_text = MOS_TEXTS[eng.language]
    audio = eng.synthesize(mos_text, silence_distance=0.0)
    score = scorer(audio.astype(np.float32) / 32768.0, eng.sample_rate)
    # keep the old baselines as history so calibration drift across
    # retrains stays visible and the CI gate's 0.2 threshold can be
    # re-judged against how much each regen actually moved (VERDICT r4
    # item 10)
    mos_path = os.path.join(golden, "mos.json")
    history = []
    if os.path.exists(mos_path):
        with open(mos_path) as f:
            old = json.load(f)
        history = old.get("history", [])
        history.append(
            {
                "mos_proxy": old.get("mos_proxy"),
                "measured": old.get("measured"),
                "delta_to_next": round(float(score) - old.get("mos_proxy", 0.0), 3),
            }
        )
    with open(mos_path, "w") as f:
        json.dump(
            {
                "mos_proxy": round(float(score), 3),
                "text": mos_text,
                "measured": datetime.date.today().isoformat(),
                "history": history,
            },
            f,
            ensure_ascii=False,
        )
    print(f"[golden] {args.name}: mos_proxy={score:.3f} -> {golden}")
    for k, v in stats_all.items():
        print(
            f"  {k}: periodicity={v['periodicity']:.3f} f0={v['f0_est']:.0f} "
            f"rms={v['rms']:.3f} n={v['n_samples']}"
        )


if __name__ == "__main__":
    main()
