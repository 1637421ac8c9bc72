"""Generate the FROZEN MOS-proxy anchor-clip set (run once, then never).

VERDICT r4 ask #3: every MOS-proxy retrain resets the meaning of its scores,
severing comparability across rounds.  The fix is a frozen set of anchor
clips — clean speech from each shipped voice plus graded degradations —
checked into assets/mos/anchors/ and scored by EVERY proxy version
(tools/score_anchors.py).  The cross-version score table in
assets/mos/meta.json then maps any historical score onto the current scale.

The clips are deterministic (fixed seeds, fixed degradation kinds) but
depend on the bundles shipped at generation time; that is why they are
generated ONCE and committed — regenerating after a voice retrain would
defeat the anchor's purpose.  Reference role: the externally-fixed MOSNet
checkpoint in modules/metrics/mos_test.py:16-35.
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ANCHOR_DIR = os.path.join(REPO, "assets", "mos", "anchors")

SENTENCES = {
    "vie": "xin chào việt nam quê hương tôi có những dòng sông xanh",
    "eng": "the quick brown fox jumps over the lazy dog near the river",
    "mya": "မင်္ဂလာပါ နေကောင်းလား ကျေးဇူးတင်ပါတယ်",
}
SEVERITIES = (0.0, 0.3, 0.6, 0.9)
SAMPLE_RATE = 22050


def main():
    from e2e_tts_tpu.audio.wav import write_wav
    from e2e_tts_tpu.models.mos import degrade
    from e2e_tts_tpu.serve import SynthesisEngine

    os.makedirs(ANCHOR_DIR, exist_ok=True)
    for lang, text in SENTENCES.items():
        bundle = os.path.join(REPO, "assets", "bundles", f"{lang}_tiny")
        if not os.path.isdir(bundle):
            print(f"skip {lang}: no bundle at {bundle}")
            continue
        eng = SynthesisEngine.from_checkpoint(bundle, batch_size=2)
        spk = sorted(eng.speakers)[0]
        audio = eng.synthesize(text, speaker_id=spk).astype(np.float32) / 32768.0
        for sev in SEVERITIES:
            # ONE degradation kind (additive noise, an SNR ladder) across all
            # severities: mixing kinds would confound the severity axis and
            # break monotonicity of the anchor table.  Fixed seed per step.
            rng = np.random.RandomState(1234 + int(sev * 10))
            clip = audio if sev == 0.0 else degrade(audio, sev, rng, kind=0)
            path = os.path.join(ANCHOR_DIR, f"{lang}_{sev:.1f}.wav")
            write_wav(path, clip, SAMPLE_RATE)
            print("wrote", path)


if __name__ == "__main__":
    main()
