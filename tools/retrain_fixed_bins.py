"""Retrain a tiny voice's ACOUSTIC model on the fixed prosody-bin stats.

Round 3 found compute_stats storing pitch/energy min/max in the RAW domain
while training feeds normalized targets, collapsing the 256 quantization
bins to ~10 — every shipped voice has near-inert p/e_control (VERDICT r4
item 2).  The fix landed in round 3; this driver re-earns the artifacts:

1. fresh `prepare` -> stats.json with normalized-domain min/max,
2. acoustic retrain from scratch on those stats,
3. export with the EXISTING trained vocoder (GT-mel per-stage ckpt, and a
   variant with the shipped bundle's e2e fine-tuned vocoder): mel features
   are unchanged by the stats fix, so the vocoder needs no retraining —
   which keeps this runnable on CPU when the TPU tunnel is down.

Usage:
  python tools/retrain_fixed_bins.py --name vie_tiny --lang vie \
      [--acoustic-steps 4000] [--platform cpu]

Outputs (staging — shipping into assets/ is a separate reviewed step):
  outputs/r4_work_<name>/     retrain workdir
  outputs/r4_bundles/<name>/           new acoustic + per-stage vocoder
  outputs/r4_bundles/<name>_e2evoc/    new acoustic + e2e-tuned vocoder
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--name", required=True)
    ap.add_argument("--lang", default="vie", choices=["vie", "eng", "mya"])
    ap.add_argument("--acoustic-steps", type=int, default=4000)
    ap.add_argument("--platform", default=None, help="e.g. cpu to force CPU")
    ap.add_argument(
        "--f0-jitter", type=float, default=0.2,
        help="per-utterance f0 variation so the pitch-conditioning path is "
        "load-bearing (0 reproduces the round-3 speaker-determined corpus)",
    )
    ap.add_argument(
        "--old-workdir",
        default=None,
        help="round-3 workdir holding the trained vocoder ckpt "
        "(default outputs/r3_workdirs/<name>)",
    )
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from e2e_tts_tpu.config import save_config
    from e2e_tts_tpu.data.synthetic import make_synthetic_corpus
    from e2e_tts_tpu.train.cli import main as cli
    from make_tiny_bundle import tiny_config

    name, lang = args.name, args.lang
    # "t" = tone-contour renderer (synthetic.py _TONE_CONTOURS)
    jit_tag = f"_j{int(args.f0_jitter * 100)}t" if args.f0_jitter else "_t"
    corpus = f"/tmp/tiny_corpus_{name}{jit_tag}"
    workdir = os.path.join(REPO, "outputs", f"r4_work_{name}{jit_tag}")
    old_workdir = args.old_workdir or os.path.join(
        REPO, "outputs", "r3_workdirs", name
    )
    bundle_a = os.path.join(REPO, "outputs", "r4_bundles", name)
    bundle_b = bundle_a + "_e2evoc"
    old_bundle = os.path.join(REPO, "assets", "bundles", name)

    # 1. corpus (deterministic; regen if /tmp lost it)
    if not os.path.exists(os.path.join(corpus, "metadata.csv")):
        kw = {}
        if lang != "vie":
            from e2e_tts_tpu.data.synthetic import make_sentences
            from e2e_tts_tpu.text.frontends import get_frontend

            fe = get_frontend(lang)
            if lang == "eng":
                from e2e_tts_tpu.text.english import ENGLISH_VOCAB as vocab
            else:
                from e2e_tts_tpu.text.burmese import BURMESE_VOCAB as vocab
            kw = {
                "sentences": make_sentences(48, seed=0, vocab=vocab),
                "phonemize_fn": lambda s: fe.phonemize(s)[0],
            }
        make_synthetic_corpus(
            corpus, n_sentences=48, seed=0, f0_jitter=args.f0_jitter, **kw
        )
        print(f"[r4] corpus regenerated -> {corpus}", flush=True)

    # 2. fresh workdir + prepare (recomputes stats with the fixed domain)
    os.makedirs(workdir, exist_ok=True)
    cfg_path = os.path.join(workdir, "config.yaml")
    save_config(tiny_config(), cfg_path)
    common = ["--workdir", workdir, "--config", cfg_path]
    lang_flag = ["--lang", lang] if lang != "vie" else []
    if not os.path.exists(os.path.join(workdir, "file_list.txt")):
        cli(["prepare", "--corpus", corpus] + common + lang_flag)
    with open(os.path.join(workdir, "stats.json")) as f:
        stats = json.load(f)
    p = stats["pitch"]
    # normalized-domain sanity: min/max must straddle 0 (z-scores), not Hz
    assert p["min"] < 0 < p["max"], f"stats still raw-domain: {p}"
    print(f"[r4] stats OK: pitch min {p['min']:.2f} max {p['max']:.2f}", flush=True)

    # 3. acoustic retrain (resumes if interrupted)
    cli(["acoustic"] + common + lang_flag +
        ["--steps", str(args.acoustic_steps), "--ckpt-every", "1000"])

    # 4. bring the trained vocoder over; export the two variants
    voc_src = os.path.join(old_workdir, "vocoder_hifigan_ckpt")
    voc_dst = os.path.join(workdir, "vocoder_hifigan_ckpt")
    if not os.path.exists(voc_dst):
        shutil.copytree(voc_src, voc_dst)
    for b in (bundle_a, bundle_b):
        if os.path.exists(b):
            shutil.rmtree(b)
    cli(["export", "--output", bundle_a, "--no-e2e"] + common + lang_flag)
    shutil.copytree(bundle_a, bundle_b)
    shutil.copy(
        os.path.join(old_bundle, "vocoder.msgpack"),
        os.path.join(bundle_b, "vocoder.msgpack"),
    )
    print(f"[r4] bundles -> {bundle_a} (per-stage voc), {bundle_b} (e2e voc)",
          flush=True)


if __name__ == "__main__":
    main()
