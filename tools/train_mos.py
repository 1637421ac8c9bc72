"""Train the learned MOS-proxy predictor on calibrated degradations.

Clean speech comes from the deterministic formant-synthetic corpus
(e2e_tts_tpu/data/synthetic.py); each training example applies one of the
five calibrated degradations (models/mos.py) at a random severity, with
target score 5 - 4*severity.  The trained weights ship as
assets/mos/mos.msgpack and back the LearnedMosScorer in utils/metrics.py
(the reference's MOSNet slot, modules/metrics/mos_test.py).

Usage: python tools/train_mos.py --steps 3000
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_dataset(n_clips: int, seed: int = 0):
    """Pre-rendered clean clips (float32 at 22050) from ALL served
    languages' renderers.  A vie-only clean set leaves eng/mya pristine
    speech out-of-distribution and caps their scores near 3.4 (measured) —
    the per-language quality gates then compare against a depressed
    ceiling.  Mixing the renderers anchors 'pristine' at the top of the
    scale for every frontend the router serves."""
    from e2e_tts_tpu.data.synthetic import make_sentences, synth_text
    from e2e_tts_tpu.text.burmese import BURMESE_VOCAB
    from e2e_tts_tpu.text.english import ENGLISH_VOCAB
    from e2e_tts_tpu.text.frontends import get_frontend

    langs = [
        ("vie", None, None),
        ("eng", ENGLISH_VOCAB, get_frontend("eng")),
        ("mya", BURMESE_VOCAB, get_frontend("mya")),
    ]
    rng = np.random.RandomState(seed)
    clips = []
    for li, (lang, vocab, fe) in enumerate(langs):
        n = n_clips // len(langs) + (1 if li < n_clips % len(langs) else 0)
        sents = make_sentences(n, seed=seed + li, vocab=vocab)
        pfn = (lambda s, fe=fe: fe.phonemize(s)[0]) if fe else None
        for i, s in enumerate(sents):
            f0 = rng.uniform(120.0, 260.0)
            clips.append(
                synth_text(s, f0=f0, seed=seed + li * 1000 + i, phonemize_fn=pfn)
            )
    return clips


def sample_batch(clips, batch, rng):
    from e2e_tts_tpu.models.mos import MOS_WINDOW, degrade, severity_to_score

    hop, need = 256, MOS_WINDOW * 256
    xs, ys = [], []
    for _ in range(batch):
        clip = clips[rng.randint(len(clips))]
        if len(clip) < need:
            clip = np.pad(clip, (0, need - len(clip)))
        s = rng.randint(0, len(clip) - need + 1) if len(clip) > need else 0
        seg = clip[s : s + need]
        # 1 in 6: pristine (anchor the top of the scale)
        if rng.rand() < 1 / 6:
            sev = 0.0
        else:
            sev = rng.rand()
        xs.append(degrade(seg, sev, rng))
        ys.append(severity_to_score(sev))
    return np.stack(xs), np.asarray(ys, np.float32)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--clips", type=int, default=96)
    ap.add_argument("--out", default=os.path.join(REPO, "assets", "mos"))
    ap.add_argument(
        "--platform", default=None, choices=["cpu", "tpu"],
        help="force a JAX backend (this environment pre-imports jax, so "
        "JAX_PLATFORMS in the shell is too late; jax.config still works)",
    )
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import optax
    from flax import serialization

    from e2e_tts_tpu.audio.mel import MelParams, mel_spectrogram
    from e2e_tts_tpu.models.mos import MOS_WINDOW, MosPredictor

    clips = make_dataset(args.clips)
    rng = np.random.RandomState(1)

    model = MosPredictor()
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, MOS_WINDOW, 80))
    )
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    p = MelParams()

    @jax.jit
    def melspec(x):
        return jnp.swapaxes(mel_spectrogram(x, p), 1, 2)  # (B, T, 80)

    @jax.jit
    def step(params, opt_state, mels, targets):
        def loss_fn(prm):
            pred = model.apply(prm, mels)
            return jnp.mean((pred - targets) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(args.steps):
        xs, ys = sample_batch(clips, args.batch, rng)
        mels = melspec(jnp.asarray(xs))
        params, opt_state, loss = step(params, opt_state, mels, jnp.asarray(ys))
        if i % 200 == 0 or i == args.steps - 1:
            print(f"[mos] step {i} loss={float(loss):.4f}")

    # held-out sanity: monotone over severities
    from e2e_tts_tpu.models.mos import degrade, score_audio

    eval_rng = np.random.RandomState(99)
    eval_clips = make_dataset(8, seed=7)
    report = {}
    for sev in (0.0, 0.25, 0.5, 0.75, 1.0):
        scores = [
            score_audio(params, degrade(c, sev, eval_rng, kind=k), 22050)
            for c in eval_clips
            for k in range(5)
        ]
        report[str(sev)] = round(float(np.mean(scores)), 3)
    print("[mos] mean score by severity:", report)

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "mos.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(params))
    with open(os.path.join(args.out, "meta.json"), "w") as f:
        json.dump({"window": MOS_WINDOW, "severity_curve": report}, f, indent=1)
    print(f"[mos] saved -> {args.out}")


if __name__ == "__main__":
    main()
