"""Per-block-family activation-remat memory profile (ROADMAP training-scale
item): compile the acoustic train step with remat_blocks off/on and report
XLA's own memory analysis (temp = activation workspace) per family.

Uses AOT lowering on ShapeDtypeStructs — no params are materialized, so the
tool is compile-only and safe to run next to other work.  Run on the TPU
backend for the numbers that matter (HBM scheduling); CPU works for smoke.

Usage:
  python tools/remat_profile.py [--families transformer conformer ...]
      [--batch 32] [--mel-len 1024] [--txt-len 128] [--json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def profile_family(family: str, remat: bool, B: int, L: int, T: int):
    import jax
    import jax.numpy as jnp

    from e2e_tts_tpu.config import default_config
    from e2e_tts_tpu.models import FastSpeech2
    from e2e_tts_tpu.nn import FeatureStats
    from e2e_tts_tpu.text import symbols
    from e2e_tts_tpu.train import (
        AcousticBatch,
        acoustic_optimizer,
        init_train_state,
        make_train_step,
    )

    cfg = default_config()
    fs2 = cfg.models.fastspeech2.replace(remat_blocks=remat)
    fs2 = fs2.replace(
        building_block=fs2.building_block.replace(block_type=family)
    )
    cfg = cfg.replace(models=cfg.models.replace(fastspeech2=fs2))

    model = FastSpeech2(
        config=fs2,
        n_symbols=len(symbols),
        n_speakers=4,
        n_mel_channels=cfg.audio.mel.channels,
        stats=FeatureStats(),
    )
    optimizer = acoustic_optimizer(
        cfg.train.fastspeech2_optimizer, fs2.encoder_hidden
    )
    train_step = make_train_step(model, cfg, optimizer, n_words=64)

    # concrete init (the host-side init cache can't be traced through);
    # batch/rng stay abstract so only one set of params is materialized
    state = init_train_state(model, optimizer, jax.random.PRNGKey(0))
    sds = lambda shape, dt: jax.ShapeDtypeStruct(shape, dt)
    batch = AcousticBatch(
        speakers=sds((B,), jnp.int32),
        texts=sds((B, L), jnp.int32),
        txt_lens=sds((B,), jnp.int32),
        word_ids=sds((B, L), jnp.int32),
        mel=sds((B, T, cfg.audio.mel.channels), jnp.float32),
        mel_lens=sds((B,), jnp.int32),
        attn_prior=sds((B, T, L), jnp.float32),
        duration_target=sds((B, L), jnp.float32),
        f0=sds((B, T), jnp.float32),
        uv=sds((B, T), jnp.float32),
        pitch=sds((B, T), jnp.float32),
        energy=sds((B, T), jnp.float32),
    )
    rng = jax.ShapeDtypeStruct((2,), jnp.uint32)

    compiled = jax.jit(train_step).lower(state, batch, rng).compile()
    ma = compiled.memory_analysis()
    if ma is None:  # backend without memory analysis
        return None
    return {
        "temp_MB": round(ma.temp_size_in_bytes / 2**20, 1),
        "argument_MB": round(ma.argument_size_in_bytes / 2**20, 1),
        "output_MB": round(ma.output_size_in_bytes / 2**20, 1),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--families", nargs="*",
        default=["transformer", "conformer", "fastformer", "lstransformer"],
    )
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--mel-len", type=int, default=1024)
    ap.add_argument("--txt-len", type=int, default=128)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args(argv)

    results = {}
    for fam in args.families:
        row = {}
        for remat in (False, True):
            m = profile_family(
                fam, remat, args.batch, args.txt_len, args.mel_len
            )
            row["remat" if remat else "base"] = m
        if row.get("base") and row.get("remat"):
            row["temp_saving"] = round(
                1.0 - row["remat"]["temp_MB"] / max(row["base"]["temp_MB"], 1e-9),
                3,
            )
        results[fam] = row
        if not args.json:
            print(f"[remat] {fam}: {json.dumps(row)}")
    if args.json:
        print(json.dumps(results))


if __name__ == "__main__":
    main()
