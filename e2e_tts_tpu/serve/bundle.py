"""Deploy bundle I/O.

A bundle directory carries everything serving needs, matching the reference
checkpoint-dir contract (config.yaml + speakers.json + stats.json next to the
weights, reference: src/api/utils.py:34-36, written by
tools_for_model.py:143-152) with flax-msgpack parameter files.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Tuple

from flax import serialization

from ..config import Config, load_config, save_config
from ..nn.variance import FeatureStats


def save_bundle(
    bundle_dir: str,
    config: Config,
    acoustic_params,
    vocoder_params,
    speakers: Dict[str, int],
    stats: FeatureStats,
    vocoder_kind: str = "hifigan",
    foreign_dict: Dict = None,
    language: str = "vie",
):
    os.makedirs(bundle_dir, exist_ok=True)
    save_config(config, os.path.join(bundle_dir, "config.yaml"))
    with open(os.path.join(bundle_dir, "speakers.json"), "w") as f:
        json.dump(speakers, f, ensure_ascii=False, indent=1)
    with open(os.path.join(bundle_dir, "stats.json"), "w") as f:
        json.dump(stats.to_dict(), f, indent=1)
    with open(os.path.join(bundle_dir, "meta.json"), "w") as f:
        json.dump({"vocoder_kind": vocoder_kind, "language": language}, f)
    if foreign_dict:
        with open(
            os.path.join(bundle_dir, "foreign_words.json"), "w", encoding="utf8"
        ) as f:
            json.dump(foreign_dict, f, ensure_ascii=False, indent=1)
    with open(os.path.join(bundle_dir, "acoustic.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(acoustic_params))
    with open(os.path.join(bundle_dir, "vocoder.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(vocoder_params))


def load_bundle(bundle_dir: str) -> Tuple:
    config = load_config(os.path.join(bundle_dir, "config.yaml"))
    with open(os.path.join(bundle_dir, "speakers.json")) as f:
        speakers = json.load(f)
    with open(os.path.join(bundle_dir, "stats.json")) as f:
        stats = FeatureStats.from_dict(json.load(f))
    meta_path = os.path.join(bundle_dir, "meta.json")
    vocoder_kind, language = "hifigan", "vie"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        vocoder_kind = meta.get("vocoder_kind", "hifigan")
        language = meta.get("language", "vie")
    fd_path = os.path.join(bundle_dir, "foreign_words.json")
    foreign_dict = {}
    if os.path.exists(fd_path):
        with open(fd_path, encoding="utf8") as f:
            foreign_dict = json.load(f)

    # Rebuild template params to restore structure, then overwrite bytes.
    import jax
    import jax.numpy as jnp

    from ..models.acoustic import FastSpeech2, cpu_rng_keys, init_acoustic_variables
    from ..models.vocoder import build_generator, init_generator_params

    from ..text.frontends import get_frontend

    _syms = get_frontend(language).symbols

    acoustic = FastSpeech2(
        config=config.models.fastspeech2,
        n_symbols=len(_syms),
        n_speakers=max(len(speakers), 1),
        n_mel_channels=config.audio.mel.channels,
        stats=stats,
    )
    template_a = init_acoustic_variables(acoustic, 0)
    voc = build_generator(config, vocoder_kind)
    template_v = init_generator_params(
        voc, cpu_rng_keys(0), config.audio.mel.channels
    )

    with open(os.path.join(bundle_dir, "acoustic.msgpack"), "rb") as f:
        aparams = serialization.from_bytes(template_a, f.read())
    with open(os.path.join(bundle_dir, "vocoder.msgpack"), "rb") as f:
        vparams = serialization.from_bytes(template_v, f.read())
    return (
        config, aparams, vparams, speakers, stats, vocoder_kind,
        foreign_dict, language,
    )
