"""Config schema tests: defaults match the reference YAMLs, round-trip works."""

import os

import pytest
import yaml

from e2e_tts_tpu.config import Config, default_config, load_config, save_config

from conftest import REFERENCE_ROOT, requires_reference

pytestmark = pytest.mark.smoke


def test_defaults():
    cfg = default_config()
    assert cfg.audio.signal.sampling_rate == 22050
    assert cfg.audio.stft.hop_length == 256
    assert cfg.audio.mel.channels == 80
    fs2 = cfg.models.fastspeech2
    assert fs2.encoder_layers == 6 and fs2.encoder_hidden == 384
    assert fs2.building_block.block_type == "transformer"
    assert fs2.building_block.active().encoder_head == 2
    assert fs2.variance.duration_modelling.learn_alignment is True
    assert cfg.models.hifigan.upsample_rates == (8, 8, 2, 2)
    assert cfg.train.fastspeech2_optimizer.warm_up_step == 4000
    assert cfg.train.hifigan_optimizer.betas == (0.8, 0.99)


def test_roundtrip(tmp_path):
    cfg = default_config()
    p = os.path.join(tmp_path, "config.yaml")
    save_config(cfg, p)
    cfg2 = load_config(p)
    assert cfg2 == cfg


def test_config_hashable():
    # configs key jit caches; they must be hashable and comparable
    a, b = default_config(), default_config()
    assert hash(a) == hash(b) and a == b
    c = a.replace(train=a.train.replace(batch_size=16))
    assert c != a


@requires_reference
def test_load_reference_yamls():
    cfg = load_config(
        model_config=os.path.join(REFERENCE_ROOT, "e2e_tts/config/model_config.yaml"),
        train_config=os.path.join(REFERENCE_ROOT, "e2e_tts/config/train_config.yaml"),
        preprocess_config=os.path.join(
            REFERENCE_ROOT, "e2e_tts/config/preprocessing_config.yaml"
        ),
    )
    # loading the reference's shipped YAMLs reproduces our defaults
    assert cfg == default_config()
