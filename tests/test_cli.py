"""End-to-end CLI test: prepare a synthetic corpus, train a few acoustic and
vocoder steps, export a bundle, synthesize from it."""

import json
import os

import numpy as np
import pytest

from e2e_tts_tpu.audio.wav import write_wav
from e2e_tts_tpu.config import default_config, save_config


@pytest.fixture(scope="module")
def tiny_config_path(tmp_path_factory):
    cfg = default_config()
    fs2 = cfg.models.fastspeech2
    small = fs2.replace(
        encoder_layers=1, decoder_layers=1, encoder_hidden=32, decoder_hidden=32,
        building_block=fs2.building_block.replace(
            transformer=fs2.building_block.transformer.replace(conv_filter_size=32)
        ),
        postnet=fs2.postnet.replace(embedding_dim=32, conv_layers=2),
    )
    hifi = cfg.models.hifigan.replace(
        upsample_initial_channel=16,
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
    )
    train = cfg.train.replace(batch_size=2, log_step=2)
    cfg = cfg.replace(
        models=cfg.models.replace(fastspeech2=small, hifigan=hifi), train=train
    )
    p = tmp_path_factory.mktemp("cfg") / "config.yaml"
    save_config(cfg, str(p))
    return str(p)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("clicorpus")
    (root / "wavs").mkdir()
    rng = np.random.RandomState(1)
    rows = []
    texts = ["xin chào", "cảm ơn bạn nhiều", "hẹn gặp lại", "chúc ngủ ngon"]
    for i, text in enumerate(texts):
        sr = 22050
        t = np.arange(int(sr * (0.6 + 0.2 * rng.rand())))
        audio = 0.3 * np.sin(2 * np.pi * (160 + 30 * i) * t / sr)
        write_wav(str(root / "wavs" / f"u{i}.wav"), audio.astype(np.float32), sr)
        rows.append(f"u{i}.wav|spk|{text}")
    (root / "metadata.csv").write_text("\n".join(rows), encoding="utf8")
    return str(root)


def test_full_cli_pipeline(corpus, tiny_config_path, tmp_path):
    from e2e_tts_tpu.train.cli import main

    workdir = str(tmp_path / "work")
    main(["prepare", "--corpus", corpus, "--workdir", workdir, "--config", tiny_config_path])
    assert os.path.exists(os.path.join(workdir, "file_list.txt"))
    assert os.path.exists(os.path.join(workdir, "stats.json"))

    main([
        "acoustic", "--workdir", workdir, "--config", tiny_config_path,
        "--steps", "4", "--ckpt-every", "2",
    ])
    assert os.path.isdir(os.path.join(workdir, "acoustic_ckpt"))

    main([
        "vocoder", "--workdir", workdir, "--config", tiny_config_path,
        "--steps", "2", "--ckpt-every", "2",
    ])

    # resume: a second acoustic run continues from the saved step
    main([
        "acoustic", "--workdir", workdir, "--config", tiny_config_path,
        "--steps", "6", "--ckpt-every", "2",
    ])

    # joint e2e fine-tune a couple of steps
    main([
        "e2e", "--workdir", workdir, "--config", tiny_config_path,
        "--steps", "2", "--ckpt-every", "2",
    ])

    # predicted mels for vocoder fine-tuning
    main(["generate-mels", "--workdir", workdir, "--config", tiny_config_path])
    root = corpus
    import glob

    assert glob.glob(os.path.join(root, "predicted_mels", "*.npy"))

    bundle = str(tmp_path / "bundle")
    main(["export", "--workdir", workdir, "--output", bundle, "--config", tiny_config_path])
    assert os.path.exists(os.path.join(bundle, "acoustic.msgpack"))

    from e2e_tts_tpu.serve import SynthesisEngine

    eng = SynthesisEngine.from_checkpoint(bundle)
    audio = eng.synthesize("xin chào", speaker_id="spk")
    assert audio.dtype == np.int16 and len(audio) > 0
