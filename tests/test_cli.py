"""End-to-end CLI test: prepare a synthetic corpus, train a few acoustic and
vocoder steps, export a bundle, synthesize from it."""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

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


def test_warm_start_params_from_bundle():
    """--init-from grafts a bundle's acoustic weights onto a fresh state:
    matching leaves copy, a grown speaker table keeps old voices and seeds
    new ones from the mean voice (SURVEY §7 config[4] fine-tune path)."""
    import os
    import warnings

    import jax
    import jax.numpy as jnp
    import numpy as np

    from e2e_tts_tpu.config import load_config
    from e2e_tts_tpu.models.acoustic import FastSpeech2, init_acoustic_variables
    from e2e_tts_tpu.nn import FeatureStats
    from e2e_tts_tpu.train.cli import warm_start_params

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bundle = os.path.join(repo, "assets", "bundles", "vie_tiny")
    if not os.path.isdir(bundle):
        import pytest

        pytest.skip("no checked-in bundle")

    cfg = load_config(os.path.join(bundle, "config.yaml"))
    from e2e_tts_tpu.text import symbols

    # fine-tune target: same architecture, MORE speakers (2 -> 5)
    model = FastSpeech2(
        config=cfg.models.fastspeech2,
        n_symbols=len(symbols),
        n_speakers=5,
        n_mel_channels=cfg.audio.mel.channels,
        stats=FeatureStats(),
    )
    fresh = init_acoustic_variables(model, jax.random.PRNGKey(0))["params"]
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # clean graft: no mismatch warnings
        grafted = warm_start_params(fresh, bundle)

    # encoder weights came from the bundle, not the fresh init
    from flax import serialization

    with open(os.path.join(bundle, "acoustic.msgpack"), "rb") as f:
        src = serialization.msgpack_restore(f.read())["params"]
    np.testing.assert_array_equal(
        np.asarray(grafted["mel_linear"]["kernel"]),
        np.asarray(src["mel_linear"]["kernel"]),
    )
    emb = np.asarray(grafted["speaker_emb"]["embedding"])
    src_emb = np.asarray(src["speaker_emb"]["embedding"])
    assert emb.shape[0] == 5 and src_emb.shape[0] == 2
    np.testing.assert_array_equal(emb[:2], src_emb)
    np.testing.assert_allclose(emb[2], src_emb.mean(0), rtol=1e-6)
