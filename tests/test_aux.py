"""Auxiliary subsystem tests: e2e joint step, MFA interop, audio prep,
metrics harness, storage, profiling, generate-mels CLI."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e2e_tts_tpu.config import default_config


def _tiny_cfg():
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
    return cfg.replace(models=cfg.models.replace(fastspeech2=small, hifigan=hifi))


def test_e2e_joint_train_step():
    from e2e_tts_tpu.models import FastSpeech2, build_generator
    from e2e_tts_tpu.nn import FeatureStats
    from e2e_tts_tpu.text import symbols
    from e2e_tts_tpu.train import acoustic_optimizer, gan_optimizer
    from e2e_tts_tpu.train.acoustic_step import AcousticBatch
    from e2e_tts_tpu.train.e2e_step import E2EBatch, init_e2e_state, make_e2e_train_step

    cfg = _tiny_cfg()
    model = FastSpeech2(
        config=cfg.models.fastspeech2, n_symbols=len(symbols), n_speakers=2,
        n_mel_channels=80, stats=FeatureStats(),
    )
    gen = build_generator(cfg, "hifigan")
    am_opt = acoustic_optimizer(cfg.train.fastspeech2_optimizer, 32)
    g_opt = gan_optimizer(cfg.train.hifigan_optimizer)
    d_opt = gan_optimizer(cfg.train.hifigan_optimizer)

    step_fn = jax.jit(
        make_e2e_train_step(model, gen, cfg, am_opt, g_opt, d_opt, n_words=4,
                            segment_frames=16)
    )
    state = init_e2e_state(model, gen, cfg, am_opt, g_opt, d_opt,
                           jax.random.PRNGKey(0), segment_frames=16)

    B, L, T = 2, 8, 24
    rng = np.random.RandomState(0)
    ab = AcousticBatch(
        speakers=jnp.zeros((B,), jnp.int32),
        texts=jnp.asarray(rng.randint(4, len(symbols), (B, L)), jnp.int32),
        txt_lens=jnp.full((B,), L, jnp.int32),
        word_ids=jnp.asarray(np.minimum(np.arange(L) // 2, 3))[None].repeat(B, 0),
        mel=jnp.asarray(rng.randn(B, T, 80) * 0.1, jnp.float32),
        mel_lens=jnp.full((B,), T, jnp.int32),
        attn_prior=jnp.full((B, T, L), 1.0 / L, jnp.float32),
        duration_target=jnp.zeros((B, L), jnp.float32),
        f0=jnp.asarray(rng.randn(B, T), jnp.float32),
        uv=jnp.asarray((rng.rand(B, T) > 0.7), jnp.float32),
        pitch=jnp.asarray(rng.randn(B, T), jnp.float32),
        energy=jnp.asarray(np.abs(rng.randn(B, T)), jnp.float32),
    )
    batch = E2EBatch(
        acoustic=ab,
        audio=jnp.asarray(
            0.1 * np.sin(2 * np.pi * 220 * np.arange(T * 256) / 22050)
        )[None].repeat(B, 0).astype(jnp.float32),
    )
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    # the reference e2e logger's scalar names are all present + finite
    for k in ("total", "generator", "discriminator", "variance", "mpd", "msd",
              "fm", "mel", "duration", "pitch", "energy"):
        assert k in metrics and np.isfinite(float(metrics[k])), k


def test_textgrid_parsing_and_durations(tmp_path):
    from e2e_tts_tpu.data.mfa import parse_textgrid, textgrid_to_durations

    tg = tmp_path / "utt.TextGrid"
    tg.write_text(
        """File type = "ooTextFile"
Object class = "TextGrid"
xmin = 0
xmax = 1.0
tiers? <exists>
size = 2
item []:
    item [1]:
        class = "IntervalTier"
        name = "words"
        intervals: size = 1
        intervals [1]:
            xmin = 0
            xmax = 1.0
            text = "xin"
    item [2]:
        class = "IntervalTier"
        name = "phones"
        intervals: size = 3
        intervals [1]:
            xmin = 0.0
            xmax = 0.25
            text = "X"
        intervals [2]:
            xmin = 0.25
            xmax = 0.75
            text = "I_0"
        intervals [3]:
            xmin = 0.75
            xmax = 1.0
            text = ""
""",
        encoding="utf8",
    )
    intervals = parse_textgrid(str(tg))
    assert len(intervals) == 3
    labels, durs = textgrid_to_durations(str(tg), mel_len=86)
    assert labels == ["X", "I_0", "<SILENT>"]
    assert durs.sum() == 86
    # 0.25s at 86.13 fps ~ 21-22 frames
    assert 20 <= durs[0] <= 23


def test_build_mfa_corpus(tmp_path):
    from e2e_tts_tpu.audio.wav import write_wav
    from e2e_tts_tpu.data.mfa import build_mfa_corpus

    wavs = tmp_path / "wavs"
    wavs.mkdir()
    write_wav(str(wavs / "a.wav"), np.zeros(1000, np.float32), 22050)
    meta = tmp_path / "metadata.csv"
    meta.write_text("a.wav|spk|xin chào việt nam", encoding="utf8")
    lex = build_mfa_corpus(str(meta), str(wavs), str(tmp_path / "mfa"))
    text = open(lex, encoding="utf8").read()
    assert "xin\tX I_0 NZ" in text
    assert os.path.exists(tmp_path / "mfa" / "spk" / "a.lab")


def test_audio_prep(tmp_path):
    from e2e_tts_tpu.audio.wav import read_wav, write_wav
    from e2e_tts_tpu.data.audio_prep import process_file

    sr_in = 44100
    t = np.arange(sr_in)
    loud = 0.9 * np.sin(2 * np.pi * 220 * t / sr_in)
    sig = np.concatenate([np.zeros(sr_in // 2), loud, np.zeros(sr_in // 2)])
    src = str(tmp_path / "in.wav")
    dst = str(tmp_path / "out.wav")
    write_wav(src, sig.astype(np.float32), sr_in)
    process_file(src, dst, target_sr=22050, target_dbfs=-20.0)
    out, sr = read_wav(dst)
    assert sr == 22050
    # silence trimmed: output close to 1s of tone (+margins)
    assert len(out) < 1.5 * 22050
    rms_db = 20 * np.log10(np.sqrt(np.mean(out**2)))
    assert -26 < rms_db < -14


def test_metrics_harness(tmp_path):
    from e2e_tts_tpu.audio.wav import write_wav
    from e2e_tts_tpu.utils.metrics import DspProxyScorer, evaluate_directory

    d = tmp_path / "spk1"
    d.mkdir()
    t = np.arange(22050)
    good = (0.3 * np.sin(2 * np.pi * 220 * t / 22050)).astype(np.float32)
    write_wav(str(d / "good.wav"), good, 22050)
    scores = evaluate_directory(str(tmp_path), DspProxyScorer())
    assert "spk1" in scores
    assert 1.0 <= scores["spk1"] <= 5.0
    # a clean tone scores higher than clipped noise
    noise = np.clip(np.random.RandomState(0).randn(22050) * 2, -1, 1).astype(np.float32)
    write_wav(str(d / "bad.wav"), noise, 22050)
    s_good = DspProxyScorer()(good, 22050)
    s_bad = DspProxyScorer()(noise, 22050)
    assert s_good > s_bad


def test_local_storage(tmp_path):
    from e2e_tts_tpu.utils.storage import LocalStorage

    src = tmp_path / "x.wav"
    src.write_bytes(b"RIFFdata")
    store = LocalStorage(root=str(tmp_path / "media"), base_url="https://cdn.example")
    url = store.upload(str(src))
    assert url.startswith("https://cdn.example/")
    store2 = LocalStorage(root=str(tmp_path / "media2"))
    path = store2.upload(str(src))
    assert os.path.exists(path)


def test_measure_rtf():
    from e2e_tts_tpu.utils.profiling import measure_rtf

    def fake_synthesize():
        return np.zeros(22050, np.int16)

    rep = measure_rtf(fake_synthesize, warmup=0, runs=3)
    assert rep.audio_s == 3.0
    assert rep.rtf > 0


def test_sharded_checkpoint_roundtrip(tmp_path):
    """Sharded arrays checkpoint per-shard and restore directly onto the
    mesh (no host gather): save a TP-sharded pytree from the virtual
    8-device mesh, restore via restore_sharded, check placement + values."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from e2e_tts_tpu.train.checkpoint import CheckpointManager

    devs = np.array(jax.local_devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("data", "model"))
    shard_model = NamedSharding(mesh, P(None, "model"))
    repl = NamedSharding(mesh, P())

    rng = np.random.RandomState(0)
    tree = {
        "w": jax.device_put(
            jnp.asarray(rng.randn(16, 8), jnp.float32), shard_model
        ),
        "b": jax.device_put(jnp.asarray(rng.randn(8), jnp.float32), repl),
        "step": jax.device_put(jnp.asarray(7, jnp.int32), repl),
    }
    shardings = {"w": shard_model, "b": repl, "step": repl}

    ckpt = CheckpointManager(str(tmp_path / "ckpt"))
    ckpt.save(7, tree, wait=True)
    assert ckpt.latest_step() == 7

    template = jax.tree_util.tree_map(np.asarray, tree)  # host template
    restored = ckpt.restore_sharded(template, shardings)
    assert restored["w"].sharding == shard_model
    assert restored["b"].sharding.is_equivalent_to(repl, ndim=1)
    np.testing.assert_array_equal(np.asarray(restored["w"]), template["w"])
    np.testing.assert_array_equal(np.asarray(restored["b"]), template["b"])
    assert int(restored["step"]) == 7
    ckpt.close()


def test_param_histogram_logging(tmp_path):
    """AcousticLogger.log_params writes per-parameter histogram records
    (reference logger.py:70-76 parity)."""
    import json as _json

    from e2e_tts_tpu.utils.logging import AcousticLogger

    logger = AcousticLogger(str(tmp_path / "logs"))
    params = {
        "encoder": {"w": np.ones((4, 4), np.float32)},
        "bias": np.zeros(3, np.float32),
    }
    logger.log_params(10, params)
    logger.writer.flush()
    lines = [
        _json.loads(line)
        for line in open(tmp_path / "logs" / "scalars.jsonl")
        if line.strip()
    ]
    hist = [r for r in lines if r.get("kind") == "histogram"]
    tb_files = [
        f for f in os.listdir(tmp_path / "logs") if f.startswith("events")
    ]
    # either the TB event files carry the histograms or the JSONL fallback
    assert hist or tb_files
    if hist:
        tags = {r["tag"] for r in hist}
        assert "acoustic/params/encoder/w" in tags


def test_prefetch_iterator_overlaps_and_orders():
    """The async data pipeline measurably overlaps producer and consumer:
    wall time approaches max(producer, consumer), not their sum, and order
    is preserved (ROADMAP training-scale item: overlap measurement)."""
    import time

    from e2e_tts_tpu.utils.prefetch import prefetch_iterator

    n, dt = 8, 0.05

    def produce():
        for i in range(n):
            time.sleep(dt)  # host-side batch assembly stand-in
            yield i

    t0 = time.monotonic()
    seen = []
    for item in prefetch_iterator(produce(), size=2):
        time.sleep(dt)  # device-step stand-in
        seen.append(item)
    elapsed = time.monotonic() - t0

    assert seen == list(range(n))
    serial = 2 * n * dt  # what no-overlap would cost
    # overlapped pipeline should be well under serial (ideal: ~(n+1)*dt)
    assert elapsed < 0.75 * serial, (elapsed, serial)


def test_prefetch_iterator_propagates_errors():
    from e2e_tts_tpu.utils.prefetch import prefetch_iterator

    def produce():
        yield 1
        raise ValueError("boom")

    it = prefetch_iterator(produce())
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        list(it)
