"""Model-level tests: FastSpeech2 forward/inference shapes, vocoder output
length contracts, loss finiteness, gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e2e_tts_tpu.config import default_config
from e2e_tts_tpu.models import FastSpeech2, build_generator, fastspeech2_loss, vocode
from e2e_tts_tpu.nn import FeatureStats
from e2e_tts_tpu.text import symbols

CFG = default_config()
STATS = FeatureStats()

B, L, T_MEL, N_MELS = 2, 16, 96, 80


def small_config():
    fs2 = CFG.models.fastspeech2.replace(
        encoder_layers=2, decoder_layers=2, encoder_hidden=64, decoder_hidden=64,
        building_block=CFG.models.fastspeech2.building_block.replace(
            transformer=CFG.models.fastspeech2.building_block.transformer.replace(
                conv_filter_size=128
            )
        ),
        postnet=CFG.models.fastspeech2.postnet.replace(embedding_dim=64),
    )
    return fs2


@pytest.fixture(scope="module")
def model_and_params():
    model = FastSpeech2(
        config=small_config(),
        n_symbols=len(symbols),
        n_speakers=4,
        n_mel_channels=N_MELS,
        stats=STATS,
    )
    rng = jax.random.PRNGKey(0)
    texts, txt_lens, mel, mel_lens, prior, f0, uv, energy, _ = _training_batch()
    # init in training mode so aligner/postnet-BN variables all exist
    variables = model.init(
        {"params": rng, "dropout": jax.random.PRNGKey(9)},
        speakers=jnp.zeros((B,), jnp.int32),
        texts=texts,
        txt_lens=txt_lens,
        max_mel_len=T_MEL,
        mel=mel,
        mel_lens=mel_lens,
        attn_prior=prior,
        pitch_target={"f0": f0, "uv": uv},
        energy_target=energy,
        step=jnp.asarray(0),
        train=True,
    )
    return model, variables


def _training_batch(rng=0):
    r = np.random.RandomState(rng)
    texts = jnp.asarray(r.randint(4, len(symbols), size=(B, L)), jnp.int32)
    txt_lens = jnp.array([L, L - 5])
    mel = jnp.asarray(r.randn(B, T_MEL, N_MELS), jnp.float32)
    mel_lens = jnp.array([T_MEL, T_MEL - 20])
    prior = jnp.asarray(np.abs(r.rand(B, T_MEL, L)) + 1e-3, jnp.float32)
    f0 = jnp.asarray(r.randn(B, T_MEL), jnp.float32)
    uv = jnp.asarray((r.rand(B, T_MEL) > 0.7).astype(np.float32))
    energy = jnp.asarray(np.abs(r.randn(B, T_MEL) * 10 + 30), jnp.float32)
    word_ids = jnp.asarray(np.minimum(np.arange(L) // 2, 7))[None].repeat(B, 0)
    return texts, txt_lens, mel, mel_lens, prior, f0, uv, energy, word_ids


def test_inference_shapes(model_and_params):
    model, variables = model_and_params
    texts = jnp.ones((B, L), jnp.int32) * 7
    out = model.apply(
        variables,
        speakers=jnp.zeros((B,), jnp.int32),
        texts=texts,
        txt_lens=jnp.array([L, L - 4]),
        max_mel_len=T_MEL,
    )
    assert out["mel"].shape == (B, T_MEL, N_MELS)
    assert out["postnet_mel"].shape == (B, T_MEL, N_MELS)
    assert out["duration_rounded"].shape == (B, L)
    assert out["mel_lens"].shape == (B,)
    assert np.isfinite(np.asarray(out["postnet_mel"])).all()


def test_duration_control(model_and_params):
    model, variables = model_and_params
    texts = jnp.ones((B, L), jnp.int32) * 7
    kw = dict(
        speakers=jnp.zeros((B,), jnp.int32),
        texts=texts,
        txt_lens=jnp.array([L, L]),
        max_mel_len=T_MEL,
    )
    out1 = model.apply(variables, **kw, d_control=1.0)
    out2 = model.apply(variables, **kw, d_control=2.0)
    assert np.asarray(out2["mel_lens"]).sum() >= np.asarray(out1["mel_lens"]).sum()


def test_training_forward_and_loss(model_and_params):
    model, variables = model_and_params
    texts, txt_lens, mel, mel_lens, prior, f0, uv, energy, word_ids = _training_batch()
    out, mutated = model.apply(
        variables,
        speakers=jnp.zeros((B,), jnp.int32),
        texts=texts,
        txt_lens=txt_lens,
        max_mel_len=T_MEL,
        mel=mel,
        mel_lens=mel_lens,
        attn_prior=prior,
        pitch_target={"f0": f0, "uv": uv},
        energy_target=energy,
        step=jnp.asarray(10000),
        train=True,
        rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"],
    )
    assert out["attn_soft"].shape == (B, T_MEL, L)
    assert out["attn_hard"].shape == (B, T_MEL, L)
    # MAS durations cover the mel exactly
    durs = np.asarray(out["duration_rounded"])
    for b, (tl, ml) in enumerate(zip(np.asarray(txt_lens), np.asarray(mel_lens))):
        assert durs[b, :tl].sum() == ml

    losses = fastspeech2_loss(
        out,
        mel_target=mel,
        txt_lens=txt_lens,
        mel_lens=mel_lens,
        word_ids=word_ids,
        n_words=8,
        step=jnp.asarray(10000),
        loss_cfg=CFG.train.fastspeech2_loss,
    )
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert float(losses["total"]) > 0


def test_gradients_flow(model_and_params):
    model, variables = model_and_params
    texts, txt_lens, mel, mel_lens, prior, f0, uv, energy, word_ids = _training_batch(1)

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables.get("batch_stats", {})},
            speakers=jnp.zeros((B,), jnp.int32),
            texts=texts,
            txt_lens=txt_lens,
            max_mel_len=T_MEL,
            mel=mel,
            mel_lens=mel_lens,
            attn_prior=prior,
            pitch_target={"f0": f0, "uv": uv},
            energy_target=energy,
            step=jnp.asarray(20000),
            train=True,
            rngs={"dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats"],
        )
        return fastspeech2_loss(
            out, mel, txt_lens, mel_lens, word_ids, 8,
            jnp.asarray(20000), CFG.train.fastspeech2_loss,
        )["total"]

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # encoder must receive gradient
    gnorm = sum(float(jnp.abs(l).sum()) for l in leaves)
    assert gnorm > 0


def test_hifigan_output_length():
    cfg = default_config()
    gen = build_generator(cfg, "hifigan")
    mel = jnp.zeros((1, 32, 80))
    params = gen.init(jax.random.PRNGKey(0), mel)
    audio = gen.apply(params, mel)
    assert audio.shape == (1, 32 * 256)
    assert np.abs(np.asarray(audio)).max() <= 1.0


def test_istft_vocoder_output_length():
    cfg = default_config()
    gen = build_generator(cfg, "istft")
    mel = jnp.zeros((1, 32, 80))
    params = gen.init(jax.random.PRNGKey(0), mel)
    audio = vocode(gen, params, mel, cfg, kind="istft")
    # 2x8 upsampling then hop 4 iSTFT -> 32*64*4 = 32*256 samples (+/- edge)
    assert abs(audio.shape[-1] - 32 * 256) <= cfg.models.istft.gen_istft_n_fft
