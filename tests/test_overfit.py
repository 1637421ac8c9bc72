"""Learning-dynamics sanity: a tiny model overfits one utterance.

This goes beyond the 8-step loss-decrease check — it validates that the full
unsupervised pipeline (aligner + MAS + CTC + variance losses + Noam Adam)
actually converges toward a target, i.e. gradients are not just finite but
useful.
"""

import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
import numpy as np

from e2e_tts_tpu.config import default_config
from e2e_tts_tpu.models import FastSpeech2
from e2e_tts_tpu.nn import FeatureStats
from e2e_tts_tpu.text import symbols, text_to_sequence
from e2e_tts_tpu.train import (
    AcousticBatch,
    acoustic_optimizer,
    init_train_state,
    make_train_step,
)


def test_overfit_single_utterance():
    cfg = default_config()
    fs2 = cfg.models.fastspeech2
    small = fs2.replace(
        encoder_layers=2, decoder_layers=2, encoder_hidden=48, decoder_hidden=48,
        building_block=fs2.building_block.replace(
            transformer=fs2.building_block.transformer.replace(
                conv_filter_size=96, encoder_dropout=0.0, decoder_dropout=0.0
            )
        ),
        variance=fs2.variance.replace(
            duration_modelling=fs2.variance.duration_modelling.replace(
                binarization_start_steps=10  # switch to hard expansion early
            ),
            variance_predictor=fs2.variance.variance_predictor.replace(dropout=0.0),
        ),
        postnet=fs2.postnet.replace(embedding_dim=48, conv_layers=2),
    )
    cfg = cfg.replace(models=cfg.models.replace(fastspeech2=small))

    model = FastSpeech2(
        config=cfg.models.fastspeech2,
        n_symbols=len(symbols),
        n_speakers=1,
        n_mel_channels=80,
        stats=FeatureStats(),
    )
    opt = acoustic_optimizer(
        cfg.train.fastspeech2_optimizer.replace(warm_up_step=20), 48
    )
    step_fn = jax.jit(make_train_step(model, cfg, opt, n_words=8))
    state = init_train_state(model, opt, jax.random.PRNGKey(0))

    # one synthetic utterance: structured target mel (stripes per phoneme)
    ids = text_to_sequence("xin chào việt nam")
    L = len(ids)
    frames_per = 4
    T = L * frames_per
    rng = np.random.RandomState(0)
    base = rng.randn(L, 80) * 0.5
    mel = np.repeat(base, frames_per, axis=0)  # (T, 80) piecewise-constant

    batch = AcousticBatch(
        speakers=jnp.zeros((1,), jnp.int32),
        texts=jnp.asarray([ids], jnp.int32),
        txt_lens=jnp.asarray([L], jnp.int32),
        word_ids=jnp.asarray(np.minimum(np.arange(L) // 3, 7))[None],
        mel=jnp.asarray(mel[None], jnp.float32),
        mel_lens=jnp.asarray([T], jnp.int32),
        attn_prior=jnp.full((1, T, L), 1.0 / L, jnp.float32),
        duration_target=jnp.zeros((1, L), jnp.float32),
        f0=jnp.asarray(rng.randn(1, T) * 0.3, jnp.float32),
        uv=jnp.zeros((1, T), jnp.float32),
        pitch=jnp.zeros((1, T), jnp.float32),
        energy=jnp.asarray(np.abs(rng.randn(1, T)), jnp.float32),
    )

    rng_j = jax.random.PRNGKey(1)
    first_mel = None
    for i in range(120):
        rng_j, sub = jax.random.split(rng_j)
        state, metrics = step_fn(state, batch, sub)
        if i == 4:
            first_mel = float(metrics["mel"])
    final_mel = float(metrics["mel"])
    assert np.isfinite(final_mel)
    # mel L1 must drop substantially when overfitting one utterance
    # (measured ~0.57x after 120 steps; 0.7 leaves margin across seeds)
    assert final_mel < 0.7 * first_mel, (first_mel, final_mel)
    assert np.isfinite(float(metrics["ctc"]))
