"""Acoustic-model training step (jittable, mesh-shardable).

The reference ships losses/optimizers/dataloaders but no train driver
(SURVEY.md §0); this is the reconstructed step of §3.3, as one pure function
suitable for pjit over a device mesh: batch arrays shard over the "data"
axis, parameters are replicated or tensor-sharded per parallel.sharding
rules, and XLA inserts the gradient psums.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..models.acoustic import FastSpeech2
from ..models.acoustic_loss import fastspeech2_loss


class AcousticTrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


class AcousticBatch(NamedTuple):
    """One padded training batch (the reference's 11-tuple,
    src/tools/dataloader.py:239-327, as named fields)."""

    speakers: jnp.ndarray        # (B,)
    texts: jnp.ndarray           # (B, L)
    txt_lens: jnp.ndarray        # (B,)
    word_ids: jnp.ndarray        # (B, L)
    mel: jnp.ndarray             # (B, T, n_mels)
    mel_lens: jnp.ndarray        # (B,)
    attn_prior: jnp.ndarray      # (B, T, L) (unsupervised) or zeros
    duration_target: jnp.ndarray # (B, L) (supervised) or zeros
    f0: jnp.ndarray              # (B, T)
    uv: jnp.ndarray              # (B, T)
    pitch: jnp.ndarray           # (B, T)
    energy: jnp.ndarray          # (B, T)


def make_train_step(
    model: FastSpeech2,
    config: Config,
    optimizer: optax.GradientTransformation,
    n_words: int,
):
    """Returns train_step(state, batch, rng) -> (state, metrics)."""
    learn_alignment = config.models.fastspeech2.variance.duration_modelling.learn_alignment
    use_uv = config.models.fastspeech2.variance.variance_embedding.use_uv
    loss_cfg = config.train.fastspeech2_loss

    def loss_fn(params, batch_stats, batch: AcousticBatch, step, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        kw = dict(
            speakers=batch.speakers,
            texts=batch.texts,
            txt_lens=batch.txt_lens,
            max_mel_len=batch.mel.shape[1],
            mel=batch.mel,
            mel_lens=batch.mel_lens,
            step=step,
            train=True,
        )
        if use_uv:
            kw["pitch_target"] = {"f0": batch.f0, "uv": batch.uv}
        else:
            kw["pitch_target"] = batch.pitch
        kw["energy_target"] = batch.energy
        if learn_alignment:
            kw["attn_prior"] = batch.attn_prior
        else:
            kw["duration_target"] = batch.duration_target

        out, mutated = model.apply(
            variables, **kw, rngs={"dropout": rng}, mutable=["batch_stats"]
        )
        losses = fastspeech2_loss(
            out,
            mel_target=batch.mel,
            txt_lens=batch.txt_lens,
            mel_lens=batch.mel_lens,
            word_ids=batch.word_ids,
            n_words=n_words,
            step=step,
            loss_cfg=loss_cfg,
            use_uv=use_uv,
            learn_alignment=learn_alignment,
            duration_target=None if learn_alignment else batch.duration_target,
        )
        return losses["total"], (losses, mutated["batch_stats"])

    def train_step(
        state: AcousticTrainState, batch: AcousticBatch, rng
    ) -> Tuple[AcousticTrainState, Dict[str, jnp.ndarray]]:
        (_, (losses, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, state.step, rng
        )
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = AcousticTrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
        )
        metrics = {k: v for k, v in losses.items()}
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return train_step


def init_train_state(
    model: FastSpeech2, optimizer: optax.GradientTransformation, rng
) -> AcousticTrainState:
    from ..models.acoustic import init_acoustic_variables

    variables = init_acoustic_variables(model, rng)
    return AcousticTrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=optimizer.init(variables["params"]),
    )
