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
    """Returns train_step(state, batch, rng) -> (state, metrics).

    ``config.train.grad_acc_step > 1`` splits the batch into that many
    microbatches, accumulates gradients across them with lax.scan, and
    applies ONE optimizer update — same effective batch at 1/N activation
    memory (the reference declares grad_acc_step in train_config.yaml but
    never ships a loop that honors it).

    Mixed precision is orthogonal: construct the model with
    ``dtype=jnp.bfloat16`` (config.train.mixed_precision) and flax casts
    weights to bf16 per-op while the master params — and therefore the
    gradients and Adam moments — stay f32.
    """
    learn_alignment = config.models.fastspeech2.variance.duration_modelling.learn_alignment
    use_uv = config.models.fastspeech2.variance.variance_embedding.use_uv
    loss_cfg = config.train.fastspeech2_loss
    grad_accum = max(int(config.train.grad_acc_step), 1)

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

    def _grads_of(params, batch_stats, batch, step, rng):
        return jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, batch, step, rng
        )

    def train_step(
        state: AcousticTrainState, batch: AcousticBatch, rng
    ) -> Tuple[AcousticTrainState, Dict[str, jnp.ndarray]]:
        if grad_accum == 1:
            (_, (losses, new_bs)), grads = _grads_of(
                state.params, state.batch_stats, batch, state.step, rng
            )
        else:
            B = batch.speakers.shape[0]
            if B % grad_accum:
                raise ValueError(
                    f"batch size {B} not divisible by grad_acc_step {grad_accum}"
                )
            micro = jax.tree_util.tree_map(
                lambda x: x.reshape(grad_accum, B // grad_accum, *x.shape[1:]),
                batch,
            )
            rngs = jax.random.split(rng, grad_accum)
            first = jax.tree_util.tree_map(lambda x: x[0], micro)
            (_, (losses, bs)), grads = _grads_of(
                state.params, state.batch_stats, first, state.step, rngs[0]
            )

            def body(carry, xs):
                gacc, lacc, bs = carry
                mb, r = xs
                (_, (losses, new_bs)), g = _grads_of(
                    state.params, bs, mb, state.step, r
                )
                gacc = jax.tree_util.tree_map(jnp.add, gacc, g)
                lacc = jax.tree_util.tree_map(jnp.add, lacc, losses)
                return (gacc, lacc, new_bs), None

            rest = jax.tree_util.tree_map(lambda x: x[1:], micro)
            (grads, losses, new_bs), _ = jax.lax.scan(
                body, (grads, losses, bs), (rest, rngs[1:])
            )
            inv = 1.0 / grad_accum
            grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
            losses = jax.tree_util.tree_map(lambda v: v * inv, losses)

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


def make_eval_step(model: FastSpeech2, config: Config, n_words: int):
    """Returns eval_step(state, batch) -> metrics: a deterministic
    validation pass (dropout off, batch-norm running stats, no gradients,
    no optimizer math) — roughly half the cost of reusing the train step
    and correct-by-construction eval semantics."""
    learn_alignment = config.models.fastspeech2.variance.duration_modelling.learn_alignment
    use_uv = config.models.fastspeech2.variance.variance_embedding.use_uv
    loss_cfg = config.train.fastspeech2_loss

    def eval_step(state: AcousticTrainState, batch: AcousticBatch):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        kw = dict(
            speakers=batch.speakers,
            texts=batch.texts,
            txt_lens=batch.txt_lens,
            max_mel_len=batch.mel.shape[1],
            mel=batch.mel,
            mel_lens=batch.mel_lens,
            step=state.step,
            train=False,
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

        out = model.apply(variables, **kw)
        losses = fastspeech2_loss(
            out,
            mel_target=batch.mel,
            txt_lens=batch.txt_lens,
            mel_lens=batch.mel_lens,
            word_ids=batch.word_ids,
            n_words=n_words,
            step=state.step,
            loss_cfg=loss_cfg,
            use_uv=use_uv,
            learn_alignment=learn_alignment,
            duration_target=None if learn_alignment else batch.duration_target,
        )
        return losses

    return eval_step


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
