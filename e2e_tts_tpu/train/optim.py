"""Optimizers and LR schedules (optax).

Reproduces the reference's ``ScheduledOptim`` math (reference:
e2e_tts/models/__init__.py:40-91): Adam with a Noam warmup/decay scaled by
encoder_hidden^-0.5, annealed by ``anneal_rate`` at each milestone, plus
global-norm gradient clipping; and the HiFi-GAN AdamW pair
(tools_for_model.py:94-140, train_config.yaml).
"""

from __future__ import annotations

from typing import Sequence

import optax

from ..config import OptimizerConfig


def noam_schedule(
    encoder_hidden: int,
    warmup_steps: int,
    anneal_steps: Sequence[int] = (),
    anneal_rate: float = 0.3,
) -> optax.Schedule:
    init_lr = encoder_hidden ** -0.5

    def schedule(step):
        import jax.numpy as jnp

        s = jnp.maximum(step, 1).astype(jnp.float32)
        lr = init_lr * jnp.minimum(s ** -0.5, s * warmup_steps ** -1.5)
        for m in anneal_steps:
            lr = lr * jnp.where(s > m, anneal_rate, 1.0)
        return lr

    return schedule


def acoustic_optimizer(cfg: OptimizerConfig, encoder_hidden: int) -> optax.GradientTransformation:
    """Noam-scheduled Adam for FastSpeech2 training."""
    sched = noam_schedule(
        encoder_hidden, cfg.warm_up_step, cfg.anneal_steps, cfg.anneal_rate
    )
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip_thresh),
        optax.scale_by_adam(b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps),
        optax.add_decayed_weights(cfg.weight_decay) if cfg.weight_decay else optax.identity(),
        optax.scale_by_schedule(sched),
        optax.scale(-1.0),
    )


def gan_optimizer(cfg: OptimizerConfig, decay_gamma: float = 0.999) -> optax.GradientTransformation:
    """AdamW with exponential LR decay for vocoder G and D.

    The reference stores lr_decay in the weight_decay slot of its yaml
    (train_config.yaml hifigan weight_decay: 0.999 — HiFi-GAN's ExponentialLR
    gamma); treated here as per-epoch LR decay, the standard HiFi-GAN recipe.
    """
    sched = optax.exponential_decay(
        init_value=cfg.learning_rate,
        transition_steps=1000,
        decay_rate=decay_gamma,
    )
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip_thresh),
        optax.scale_by_adam(b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps),
        optax.scale_by_schedule(sched),
        optax.scale(-1.0),
    )
