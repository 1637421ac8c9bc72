"""HiFi-GAN adversarial training step (reconstructed per SURVEY.md §3.4).

The reference ships the generators, discriminators, LS-GAN losses and the
dual-AdamW factory but no driver (tools_for_model.py:94-140, vocoder/
loss.py:4-35).  Here both optimizer updates (D then G, exactly the torch
two-step ordering) compose into ONE jittable function, with the mel
reconstruction loss computed on-device by audio.mel_spectrogram instead of a
host torch.stft round trip.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..audio.mel import MelParams, mel_spectrogram
from ..config import Config
from ..nn.discriminators import (
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
    discriminator_loss,
    feature_loss,
    generator_adv_loss,
)
from ..models.vocoder import istft_to_audio

MEL_LOSS_WEIGHT = 45.0  # HiFi-GAN lambda_mel


class VocoderTrainState(NamedTuple):
    step: jnp.ndarray
    g_params: Any
    d_params: Any          # {"mpd": ..., "msd": ...}
    g_opt_state: Any
    d_opt_state: Any


class VocoderBatch(NamedTuple):
    mel: jnp.ndarray       # (B, T, n_mels) ground-truth (or predicted) mel
    audio: jnp.ndarray     # (B, T * hop) aligned waveform segment


def make_vocoder_train_step(
    generator,
    config: Config,
    g_optimizer: optax.GradientTransformation,
    d_optimizer: optax.GradientTransformation,
    vocoder_kind: str = "hifigan",
    mpd=None,
    msd=None,
):
    mpd = mpd or MultiPeriodDiscriminator()
    msd = msd or MultiScaleDiscriminator()
    mel_params = MelParams.from_config(config.audio, loss=True)

    def generate(g_params, mel):
        if vocoder_kind == "hifigan":
            return generator.apply(g_params, mel)
        spec, phase = generator.apply(g_params, mel)
        return istft_to_audio(spec, phase, config.models.istft)

    def d_loss_fn(d_params, g_params, batch: VocoderBatch):
        y_hat = jax.lax.stop_gradient(generate(g_params, batch.mel))
        n = min(y_hat.shape[-1], batch.audio.shape[-1])
        y, y_hat = batch.audio[..., :n], y_hat[..., :n]
        pr, pf, _, _ = mpd.apply(d_params["mpd"], y, y_hat)
        sr, sf, _, _ = msd.apply(d_params["msd"], y, y_hat)
        loss_p = discriminator_loss(pr, pf)
        loss_s = discriminator_loss(sr, sf)
        return loss_p + loss_s, {"d_mpd": loss_p, "d_msd": loss_s}

    def g_loss_fn(g_params, d_params, batch: VocoderBatch):
        y_hat = generate(g_params, batch.mel)
        n = min(y_hat.shape[-1], batch.audio.shape[-1])
        y, y_hat = batch.audio[..., :n], y_hat[..., :n]

        mel_hat = mel_spectrogram(y_hat, mel_params)
        mel_ref = mel_spectrogram(y, mel_params)
        loss_mel = jnp.mean(jnp.abs(mel_hat - mel_ref))

        pr, pf, prf, pff = mpd.apply(d_params["mpd"], y, y_hat)
        sr, sf, srf, sff = msd.apply(d_params["msd"], y, y_hat)
        loss_fm = feature_loss(prf, pff) + feature_loss(srf, sff)
        loss_adv = generator_adv_loss(pf) + generator_adv_loss(sf)

        total = loss_adv + loss_fm + MEL_LOSS_WEIGHT * loss_mel
        return total, {
            "g_adv": loss_adv,
            "g_fm": loss_fm,
            "g_mel": loss_mel,
        }

    def train_step(
        state: VocoderTrainState, batch: VocoderBatch
    ) -> Tuple[VocoderTrainState, Dict[str, jnp.ndarray]]:
        # --- discriminator update (on current generator) ---
        (d_total, d_metrics), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.d_params, state.g_params, batch
        )
        d_updates, d_opt = d_optimizer.update(
            d_grads, state.d_opt_state, state.d_params
        )
        new_d_params = optax.apply_updates(state.d_params, d_updates)

        # --- generator update (against the updated discriminator) ---
        (g_total, g_metrics), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.g_params, new_d_params, batch
        )
        g_updates, g_opt = g_optimizer.update(
            g_grads, state.g_opt_state, state.g_params
        )
        new_g_params = optax.apply_updates(state.g_params, g_updates)

        metrics = {"d_total": d_total, "g_total": g_total}
        metrics.update(d_metrics)
        metrics.update(g_metrics)
        new_state = VocoderTrainState(
            step=state.step + 1,
            g_params=new_g_params,
            d_params=new_d_params,
            g_opt_state=g_opt,
            d_opt_state=d_opt,
        )
        return new_state, metrics

    return train_step


def init_vocoder_train_state(
    generator,
    config: Config,
    g_optimizer,
    d_optimizer,
    rng,
    segment_frames: int = 32,
    mpd=None,
    msd=None,
) -> VocoderTrainState:
    k1, k2, k3 = jax.random.split(rng, 3)
    n_mels = config.audio.mel.channels
    hop = config.audio.stft.hop_length
    mel = jnp.zeros((1, segment_frames, n_mels))
    audio = jnp.zeros((1, segment_frames * hop))

    g_params = generator.init(k1, mel)
    mpd = mpd or MultiPeriodDiscriminator()
    msd = msd or MultiScaleDiscriminator()
    d_params = {
        "mpd": mpd.init(k2, audio, audio),
        "msd": msd.init(k3, audio, audio),
    }
    return VocoderTrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_params,
        d_params=d_params,
        g_opt_state=g_optimizer.init(g_params),
        d_opt_state=d_optimizer.init(d_params),
    )
