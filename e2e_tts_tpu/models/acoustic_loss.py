"""FastSpeech2 training losses, fully jittable.

Covers both duration modes of the reference
(unsupervised loss: unsupervised_fastspeech2/loss.py:8-225;
supervised loss: supervised_fastspeech2/loss.py:6-121):

- mel + postnet masked L1;
- duration MSE at phoneme / word / sentence granularity (word pooling via
  one-hot matmul instead of the reference's Python loops);
- alignment losses: forward-sum CTC (vectorized, ops.ctc) + soft/hard KL
  ("bin") with warmup schedule;
- pitch: f0 MSE + UV BCE (use_uv) or plain MSE;
- energy MSE.

All reductions are masked means, matching masked_select + mean semantics.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..config import LossConfig
from ..ops import forward_sum_loss, sum_by_words


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    mask = mask.astype(x.dtype)
    while mask.ndim < x.ndim:
        mask = mask[..., None]
    denom = jnp.maximum(jnp.sum(mask) * (x.size / mask.size), 1.0)
    return jnp.sum(x * mask) / denom


def duration_losses(
    log_duration_predictions: jnp.ndarray,  # (B, L)
    duration_targets: jnp.ndarray,          # (B, L)
    word_ids: jnp.ndarray,                  # (B, L) word index per phoneme
    n_words: int,
    txt_mask: jnp.ndarray,                  # (B, L) True=valid
    loss_cfg: LossConfig,
) -> Dict[str, jnp.ndarray]:
    nonpad = txt_mask.astype(jnp.float32)
    dur_t = jax.lax.stop_gradient(duration_targets.astype(jnp.float32)) * nonpad
    dur_p = jnp.clip(jnp.exp(log_duration_predictions) - 1.0, min=0.0)

    out = {}
    # phoneme: plain mean over (B, L) incl. padding — both sides are 0 there
    # (reference loss.py:28-35)
    out["pdur"] = jnp.mean((log_duration_predictions - jnp.log(dur_t + 1.0)) ** 2)

    if loss_cfg.wdur_lambda > 0:
        wp = sum_by_words(dur_p * nonpad, word_ids, n_words)
        wt = sum_by_words(dur_t, word_ids, n_words)
        werr = (jnp.log(wp + 1.0) - jnp.log(wt + 1.0)) ** 2
        # deliberate deviation: the reference masks by PREDICTED word
        # duration (loss.py:46, `word_duration_predictions > 0`), which
        # lets a word collapsed to zero predicted frames escape this loss
        # entirely; masking by the TARGET keeps the gradient that pushes
        # it back.  Padding word slots have wt == 0 either way.
        wmask = (wt > 0).astype(jnp.float32)
        out["wdur"] = jnp.sum(werr * wmask) / jnp.maximum(jnp.sum(wmask), 1.0)
    else:
        out["wdur"] = jnp.zeros(())

    if loss_cfg.sdur_lambda > 0:
        sp, st = dur_p.sum(-1), dur_t.sum(-1)
        out["sdur"] = jnp.mean((jnp.log(sp + 1.0) - jnp.log(st + 1.0)) ** 2)
    else:
        out["sdur"] = jnp.zeros(())
    return out


def align_losses(
    attn_soft: jnp.ndarray,
    attn_hard: jnp.ndarray,
    attn_logprob: jnp.ndarray,
    txt_lens: jnp.ndarray,
    mel_lens: jnp.ndarray,
    step: jnp.ndarray,
    loss_cfg: LossConfig,
) -> Dict[str, jnp.ndarray]:
    out = {"ctc": forward_sum_loss(attn_logprob, txt_lens, mel_lens)}
    # bin loss: -mean log soft prob over hard-aligned cells, weighted by the
    # warmup ramp (reference loss.py:64-75, 218-225)
    w = jnp.clip(
        (step - loss_cfg.binarization_loss_enable_steps)
        / loss_cfg.binarization_loss_warmup_steps,
        0.0,
        1.0,
    )
    hard = jax.lax.stop_gradient(attn_hard)
    log_soft = jnp.log(jnp.clip(attn_soft, min=1e-12))
    out["bin"] = (
        -jnp.sum(log_soft * hard) / jnp.maximum(jnp.sum(hard), 1.0)
    ) * w
    return out


def pitch_losses(
    pitch_predictions,
    pitch_targets,
    mask: jnp.ndarray,
    use_uv: bool,
) -> Dict[str, jnp.ndarray]:
    out = {}
    if use_uv:
        f0_t = jax.lax.stop_gradient(pitch_targets["f0"])
        uv_t = jax.lax.stop_gradient(pitch_targets["uv"])
        nonpad = mask.astype(jnp.float32)

        uv_p = pitch_predictions[..., 1]
        bce = jnp.maximum(uv_p, 0) - uv_p * uv_t + jnp.log1p(jnp.exp(-jnp.abs(uv_p)))
        out["uv"] = jnp.sum(bce * nonpad) / jnp.maximum(jnp.sum(nonpad), 1.0)

        voiced = nonpad * (uv_t == 0)
        f0_p = pitch_predictions[..., 0]
        out["f0"] = jnp.sum(((f0_p - f0_t) ** 2) * voiced) / jnp.maximum(
            jnp.sum(voiced), 1.0
        )
    else:
        t = jax.lax.stop_gradient(pitch_targets)
        out["pitch"] = masked_mean((pitch_predictions - t) ** 2, mask)
    return out


def energy_loss(energy_predictions, energy_targets, mask) -> jnp.ndarray:
    t = jax.lax.stop_gradient(energy_targets)
    return masked_mean((energy_predictions - t) ** 2, mask)


def mel_losses(
    mel_predictions, postnet_mel_predictions, mel_targets, mel_mask
) -> Dict[str, jnp.ndarray]:
    t = jax.lax.stop_gradient(mel_targets)
    return {
        "mel": masked_mean(jnp.abs(mel_predictions - t), mel_mask),
        "postnet": masked_mean(jnp.abs(postnet_mel_predictions - t), mel_mask),
    }


@dataclass(frozen=True)
class AcousticLossWeights:
    pdur: float = 1.0
    wdur: float = 1.0
    sdur: float = 1.0


def fastspeech2_loss(
    outputs: Dict,
    mel_target: jnp.ndarray,
    txt_lens: jnp.ndarray,
    mel_lens: jnp.ndarray,
    word_ids: jnp.ndarray,
    n_words: int,
    step: jnp.ndarray,
    loss_cfg: LossConfig,
    use_uv: bool = True,
    learn_alignment: bool = True,
    duration_target: Optional[jnp.ndarray] = None,
    pitch_level_mask=None,
    energy_level_mask=None,
) -> Dict[str, jnp.ndarray]:
    """Assemble the full loss dict + scalar total from model outputs."""
    txt_mask = outputs["txt_mask"]
    mel_mask = outputs["mel_mask"]

    losses: Dict[str, jnp.ndarray] = {}
    losses.update(
        mel_losses(outputs["mel"], outputs["postnet_mel"], mel_target, mel_mask)
    )

    dur_target = (
        duration_target if duration_target is not None else outputs["duration_rounded"]
    )
    losses.update(
        duration_losses(
            outputs["log_duration_prediction"], dur_target, word_ids, n_words,
            txt_mask, loss_cfg,
        )
    )

    if learn_alignment and outputs["attn_soft"] is not None:
        losses.update(
            align_losses(
                outputs["attn_soft"], outputs["attn_hard"],
                outputs["attn_logprob"], txt_lens, mel_lens, step, loss_cfg,
            )
        )

    p_mask = pitch_level_mask if pitch_level_mask is not None else txt_mask
    e_mask = energy_level_mask if energy_level_mask is not None else txt_mask
    losses.update(
        pitch_losses(outputs["pitch_prediction"], outputs["pitch_target"], p_mask, use_uv)
    )
    losses["energy"] = energy_loss(
        outputs["energy_prediction"], outputs["energy_target"], e_mask
    )

    total = (
        losses["mel"]
        + losses["postnet"]
        + loss_cfg.pdur_lambda * losses["pdur"]
        + loss_cfg.wdur_lambda * losses["wdur"]
        + loss_cfg.sdur_lambda * losses["sdur"]
        + losses.get("ctc", 0.0)
        + losses.get("bin", 0.0)
        + losses.get("uv", 0.0)
        + losses.get("f0", 0.0)
        + losses.get("pitch", 0.0)
        + losses["energy"]
    )
    losses["total"] = total
    return losses
