"""Vocoder wiring: generator family selection + waveform synthesis.

Mirrors the reference's vocoder package surface (HifiGan / iSTFT generators,
MPD/MSD discriminators, GAN losses — e2e_tts/models/vocoder/) as pure
functions over flax modules.  The iSTFT head's inverse transform runs
on-device via audio.inverse_stft instead of torch.istft.
"""

from __future__ import annotations



import jax.numpy as jnp

from ..audio.mel import inverse_stft
from ..config import Config, IstftNetConfig
from ..nn.hifigan import HifiGanGenerator, IstftNetGenerator


def build_generator(config: Config, kind: str = "hifigan", dtype=jnp.float32):
    """kind: "hifigan" | "istft" (reference picks HifiGan at serve time,
    src/api/utils.py:53)."""
    if kind == "hifigan":
        return HifiGanGenerator.from_config(config.models.hifigan, dtype=dtype)
    if kind == "istft":
        return IstftNetGenerator.from_config(config.models.istft, dtype=dtype)
    raise ValueError(f"unknown vocoder kind {kind!r}")


def istft_to_audio(spec, phase, cfg: IstftNetConfig) -> jnp.ndarray:
    """(B, bins, T), (B, bins, T) -> (B, samples)."""
    return inverse_stft(
        spec, phase,
        n_fft=cfg.gen_istft_n_fft,
        hop_length=cfg.gen_istft_hop_size,
        win_length=cfg.gen_istft_win_size,
    )


def vocode(generator, params, mel, config: Config, kind: str = "hifigan"):
    """mel (B, T, n_mels) -> audio (B, samples)."""
    if kind == "hifigan":
        return generator.apply(params, mel)
    spec, phase = generator.apply(params, mel)
    return istft_to_audio(spec, phase, config.models.istft)


def init_generator_params(generator, rng, n_mel_channels: int = 80, frames: int = 16):
    """Init vocoder params on the host CPU backend (remote-TPU init compiles
    cost minutes through a tunnel), transferring to the default device."""
    import jax

    dummy = jnp.zeros((1, frames, n_mel_channels))
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = None
    if cpu is not None and jax.default_backend() != "cpu":
        import numpy as np

        with jax.default_device(cpu):
            params = generator.init(rng, dummy)
        return jax.tree_util.tree_map(lambda x: jax.device_put(np.asarray(x)), params)
    return generator.init(rng, dummy)


def fuse_weight_norm(params):
    """Canonicalize every (v, g) weight-norm pair so that v holds the fused
    kernel and g its norm — the serving-time ``remove_weight_norm``
    equivalent (reference generator.py:55-62).  apply() is unchanged:
    w = g * v/||v|| reproduces the fused kernel exactly."""
    import jax

    def fix(tree):
        if isinstance(tree, dict):
            if "v" in tree and "g" in tree:
                v, g = tree["v"], tree["g"]
                feats = v.shape[-1]
                norm = jnp.linalg.norm(v.reshape(-1, feats), axis=0)
                w = v * (g / jnp.maximum(norm, 1e-12)).reshape(
                    (1,) * (v.ndim - 1) + (feats,)
                )
                new = dict(tree)
                new["v"] = w
                new["g"] = jnp.linalg.norm(w.reshape(-1, feats), axis=0)
                return new
            return {k: fix(v) for k, v in tree.items()}
        return tree

    return jax.tree_util.tree_map(
        lambda x: x, fix(params if isinstance(params, dict) else dict(params))
    )
