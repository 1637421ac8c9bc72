"""FastSpeech2 acoustic model (supervised + unsupervised duration modes).

One model covers the reference's two ~95%-identical trees
(reference: e2e_tts/models/acoustic/{supervised,unsupervised}_fastspeech2/
model.py): the duration source — MFA targets vs. the on-device aligner+MAS —
is a config/argument switch, not a copy of the network.

Encoder/decoder building blocks are selected from a registry by
``building_block.block_type`` (reference model.py:24-33 uses conditional
imports); every block family shares the (x, mask) -> x contract.
"""

from __future__ import annotations

from contextlib import nullcontext

import os

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..config import FastSpeech2Config
from ..nn.postnet import Postnet
from ..nn.variance import FeatureStats, VarianceAdaptor
from ..ops import sequence_mask
from .blocks import build_decoder, build_encoder


_INIT_CACHE_DIR = os.environ.get(
    "E2E_TTS_INIT_CACHE", os.path.join(os.path.dirname(__file__), "..", "..", ".cache", "init")
)


def _rng_key_bytes(rng) -> bytes:
    """Cache-key bytes for an init rng WITHOUT any accelerator operation.

    The round-2 benchmark crash (BENCH_r02.json, rc=1) was this function's
    predecessor calling ``np.asarray(rng)`` on a TPU-resident key as the
    process's first device op and hitting FAILED_PRECONDITION.  Ints hash
    host-side; CPU-committed arrays are a host copy; only a key that already
    lives on an accelerator falls back to a device fetch (no init call path
    in this package creates one — see ``cpu_rng_keys``).
    """
    import jax

    if isinstance(rng, (int, np.integer)):
        return str(int(rng)).encode()
    arr = rng
    if hasattr(jax.random, "key_data") and getattr(rng, "dtype", None) is not None:
        if jax.dtypes.issubdtype(rng.dtype, jax.dtypes.prng_key):
            arr = jax.random.key_data(rng)
    devices = getattr(arr, "devices", None)
    if isinstance(arr, jnp.ndarray) and devices is not None:
        platforms = {d.platform for d in arr.devices()}
        if platforms and platforms != {"cpu"}:  # pragma: no cover - defensive
            arr = jax.device_get(arr)
    return np.asarray(arr).tobytes()


def cpu_rng_keys(seed: int, num: int = 1):
    """PRNG keys born on the host CPU backend.

    ``jax.random.PRNGKey`` eagerly runs threefry on the default device; when
    that device is a remote TPU this makes key *creation* the process's first
    accelerator op — fragile (stale-process FAILED_PRECONDITION) and slow
    through a tunnel.  All init paths make their keys here instead.
    """
    import jax

    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = None
    ctx = jax.default_device(cpu) if cpu is not None else nullcontext()
    with ctx:
        key = jax.random.PRNGKey(seed)
        return key if num == 1 else tuple(jax.random.split(key, num))


def init_acoustic_variables(
    model: "FastSpeech2", rng, tiny_len: int = 16, tiny_mel: int = 32,
    use_cache: bool = True,
):
    """Canonical variable initialization covering every submodule.

    Always inits in training mode (with a dummy mel + aligner prior) so the
    aligner and postnet batch-norm variables exist regardless of how the
    model is later used; serving, checkpoints, and converters all share this
    structure.

    ``rng`` may be a PRNG key or a plain int seed (the seed form never
    touches any device for cache-key derivation — preferred for serving).

    Init math runs on the host CPU backend (compiling the init graph through
    a remote-TPU tunnel costs minutes; the arrays transfer on first use).
    """
    import jax

    import jax as _jax

    def _do_init(init_rng):
        B, L, T = 1, tiny_len, tiny_mel
        kw = dict(
            speakers=jnp.zeros((B,), jnp.int32),
            texts=jnp.ones((B, L), jnp.int32),
            txt_lens=jnp.array([L]),
            max_mel_len=T,
            mel=jnp.zeros((B, T, model.n_mel_channels)),
            mel_lens=jnp.array([T]),
            pitch_target={"f0": jnp.zeros((B, T)), "uv": jnp.zeros((B, T))},
            energy_target=jnp.zeros((B, T)),
            step=jnp.asarray(0),
            train=True,
        )
        if model.config.variance.duration_modelling.learn_alignment:
            kw["attn_prior"] = jnp.full((B, T, L), 1.0 / L)
        else:
            kw["duration_target"] = jnp.full((B, L), T // L, jnp.float32)
        return model.init(
            {"params": init_rng, "dropout": _jax.random.PRNGKey(0)}, **kw
        )

    rng_bytes = _rng_key_bytes(rng)
    if isinstance(rng, (int, np.integer)):
        rng = cpu_rng_keys(int(rng))

    cache_path = None
    if use_cache and jax.default_backend() != "cpu":
        import hashlib

        from flax import serialization

        key = hashlib.sha1(
            repr(
                (
                    model.config,
                    model.n_symbols,
                    model.n_speakers,
                    model.n_mel_channels,
                    rng_bytes,
                )
            ).encode()
        ).hexdigest()[:16]
        cache_path = os.path.join(_INIT_CACHE_DIR, f"acoustic_{key}.msgpack")
        if os.path.exists(cache_path):
            with open(cache_path, "rb") as f:
                host = serialization.msgpack_restore(f.read())
            return jax.device_put(host)

    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = None
    if cpu is not None and jax.default_backend() != "cpu":
        # one jitted CPU program instead of thousands of eager dispatches
        # (which would each round-trip a remote-TPU tunnel); the rng must be
        # committed to cpu or jit would follow it back to the TPU
        with jax.default_device(cpu):
            variables = jax.jit(_do_init)(jax.device_put(rng, cpu))
            host = jax.tree_util.tree_map(np.asarray, variables)
        if cache_path is not None:
            from flax import serialization

            os.makedirs(os.path.dirname(cache_path), exist_ok=True)
            with open(cache_path, "wb") as f:
                f.write(serialization.msgpack_serialize(host))
        return jax.device_put(host)
    return _do_init(rng)


class FastSpeech2(nn.Module):
    config: FastSpeech2Config
    n_symbols: int
    n_speakers: int
    n_mel_channels: int
    stats: FeatureStats
    # Pallas fused attention for the transformer family (fwd + custom VJP)
    use_flash: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        self.encoder = build_encoder(
            cfg, self.n_symbols, dtype=self.dtype, use_flash=self.use_flash
        )
        self.decoder = build_decoder(cfg, dtype=self.dtype, use_flash=self.use_flash)

        vp = cfg.variance.variance_predictor
        ve = cfg.variance.variance_embedding
        dm = cfg.variance.duration_modelling
        self.variance_adaptor = VarianceAdaptor(
            n_mel_channels=self.n_mel_channels,
            hidden_dim=cfg.encoder_hidden,
            stats=self.stats,
            predictor_grad=vp.predictor_grad,
            filter_size=vp.filter_size,
            dropout=vp.dropout,
            dur_layers=vp.dur_predictor_layers,
            dur_kernel=vp.dur_predictor_kernel,
            pit_layers=vp.pit_predictor_layers,
            pit_kernel=vp.pit_predictor_kernel,
            ener_layers=vp.ener_predictor_layers,
            ener_kernel=vp.ener_predictor_kernel,
            ffn_padding=vp.ffn_padding,
            use_uv=ve.use_uv,
            n_bins=ve.n_bins,
            f0_bins=ve.f0_bins,
            pitch_feature=ve.pitch_feature,
            pitch_quantization=ve.pitch_quantization,
            energy_feature=ve.energy_feature,
            energy_quantization=ve.energy_quantization,
            learn_alignment=dm.learn_alignment,
            aligner_temperature=dm.aligner_temperature,
            binarization_start_steps=dm.binarization_start_steps,
            dtype=self.dtype,
        )
        self.mel_linear = nn.Dense(self.n_mel_channels, dtype=jnp.float32)
        self.postnet = Postnet(
            n_mel_channels=self.n_mel_channels,
            embedding_dim=cfg.postnet.embedding_dim,
            n_layers=cfg.postnet.conv_layers,
            kernel_size=cfg.postnet.kernel_size,
            dtype=jnp.float32,
        )
        self.speaker_emb = nn.Embed(self.n_speakers, cfg.encoder_hidden)

    def __call__(
        self,
        speakers,               # (B,)
        texts,                  # (B, L)
        txt_lens,               # (B,)
        max_mel_len: int,
        mel=None,               # (B, T, n_mels) training target
        mel_lens=None,
        attn_prior=None,        # (B, T, L)
        duration_target=None,   # (B, L) supervised mode
        pitch_target=None,
        energy_target=None,
        step=None,
        p_control: float = 1.0,
        e_control: float = 1.0,
        d_control: float = 1.0,
        train: bool = False,
    ):
        txt_mask = sequence_mask(txt_lens, texts.shape[1])
        x, txt_emb = self.encoder(texts, txt_mask, deterministic=not train)
        spk = self.speaker_emb(speakers).astype(self.dtype)

        va = self.variance_adaptor(
            x,
            txt_emb,
            txt_lens,
            txt_mask,
            spk,
            max_mel_len,
            mel=mel,
            mel_lens=mel_lens,
            attn_prior=attn_prior,
            duration_target=duration_target,
            pitch_target=pitch_target,
            energy_target=energy_target,
            step=step,
            p_control=p_control,
            e_control=e_control,
            d_control=d_control,
            deterministic=not train,
        )

        dec, mel_mask = self.decoder(va["x"], va["mel_mask"], deterministic=not train)
        mel_out = self.mel_linear(dec.astype(jnp.float32))
        postnet_out = self.postnet(mel_out, train=train) + mel_out

        return {
            "mel": mel_out,
            "postnet_mel": postnet_out,
            "log_duration_prediction": va["log_duration_prediction"],
            "duration_rounded": va["duration_rounded"],
            "pitch_prediction": va["pitch_prediction"],
            "energy_prediction": va["energy_prediction"],
            "txt_mask": txt_mask,
            "mel_lens": va["mel_lens"],
            "mel_mask": mel_mask,
            "attn_soft": va["attn_soft"],
            "attn_hard": va["attn_hard"],
            "attn_logprob": va["attn_logprob"],
            "pitch_target": va["pitch_target"],
            "energy_target": va["energy_target"],
        }

    def content_features(self, mel, speakers=None):
        """Phoneme posteriorgram (PPG) from the trained aligner.

        Projects each mel frame with the aligner's query stack and the FULL
        symbol inventory's embeddings with its key stack, returning the
        Gaussian-attention posterior over phonemes, (B, T, n_symbols).  The
        aligner was trained to put every frame near its phoneme's embedding
        (the "One TTS Alignment" objective), so this is a content
        representation with speaker timbre largely projected out — the
        matching space kNN-VC needs (serve/voice_conversion.py), standing in
        for the reference's external FreeVC content encoder
        (reference synthesizer.py:26-28).
        """
        if not self.config.variance.duration_modelling.learn_alignment:
            raise ValueError("content_features needs the unsupervised aligner")
        B, T = mel.shape[0], mel.shape[1]
        ids = jnp.arange(self.n_symbols, dtype=jnp.int32)[None]
        full_mask = jnp.ones((1, self.n_symbols), bool)
        _, sym_emb = self.encoder(ids, full_mask, deterministic=True)
        sym_emb = jnp.broadcast_to(sym_emb, (B,) + sym_emb.shape[1:])
        if speakers is None:
            speakers = jnp.zeros((B,), jnp.int32)
        spk = self.speaker_emb(speakers).astype(self.dtype)
        attn_soft, _ = self.variance_adaptor.aligner(
            mel,
            sym_emb,
            jnp.broadcast_to(full_mask, (B, self.n_symbols)),
            spk_emb=spk,
        )
        return attn_soft  # (B, T, n_symbols)

    def synthesize_stage1(
        self,
        speakers,
        texts,
        txt_lens,
        p_control: float = 1.0,
        e_control: float = 1.0,
        d_control: float = 1.0,
    ):
        """Serving stage 1: everything at phoneme rate.

        Encoder + speaker conditioning + duration prediction + phoneme-level
        pitch/energy embeddings.  Returns (x_ready (B, L, H), durations
        (B, L) int32).  The engine picks a mel-length bucket from
        sum(durations) before paying for the frame-rate stage — the two-stage
        split replaces the reference's single dynamic-shape inference pass
        (src/api/utils.py:131-143) with fixed-shape jit programs.
        """
        va = self.variance_adaptor
        txt_mask = sequence_mask(txt_lens, texts.shape[1])
        x, _ = self.encoder(texts, txt_mask, deterministic=True)
        spk = self.speaker_emb(speakers).astype(self.dtype)
        x = x + spk[:, None, :]

        log_d = va.duration_predictor(x, txt_mask, True)
        durations = jnp.clip(jnp.round(jnp.exp(log_d) - 1.0) * d_control, min=0.0)
        durations = (durations * txt_mask).astype(jnp.int32)

        x_base = x
        if va.pitch_feature == "phoneme_level":
            _, pitch_emb = va._pitch_embed(x_base, None, p_control, True)
            x = x + pitch_emb
        if va.energy_feature == "phoneme_level":
            _, energy_emb = va._energy_embed(x_base, None, e_control, True)
            x = x + energy_emb
        return x, durations

    def synthesize_stage2(
        self,
        x,                      # (B, L, H) stage-1 output
        durations,              # (B, L) int32
        max_mel_len: int,
        p_control: float = 1.0,
        e_control: float = 1.0,
    ):
        """Serving stage 2: frame-rate pipeline at a fixed mel bucket.

        Length regulation + (frame-level prosody if configured) + decoder +
        mel projection + postnet.  Returns (postnet_mel, mel_lens).
        """
        from ..ops import regulate_length

        va = self.variance_adaptor
        x, mel_lens, _ = regulate_length(x, durations, max_mel_len)
        mel_mask = sequence_mask(mel_lens, max_mel_len)

        x_base = x
        if va.pitch_feature == "frame_level":
            _, pitch_emb = va._pitch_embed(x_base, None, p_control, True)
            x = x + pitch_emb
        if va.energy_feature == "frame_level":
            _, energy_emb = va._energy_embed(x_base, None, e_control, True)
            x = x + energy_emb

        dec, mel_mask = self.decoder(x, mel_mask, deterministic=True)
        mel_out = self.mel_linear(dec.astype(jnp.float32))
        postnet_out = self.postnet(mel_out, train=False) + mel_out
        return postnet_out, mel_lens
