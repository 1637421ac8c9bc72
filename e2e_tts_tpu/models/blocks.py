"""Encoder/decoder building-block registry.

The reference selects one of five block families by config string via
conditional imports (reference: unsupervised_fastspeech2/model.py:24-33).
Here each family registers an (encoder, decoder) factory with the shared
contract:

    encoder(token_ids, mask, deterministic) -> (x, raw_embeddings)
    decoder(x, mask, deterministic) -> (x, mask)
"""

from __future__ import annotations

from typing import Callable, Dict

import jax.numpy as jnp

from ..config import FastSpeech2Config

_ENCODERS: Dict[str, Callable] = {}
_DECODERS: Dict[str, Callable] = {}


def register_block(name: str, encoder_factory, decoder_factory):
    _ENCODERS[name] = encoder_factory
    _DECODERS[name] = decoder_factory


def available_blocks():
    return sorted(_ENCODERS)


def build_encoder(
    cfg: FastSpeech2Config, n_symbols: int, dtype=jnp.float32, use_flash: bool = False
):
    bt = cfg.building_block.block_type
    if bt not in _ENCODERS:
        raise ValueError(f"unknown block_type {bt!r}; have {available_blocks()}")
    if bt == "transformer":
        return _ENCODERS[bt](cfg, n_symbols, dtype, use_flash)
    return _ENCODERS[bt](cfg, n_symbols, dtype)


def build_decoder(cfg: FastSpeech2Config, dtype=jnp.float32, use_flash: bool = False):
    """use_flash engages the Pallas fused attention (forward + custom VJP,
    so training works too); only the transformer family consumes it."""
    bt = cfg.building_block.block_type
    if bt not in _DECODERS:
        raise ValueError(f"unknown block_type {bt!r}; have {available_blocks()}")
    if bt == "transformer":
        return _DECODERS[bt](cfg, dtype, use_flash)
    return _DECODERS[bt](cfg, dtype)


# --- transformer (default) -------------------------------------------------


def _transformer_encoder(
    cfg: FastSpeech2Config, n_symbols: int, dtype, use_flash: bool = False
):
    from ..nn.transformer import TransformerEncoder

    b = cfg.building_block.transformer
    return TransformerEncoder(
        n_symbols=n_symbols,
        n_layers=cfg.encoder_layers,
        d_model=cfg.encoder_hidden,
        n_head=b.encoder_head,
        d_inner=b.conv_filter_size,
        kernel_sizes=tuple(b.conv_kernel_size),
        dropout=b.encoder_dropout,
        max_seq_len=cfg.max_seq_len,
        use_flash=use_flash,
        remat=cfg.remat_blocks,
        dtype=dtype,
        name="encoder",
    )


def _transformer_decoder(cfg: FastSpeech2Config, dtype, use_flash: bool = False):
    from ..nn.transformer import TransformerDecoder

    b = cfg.building_block.transformer
    return TransformerDecoder(
        n_layers=cfg.decoder_layers,
        d_model=cfg.decoder_hidden,
        n_head=b.decoder_head,
        d_inner=b.conv_filter_size,
        kernel_sizes=tuple(b.conv_kernel_size),
        dropout=b.decoder_dropout,
        max_seq_len=cfg.max_seq_len,
        use_flash=use_flash,
        remat=cfg.remat_blocks,
        dtype=dtype,
        name="decoder",
    )


register_block("transformer", _transformer_encoder, _transformer_decoder)


# --- conformer ---------------------------------------------------------------


def _conformer_encoder(cfg: FastSpeech2Config, n_symbols: int, dtype):
    from ..nn.conformer import ConformerEncoder

    b = cfg.building_block.conformer
    return ConformerEncoder(
        n_symbols=n_symbols,
        n_layers=cfg.encoder_layers,
        d_model=cfg.encoder_hidden,
        n_head=b.encoder_head,
        ffn_expansion=b.ffn_expansion_factor,
        conv_kernel=b.conv_kernel_size,
        conv_expansion=b.conv_expansion_factor,
        half_step_residual=b.half_step_residual,
        dropout=b.encoder_dropout,
        max_seq_len=cfg.max_seq_len,
        mask_attention=b.mask_attention,
        remat=cfg.remat_blocks,
        dtype=dtype,
        name="encoder",
    )


def _conformer_decoder(cfg: FastSpeech2Config, dtype):
    from ..nn.conformer import ConformerDecoder

    b = cfg.building_block.conformer
    return ConformerDecoder(
        n_layers=cfg.decoder_layers,
        d_model=cfg.decoder_hidden,
        n_head=b.decoder_head,
        ffn_expansion=b.ffn_expansion_factor,
        conv_kernel=b.conv_kernel_size,
        conv_expansion=b.conv_expansion_factor,
        half_step_residual=b.half_step_residual,
        dropout=b.decoder_dropout,
        max_seq_len=cfg.max_seq_len,
        mask_attention=b.mask_attention,
        remat=cfg.remat_blocks,
        dtype=dtype,
        name="decoder",
    )


register_block("conformer", _conformer_encoder, _conformer_decoder)


# --- fastformer --------------------------------------------------------------


def _fastformer_encoder(cfg: FastSpeech2Config, n_symbols: int, dtype):
    from ..nn.fastformer import FastformerEncoder

    b = cfg.building_block.fastformer
    n_head = (
        cfg.encoder_hidden // b.encoder_head if b.reference_compat
        else b.encoder_head
    )
    return FastformerEncoder(
        n_symbols=n_symbols,
        n_layers=cfg.encoder_layers,
        d_model=cfg.encoder_hidden,
        n_head=n_head,
        pre_zero=not b.reference_compat,
        invert_mask=b.reference_compat,
        d_inner=b.conv_filter_size,
        kernel_sizes=tuple(b.conv_kernel_size),
        dropout=b.encoder_dropout,
        max_seq_len=cfg.max_seq_len,
        remat=cfg.remat_blocks,
        dtype=dtype,
        name="encoder",
    )


def _fastformer_decoder(cfg: FastSpeech2Config, dtype):
    from ..nn.fastformer import FastformerDecoder

    b = cfg.building_block.fastformer
    n_head = (
        cfg.decoder_hidden // b.decoder_head if b.reference_compat
        else b.decoder_head
    )
    return FastformerDecoder(
        n_layers=cfg.decoder_layers,
        d_model=cfg.decoder_hidden,
        n_head=n_head,
        pre_zero=not b.reference_compat,
        invert_mask=b.reference_compat,
        d_inner=b.conv_filter_size,
        kernel_sizes=tuple(b.conv_kernel_size),
        dropout=b.decoder_dropout,
        max_seq_len=cfg.max_seq_len,
        remat=cfg.remat_blocks,
        dtype=dtype,
        name="decoder",
    )


register_block("fastformer", _fastformer_encoder, _fastformer_decoder)


# --- long-short transformer --------------------------------------------------


def _lst_encoder(cfg: FastSpeech2Config, n_symbols: int, dtype):
    from ..nn.lstransformer import LSTransformerEncoder

    b = cfg.building_block.lstransformer
    return LSTransformerEncoder(
        n_symbols=n_symbols,
        n_layers=cfg.encoder_layers,
        d_model=cfg.encoder_hidden,
        n_head=b.encoder_head,
        d_inner=b.conv_filter_size,
        kernel_sizes=tuple(b.conv_kernel_size),
        window_size=b.window_size,
        r=1 if b.reference_compat else b.r,
        dropout=b.encoder_dropout,
        max_seq_len=cfg.max_seq_len,
        pre_zero=not b.reference_compat,
        rotary_interleaved=b.reference_compat,
        invert_mask=b.reference_compat,
        remat=cfg.remat_blocks,
        dtype=dtype,
        name="encoder",
    )


def _lst_decoder(cfg: FastSpeech2Config, dtype):
    from ..nn.lstransformer import LSTransformerDecoder

    b = cfg.building_block.lstransformer
    return LSTransformerDecoder(
        n_layers=cfg.decoder_layers,
        d_model=cfg.decoder_hidden,
        n_head=b.decoder_head,
        d_inner=b.conv_filter_size,
        kernel_sizes=tuple(b.conv_kernel_size),
        window_size=b.window_size,
        r=1 if b.reference_compat else b.r,
        dropout=b.decoder_dropout,
        max_seq_len=cfg.max_seq_len,
        pre_zero=not b.reference_compat,
        rotary_interleaved=b.reference_compat,
        invert_mask=b.reference_compat,
        remat=cfg.remat_blocks,
        dtype=dtype,
        name="decoder",
    )


register_block("lstransformer", _lst_encoder, _lst_decoder)


# --- reformer ----------------------------------------------------------------


def _reformer_encoder(cfg: FastSpeech2Config, n_symbols: int, dtype):
    from ..nn.reformer import ReformerEncoder

    b = cfg.building_block.reformer
    return ReformerEncoder(
        n_symbols=n_symbols,
        n_layers=cfg.encoder_layers,
        d_model=cfg.encoder_hidden,
        n_head=b.encoder_head,
        bucket_size=b.bucket_size,
        n_hashes=b.n_hashes,
        dropout=b.encoder_dropout,
        max_seq_len=cfg.max_seq_len,
        # reformer always remats per layer (see nn/reformer.py) — the
        # remat_blocks flag is implicit here
        dtype=dtype,
        name="encoder",
    )


def _reformer_decoder(cfg: FastSpeech2Config, dtype):
    from ..nn.reformer import ReformerDecoder

    b = cfg.building_block.reformer
    return ReformerDecoder(
        n_layers=cfg.decoder_layers,
        d_model=cfg.decoder_hidden,
        n_head=b.decoder_head,
        bucket_size=b.bucket_size,
        n_hashes=b.n_hashes,
        dropout=b.decoder_dropout,
        max_seq_len=cfg.max_seq_len,
        dtype=dtype,
        name="decoder",
    )


register_block("reformer", _reformer_encoder, _reformer_decoder)
