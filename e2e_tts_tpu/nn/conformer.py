"""Conformer encoder/decoder blocks (reference: blocks/conformer.py).

Macaron structure per block: ½FF -> rel-pos MHSA (transformer-XL scheme) ->
conv module (pointwise/GLU/depthwise/BN/swish/pointwise) -> ½FF -> LN.
Channels-last; the relative-position score uses the standard skew trick as
one extra matmul on the MXU.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .common import sinusoid_table

NEG_INF = -1e9


def _relative_shift(pos_score: jnp.ndarray) -> jnp.ndarray:
    """Skew (B, H, T, T) position scores so column j means offset j - i
    (transformer-XL relative shift; reference conformer.py:432-440)."""
    B, H, T1, T2 = pos_score.shape
    padded = jnp.pad(pos_score, ((0, 0), (0, 0), (0, 0), (1, 0)))
    padded = padded.reshape(B, H, T2 + 1, T1)
    return padded[:, :, 1:].reshape(B, H, T1, T2)


class RelativeMultiHeadAttention(nn.Module):
    d_model: int
    n_head: int
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pos_emb, key_mask, deterministic=True):
        B, T, _ = x.shape
        H, D = self.n_head, self.d_model // self.n_head

        q = nn.Dense(self.d_model, dtype=self.dtype, name="query_proj")(x)
        k = nn.Dense(self.d_model, dtype=self.dtype, name="key_proj")(x)
        v = nn.Dense(self.d_model, dtype=self.dtype, name="value_proj")(x)
        p = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype, name="pos_proj")(
            pos_emb
        )

        q = q.reshape(B, T, H, D)
        k = k.reshape(B, T, H, D)
        v = v.reshape(B, T, H, D)
        p = p.reshape(1, -1, H, D)

        u_bias = self.param("u_bias", nn.initializers.xavier_uniform(), (H, D))
        v_bias = self.param("v_bias", nn.initializers.xavier_uniform(), (H, D))

        content = jnp.einsum("bqhd,bkhd->bhqk", q + u_bias, k)
        pos = jnp.einsum("bqhd,xkhd->bhqk", q + v_bias, jnp.broadcast_to(p, (1, T, H, D)))
        pos = _relative_shift(pos)
        score = (content + pos) / np.sqrt(self.d_model)

        if key_mask is not None:
            score = jnp.where(key_mask[:, None, None, :], score, NEG_INF)
        attn = nn.softmax(score.astype(jnp.float32), axis=-1).astype(self.dtype)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, T, -1)
        return nn.Dense(self.d_model, dtype=self.dtype, name="out_proj")(out)


class FeedForwardModule(nn.Module):
    d_model: int
    expansion: int = 4
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        x = nn.Dense(self.d_model * self.expansion, dtype=self.dtype)(x)
        x = x * nn.sigmoid(x)  # swish
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.d_model, dtype=self.dtype)(x)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class ConvModule(nn.Module):
    d_model: int
    kernel_size: int = 31
    expansion: int = 2
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True, train=False):
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        x = nn.Dense(self.d_model * self.expansion, dtype=self.dtype, name="pw1")(x)
        a, b = jnp.split(x, 2, axis=-1)
        x = a * nn.sigmoid(b)  # GLU
        x = nn.Conv(
            self.d_model,
            (self.kernel_size,),
            feature_group_count=self.d_model,
            padding="SAME",
            use_bias=False,
            dtype=self.dtype,
            name="depthwise",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        x = x * nn.sigmoid(x)  # swish
        x = nn.Dense(self.d_model, dtype=self.dtype, name="pw2")(x)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class ConformerBlock(nn.Module):
    d_model: int
    n_head: int
    ffn_expansion: int = 4
    conv_kernel: int = 31
    conv_expansion: int = 2
    half_step_residual: bool = True
    dropout: float = 0.1
    # The reference conformer block NEVER masks attention: its Sequential
    # container drops the mask before MultiHeadedSelfAttentionModule
    # (reference conformer.py:215-256 — forward only zeroes block outputs),
    # so padded keys join every softmax.  True (default) applies proper
    # key-side masking; False reproduces the reference exactly, which
    # migrating reference-trained conformer checkpoints requires.
    mask_attention: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pos_emb, mask, deterministic=True):
        ff_factor = 0.5 if self.half_step_residual else 1.0
        train = not deterministic

        x = x + ff_factor * FeedForwardModule(
            self.d_model, self.ffn_expansion, self.dropout, self.dtype, name="ff1"
        )(x, deterministic)
        attn_in = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="mhsa_norm")(x)
        attn_out = RelativeMultiHeadAttention(
            self.d_model, self.n_head, self.dropout, self.dtype, name="mhsa"
        )(attn_in, pos_emb, mask if self.mask_attention else None, deterministic)
        x = x + nn.Dropout(self.dropout)(attn_out, deterministic=deterministic)
        x = x + ConvModule(
            self.d_model, self.conv_kernel, self.conv_expansion, self.dropout,
            self.dtype, name="conv",
        )(x, deterministic, train)
        x = x + ff_factor * FeedForwardModule(
            self.d_model, self.ffn_expansion, self.dropout, self.dtype, name="ff2"
        )(x, deterministic)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="final_norm")(x)
        return x * mask[..., None]


class ConformerEncoder(nn.Module):
    n_symbols: int
    n_layers: int
    d_model: int
    n_head: int
    ffn_expansion: int = 4
    conv_kernel: int = 31
    conv_expansion: int = 2
    half_step_residual: bool = True
    dropout: float = 0.1
    max_seq_len: int = 1000
    mask_attention: bool = True
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, token_ids, mask, deterministic: bool = True):
        from .transformer import _zero_pad_row_init

        emb = nn.Embed(
            self.n_symbols + 1,
            self.d_model,
            embedding_init=_zero_pad_row_init,
            name="src_word_emb",
        )(token_ids).astype(self.dtype)
        T = token_ids.shape[1]
        pos = jnp.asarray(sinusoid_table(max(T, 1), self.d_model), self.dtype)
        x = emb + pos[None, :T]
        if self.mask_attention:
            # proper mode: padded rows enter block 0 as zeros.  The
            # reference does NOT pre-zero (conformer.py:69-90: block-0 input
            # at padded rows is emb+pos, zeroed only at block END), so
            # parity mode (mask_attention=False) skips this too.
            x = x * mask[..., None]
        Block = (
            nn.remat(ConformerBlock, static_argnums=(4,))
            if self.remat else ConformerBlock
        )
        for i in range(self.n_layers):
            x = Block(
                self.d_model, self.n_head, self.ffn_expansion, self.conv_kernel,
                self.conv_expansion, self.half_step_residual, self.dropout,
                mask_attention=self.mask_attention, dtype=self.dtype,
                name=f"layer_{i}",
            )(x, pos[None, :T], mask, deterministic)
        return x, emb


class ConformerDecoder(nn.Module):
    n_layers: int
    d_model: int
    n_head: int
    ffn_expansion: int = 4
    conv_kernel: int = 31
    conv_expansion: int = 2
    half_step_residual: bool = True
    dropout: float = 0.1
    max_seq_len: int = 1000
    mask_attention: bool = True
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        T = x.shape[1]
        pos = jnp.asarray(sinusoid_table(max(T, 1), self.d_model), self.dtype)
        x = x.astype(self.dtype) + pos[None, :T]
        if self.mask_attention:
            x = x * mask[..., None]  # see encoder note: reference skips this
        Block = (
            nn.remat(ConformerBlock, static_argnums=(4,))
            if self.remat else ConformerBlock
        )
        for i in range(self.n_layers):
            x = Block(
                self.d_model, self.n_head, self.ffn_expansion, self.conv_kernel,
                self.conv_expansion, self.half_step_residual, self.dropout,
                mask_attention=self.mask_attention, dtype=self.dtype,
                name=f"layer_{i}",
            )(x, pos[None, :T], mask, deterministic)
        return x, mask
