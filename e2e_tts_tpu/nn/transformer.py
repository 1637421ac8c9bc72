"""FFT (feed-forward transformer) blocks — the default FastSpeech2 encoder/
decoder building block (reference: blocks/transformer.py).

Attention is a single batched einsum chain (B, H, T, T) that XLA maps onto
the MXU; the conv-FFN (k=9 then k=1) is two NWC convolutions.  Masks are
True=valid and multiply rather than masked_fill.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .common import Conv1d, sinusoid_table

NEG_INF = -1e9


class MultiHeadAttention(nn.Module):
    d_model: int
    n_head: int
    dropout: float = 0.1
    use_flash: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pair_mask, deterministic: bool = True, kv_lens=None):
        B, T, _ = x.shape
        d_k = self.d_model // self.n_head
        dense = lambda name: nn.Dense(self.n_head * d_k, dtype=self.dtype, name=name)
        q = dense("w_q")(x).reshape(B, T, self.n_head, d_k)
        k = dense("w_k")(x).reshape(B, T, self.n_head, d_k)
        v = dense("w_v")(x).reshape(B, T, self.n_head, d_k)

        if self.use_flash and kv_lens is not None and T >= 256:
            # fused Pallas path: scores never materialize in HBM
            from ..kernels import flash_attention

            fold = lambda t: t.transpose(0, 2, 1, 3).reshape(B * self.n_head, T, d_k)
            lens = jnp.repeat(kv_lens.astype(jnp.int32), self.n_head)
            o = flash_attention(fold(q), fold(k), fold(v), lens)
            out = o.reshape(B, self.n_head, T, d_k).transpose(0, 2, 1, 3).reshape(B, T, -1)
        else:
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(d_k)
            scores = jnp.where(pair_mask[:, None, :, :], scores, NEG_INF)
            attn = nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, T, -1)
        out = nn.Dense(self.d_model, dtype=self.dtype, name="fc")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(out + x)


class ConvFFN(nn.Module):
    d_model: int
    d_inner: int
    kernel_sizes: Tuple[int, int] = (9, 1)
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = Conv1d(self.d_inner, self.kernel_sizes[0], dtype=self.dtype, name="w_1")(x)
        h = nn.relu(h)
        h = Conv1d(self.d_model, self.kernel_sizes[1], dtype=self.dtype, name="w_2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(h + x)


class FFTBlock(nn.Module):
    d_model: int
    n_head: int
    d_inner: int
    kernel_sizes: Tuple[int, int] = (9, 1)
    dropout: float = 0.1
    use_flash: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        pair_mask = mask[:, :, None] & mask[:, None, :]
        kv_lens = jnp.sum(mask.astype(jnp.int32), axis=-1)
        x = MultiHeadAttention(
            self.d_model, self.n_head, self.dropout, self.use_flash,
            self.dtype, name="slf_attn",
        )(x, pair_mask, deterministic, kv_lens=kv_lens)
        x = x * mask[..., None]
        x = ConvFFN(
            self.d_model, self.d_inner, self.kernel_sizes, self.dropout,
            self.dtype, name="pos_ffn",
        )(x, deterministic)
        return x * mask[..., None]


class TransformerEncoder(nn.Module):
    """Phoneme encoder: embedding + sinusoid positions + N FFT blocks
    (reference blocks/transformer.py:11-86)."""

    n_symbols: int
    n_layers: int
    d_model: int
    n_head: int
    d_inner: int
    kernel_sizes: Tuple[int, int] = (9, 1)
    dropout: float = 0.1
    max_seq_len: int = 1000
    use_flash: bool = False
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, token_ids, mask, deterministic: bool = True):
        emb = nn.Embed(
            self.n_symbols + 1,
            self.d_model,
            embedding_init=_zero_pad_row_init,
            name="src_word_emb",
        )(token_ids).astype(self.dtype)
        T = token_ids.shape[1]
        pos = jnp.asarray(sinusoid_table(max(T, 1), self.d_model), self.dtype)
        x = emb + pos[None, :T]
        x = x * mask[..., None]
        # remat: recompute layer activations in backward (jax.checkpoint via
        # nn.remat) — trades FLOPs for HBM at training time, same math
        Block = nn.remat(FFTBlock, static_argnums=(3,)) if self.remat else FFTBlock
        for i in range(self.n_layers):
            x = Block(
                self.d_model, self.n_head, self.d_inner, self.kernel_sizes,
                self.dropout, self.use_flash, self.dtype, name=f"layer_{i}",
            )(x, mask, deterministic)
        return x, emb


class TransformerDecoder(nn.Module):
    """Mel decoder over frame-rate sequences (reference transformer.py:89-164)."""

    n_layers: int
    d_model: int
    n_head: int
    d_inner: int
    kernel_sizes: Tuple[int, int] = (9, 1)
    dropout: float = 0.1
    max_seq_len: int = 1000
    use_flash: bool = False
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        T = x.shape[1]
        pos = jnp.asarray(sinusoid_table(max(T, 1), self.d_model), self.dtype)
        x = x.astype(self.dtype) + pos[None, :T]
        x = x * mask[..., None]
        Block = nn.remat(FFTBlock, static_argnums=(3,)) if self.remat else FFTBlock
        for i in range(self.n_layers):
            x = Block(
                self.d_model, self.n_head, self.d_inner, self.kernel_sizes,
                self.dropout, self.use_flash, self.dtype, name=f"layer_{i}",
            )(x, mask, deterministic)
        return x, mask


def _zero_pad_row_init(key, shape, dtype=jnp.float32):
    """Normal embedding init with the padding row (id 0) zeroed
    (reference: nn.Embedding(padding_idx=PAD), transformer.py:41-43)."""
    emb = nn.initializers.normal(stddev=1.0)(key, shape, dtype)
    return emb.at[0].set(0.0)
