"""Fastformer blocks: additive attention, O(N) (reference: blocks/
fastformer.py:133-298, after Wu et al. 2021).

Per layer (pre-norm): learned per-head pooling of queries -> global query;
keys modulated by the global query are pooled -> global key; values (tied to
queries) are modulated by the global key; output transform + inner residual
to the query projection.  The q/k pooling projections are weight-tied across
layers (reference fastformer.py:161-165) — expressed here by instantiating
them once in the stack and passing them down.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .common import Conv1d, sinusoid_table

NEG_INF = -1e4


class FastAttention(nn.Module):
    d_model: int
    n_head: int
    dropout: float = 0.2
    # Reference mask-polarity bug parity: the reference computes the
    # additive mask as -10000 * (1 - pad_mask) (fastformer.py:229-232),
    # i.e. it penalizes VALID positions and leaves pads at 0 — a no-op for
    # unpadded rows (constant shift) but it concentrates the pooling
    # softmax on padding otherwise.  True reproduces that for checkpoint
    # migration.
    invert_mask: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, q_logits_mod, k_logits_mod, deterministic=True):
        B, T, _ = x.shape
        H, D = self.n_head, self.d_model // self.n_head
        scale = D**-0.5

        mix_q = nn.Dense(self.d_model, dtype=self.dtype, name="query")(x)
        mix_k = nn.Dense(self.d_model, dtype=self.dtype, name="key")(x)

        keep = ~mask if self.invert_mask else mask
        neg = (~keep).astype(self.dtype) * NEG_INF  # (B, T)

        # global query: per-head softmax pooling over time
        q_score = q_logits_mod(mix_q) * scale + neg[..., None]  # (B, T, H)
        q_weight = nn.softmax(q_score.astype(jnp.float32), axis=1).astype(self.dtype)
        q_heads = mix_q.reshape(B, T, H, D)
        pooled_q = jnp.einsum("bth,bthd->bhd", q_weight, q_heads).reshape(B, 1, -1)

        # keys modulated by the broadcast global query
        qk = mix_k * pooled_q  # (B, T, H*D)
        k_score = k_logits_mod(qk) * scale + neg[..., None]
        k_weight = nn.softmax(k_score.astype(jnp.float32), axis=1).astype(self.dtype)
        k_heads = qk.reshape(B, T, H, D)
        pooled_k = jnp.einsum("bth,bthd->bhd", k_weight, k_heads)  # (B, H, D)

        weighted = (pooled_k[:, None] * q_heads).reshape(B, T, -1)
        out = nn.Dense(self.d_model, dtype=self.dtype, name="transform")(weighted)
        out = out + mix_q
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)


class _ConvFFN(nn.Module):
    d_model: int
    d_inner: int
    kernel_sizes: Tuple[int, int]
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        h = Conv1d(self.d_inner, self.kernel_sizes[0], dtype=self.dtype, name="w_1")(x)
        h = nn.gelu(h)
        h = Conv1d(self.d_model, self.kernel_sizes[1], dtype=self.dtype, name="w_2")(h)
        return nn.Dropout(self.dropout)(h, deterministic=deterministic)


def _stack_layer(mdl, x, mask, i, deterministic):
    """One pre-norm attention+FFN layer — a free function so nn.remat can
    wrap it (recompute-in-backward) without disturbing parameter names."""
    h = mdl.attn_norms[i](x)
    x = x + mdl.attns[i](
        h, mask, mdl.to_q_attn_logits, mdl.to_k_attn_logits, deterministic
    )
    x = x * mask[..., None]
    h = mdl.ff_norms[i](x)
    x = x + mdl.ffs[i](h, deterministic)
    return x * mask[..., None]


class FastformerStack(nn.Module):
    n_layers: int
    d_model: int
    n_head: int
    d_inner: int
    kernel_sizes: Tuple[int, int] = (9, 1)
    dropout: float = 0.2
    invert_mask: bool = False
    remat: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        # weight-tied pooling projections shared by every layer
        self.to_q_attn_logits = nn.Dense(
            self.n_head, dtype=self.dtype, name="to_q_attn_logits"
        )
        self.to_k_attn_logits = nn.Dense(
            self.n_head, dtype=self.dtype, name="to_k_attn_logits"
        )
        self.attn_norms = [
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"attn_norm_{i}")
            for i in range(self.n_layers)
        ]
        self.ff_norms = [
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"ff_norm_{i}")
            for i in range(self.n_layers)
        ]
        self.attns = [
            FastAttention(self.d_model, self.n_head, self.dropout,
                          self.invert_mask, self.dtype, name=f"attn_{i}")
            for i in range(self.n_layers)
        ]
        self.ffs = [
            _ConvFFN(self.d_model, self.d_inner, self.kernel_sizes, self.dropout,
                     self.dtype, name=f"ff_{i}")
            for i in range(self.n_layers)
        ]

    def __call__(self, x, mask, deterministic: bool = True):
        layer = (
            nn.remat(_stack_layer, static_argnums=(3, 4))
            if self.remat else _stack_layer
        )
        for i in range(self.n_layers):
            x = layer(self, x, mask, i, deterministic)
        return x


class FastformerEncoder(nn.Module):
    n_symbols: int
    n_layers: int
    d_model: int
    n_head: int
    d_inner: int
    kernel_sizes: Tuple[int, int] = (9, 1)
    dropout: float = 0.2
    max_seq_len: int = 1000
    # reference parity: the reference never zeroes padded rows before the
    # first block (fastformer.py:50-67), so their emb+pos values leak into
    # valid frames through the kernel-9 FFN convs; pre_zero=False
    # reproduces that for checkpoint migration
    pre_zero: bool = True
    invert_mask: bool = False
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, token_ids, mask, deterministic: bool = True):
        from .transformer import _zero_pad_row_init

        emb = nn.Embed(
            self.n_symbols + 1, self.d_model,
            embedding_init=_zero_pad_row_init, name="src_word_emb",
        )(token_ids).astype(self.dtype)
        T = token_ids.shape[1]
        pos = jnp.asarray(sinusoid_table(max(T, 1), self.d_model), self.dtype)
        x = emb + pos[None, :T]
        if self.pre_zero:
            x = x * mask[..., None]
        x = FastformerStack(
            self.n_layers, self.d_model, self.n_head, self.d_inner,
            self.kernel_sizes, self.dropout, self.invert_mask,
            remat=self.remat, dtype=self.dtype, name="stack",
        )(x, mask, deterministic)
        return x, emb


class FastformerDecoder(nn.Module):
    n_layers: int
    d_model: int
    n_head: int
    d_inner: int
    kernel_sizes: Tuple[int, int] = (9, 1)
    dropout: float = 0.2
    max_seq_len: int = 1000
    pre_zero: bool = True  # see FastformerEncoder note
    invert_mask: bool = False
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        T = x.shape[1]
        pos = jnp.asarray(sinusoid_table(max(T, 1), self.d_model), self.dtype)
        x = x.astype(self.dtype) + pos[None, :T]
        if self.pre_zero:
            x = x * mask[..., None]
        x = FastformerStack(
            self.n_layers, self.d_model, self.n_head, self.d_inner,
            self.kernel_sizes, self.dropout, self.invert_mask,
            remat=self.remat, dtype=self.dtype, name="stack",
        )(x, mask, deterministic)
        return x, mask
