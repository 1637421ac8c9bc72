"""Reformer blocks: LSH attention + local attention heads
(reference: blocks/reformer.py, after Kitaev et al. 2020; reference config:
bucket 64, 4 hashes, causal, 4 of 8 heads local, weight-tied layers).

TPU-native deviations (documented, SURVEY.md §7):
- the reference's reversible residual sequence exists to save activation
  memory on GPUs; on TPU ``nn.remat`` (rematerialization, applied per layer
  in ``ReformerStack.__call__``) achieves the same memory profile without
  the reversible-coupling machinery, so layers here are plain pre-norm
  residual blocks under remat;
- sorting/chunking is expressed with argsort + gather at static shapes;
- the reference's optional PKM (product-key memory) layers
  (blocks/reformer.py ``use_pkm``) are deliberately omitted: the reference
  config never enables them and they are orthogonal to the LSH design.

LSH attention: shared Q=K projection, random-rotation hashing into
T/bucket_size buckets per round, sort by bucket, attend within each
bucket-size chunk plus its predecessor, merge rounds by softmax over the
per-round log-normalizers.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .common import sinusoid_table

NEG_INF = -1e9
SELF_ATTN_PENALTY = -5e4  # reference blocks/constants.py TOKEN_SELF_ATTN_VALUE


def _l2norm(x):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-6)


def lsh_attention(
    qk: jnp.ndarray,     # (B, T, D) shared query/key
    v: jnp.ndarray,      # (B, T, D)
    mask: jnp.ndarray,   # (B, T) True=valid
    rng: jax.Array,
    n_hashes: int = 4,
    bucket_size: int = 64,
    causal: bool = True,
    rotations: jnp.ndarray | None = None,
    attend_across_buckets: bool | None = None,
) -> jnp.ndarray:
    """``rotations`` (D, n_hashes, n_buckets//2) overrides the rng-sampled
    hash rotations — used by the seeded cross-implementation parity test
    against the reference torch LSH (blocks/reformer.py:258), whose hashing
    is otherwise runtime-random and unconvertible.

    ``attend_across_buckets``: None (default) keeps this implementation's
    soft cross-bucket penalty; True/False reproduce the reference's binary
    semantics (no penalty / hard mask, blocks/reformer.py:385-390)."""
    B, T, D = qk.shape
    n_buckets = max(T // bucket_size, 2)
    if n_buckets % 2:
        n_buckets += 1

    # --- hash: random rotations, argmax over [R, -R] ---
    if rotations is None:
        rot = jax.random.normal(rng, (D, n_hashes, n_buckets // 2), qk.dtype)
    else:
        rot = rotations.astype(qk.dtype)
    rotated = jnp.einsum("btd,dhr->bhtr", qk, rot)
    rotated = jnp.concatenate([rotated, -rotated], axis=-1)
    buckets = jnp.argmax(rotated, axis=-1)  # (B, n_hashes, T)

    # push padding tokens into the last bucket so they sort to the end
    buckets = jnp.where(mask[:, None, :], buckets, n_buckets - 1)

    # --- sort by (bucket, position) per hash round ---
    pos = jnp.arange(T)
    sort_key = buckets * T + pos[None, None, :]
    order = jnp.argsort(sort_key, axis=-1)            # (B, H, T)
    undo = jnp.argsort(order, axis=-1)

    def gather_t(x, idx):
        # x: (B, T, D) -> (B, H, T, D) ordered per round
        return jnp.take_along_axis(
            jnp.broadcast_to(x[:, None], (B, n_hashes, T, x.shape[-1])),
            idx[..., None],
            axis=2,
        )

    s_qk = gather_t(qk, order)
    s_v = gather_t(v, order)
    s_pos = jnp.take_along_axis(
        jnp.broadcast_to(pos[None, None], (B, n_hashes, T)), order, axis=2
    )
    s_bucket = jnp.take_along_axis(buckets, order, axis=2)
    s_valid = jnp.take_along_axis(
        jnp.broadcast_to(mask[:, None], (B, n_hashes, T)), order, axis=2
    )

    # --- chunk; each chunk attends to itself + previous chunk ---
    n_chunks = T // bucket_size
    c = bucket_size

    def chunk(x):
        return x.reshape(B, n_hashes, n_chunks, c, *x.shape[3:])

    cq = chunk(s_qk)
    ck = chunk(_l2norm(s_qk))
    cv = chunk(s_v)
    cpos = chunk(s_pos)
    cbucket = chunk(s_bucket)
    cvalid = chunk(s_valid)

    def with_prev(x):
        prev = jnp.concatenate([x[:, :, -1:], x[:, :, :-1]], axis=2)
        return jnp.concatenate([prev, x], axis=3)  # (B,H,chunks,2c,...)

    k2 = with_prev(ck)
    v2 = with_prev(cv)
    kpos = with_prev(cpos)
    kbucket = with_prev(cbucket)
    kvalid = with_prev(cvalid)

    dots = jnp.einsum("bhnid,bhnjd->bhnij", cq, k2) / np.sqrt(D)

    # masks: key validity, same-bucket, causal, self-attention penalty
    dots = jnp.where(kvalid[:, :, :, None, :], dots, NEG_INF)
    same_bucket = cbucket[..., :, None] == kbucket[..., None, :]
    if attend_across_buckets is None:
        dots = jnp.where(same_bucket, dots, dots + SELF_ATTN_PENALTY / 2)
    elif not attend_across_buckets:
        dots = jnp.where(same_bucket, dots, NEG_INF)
    if causal:
        causal_ok = cpos[..., :, None] >= kpos[..., None, :]
        dots = jnp.where(causal_ok, dots, NEG_INF)
    self_ref = cpos[..., :, None] == kpos[..., None, :]
    dots = jnp.where(self_ref, SELF_ATTN_PENALTY, dots)

    # softmax with saved log-normalizer for multi-round merging
    m = jnp.max(dots, axis=-1, keepdims=True)
    exp = jnp.exp(dots - m)
    denom = jnp.sum(exp, axis=-1, keepdims=True)
    attn = exp / jnp.maximum(denom, 1e-9)
    logits = (m + jnp.log(jnp.maximum(denom, 1e-9)))[..., 0]  # (B,H,chunks,c)

    out = jnp.einsum("bhnij,bhnjd->bhnid", attn, v2)
    out = out.reshape(B, n_hashes, T, D)
    logits = logits.reshape(B, n_hashes, T)

    # unsort and merge hash rounds weighted by their normalizers
    out = jnp.take_along_axis(out, undo[..., None], axis=2)
    logits = jnp.take_along_axis(logits, undo, axis=2)
    w = nn.softmax(logits, axis=1)[..., None]  # (B,H,T,1)
    return jnp.sum(out * w, axis=1)


def local_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, mask: jnp.ndarray,
    window: int, causal: bool = True,
) -> jnp.ndarray:
    """Windowed attention with one backward window of context
    (reference LocalAttention, blocks/reformer.py:614+)."""
    B, T0, D = q.shape
    T = int(np.ceil(T0 / window) * window)
    pad = T - T0
    if pad:
        q, k, v = (jnp.pad(t, ((0, 0), (0, pad), (0, 0))) for t in (q, k, v))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
    n_win = T // window

    cq = q.reshape(B, n_win, window, D) / np.sqrt(D)
    ck = k.reshape(B, n_win, window, D)
    cv = v.reshape(B, n_win, window, D)
    cm = mask.reshape(B, n_win, window)

    def with_prev(x, fill=0):
        prev = jnp.concatenate(
            [jnp.full_like(x[:, :1], fill), x[:, :-1]], axis=1
        )
        return jnp.concatenate([prev, x], axis=2)

    k2, v2, m2 = with_prev(ck), with_prev(cv), with_prev(cm, 0).astype(bool)
    dots = jnp.einsum("bwid,bwjd->bwij", cq, k2)
    dots = jnp.where(m2[:, :, None, :], dots, NEG_INF)
    if causal:
        i_pos = jnp.arange(window)
        j_off = jnp.arange(2 * window) - window
        dots = jnp.where(j_off[None, :] <= i_pos[:, None], dots, NEG_INF)
    attn = nn.softmax(dots.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bwij,bwjd->bwid", attn, v2).reshape(B, T, D)
    return out[:, :T0]


class LSHSelfAttention(nn.Module):
    d_model: int
    n_head: int = 8
    n_local_heads: int = 4
    bucket_size: int = 64
    n_hashes: int = 4
    causal: bool = True
    dropout: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, deterministic=True):
        B, T0, _ = x.shape
        H, D = self.n_head, self.d_model // self.n_head

        # pad to a multiple of 2 * bucket_size (the Autopadder contract,
        # reference reformer.py:934+)
        mult = 2 * self.bucket_size
        T = int(np.ceil(T0 / mult) * mult)
        pad = T - T0
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
            mask = jnp.pad(mask, ((0, 0), (0, pad)))

        qk = nn.Dense(H * D, use_bias=False, dtype=self.dtype, name="to_qk")(x)
        v = nn.Dense(H * D, use_bias=False, dtype=self.dtype, name="to_v")(x)

        qk = qk.reshape(B, T, H, D).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, H, D).transpose(0, 2, 1, 3)

        if self.has_rng("lsh"):
            rng = self.make_rng("lsh")
        else:
            rng = jax.random.PRNGKey(0)

        n_lsh = H - self.n_local_heads
        outs = []
        # LSH heads (folded into batch)
        if n_lsh > 0:
            lsh_qk = qk[:, :n_lsh].reshape(B * n_lsh, T, D)
            lsh_v = v[:, :n_lsh].reshape(B * n_lsh, T, D)
            lsh_mask = jnp.repeat(mask, n_lsh, axis=0)
            o = lsh_attention(
                lsh_qk, lsh_v, lsh_mask, rng,
                self.n_hashes, self.bucket_size, self.causal,
            )
            outs.append(o.reshape(B, n_lsh, T, D))
        # local heads
        if self.n_local_heads > 0:
            lq = qk[:, n_lsh:].reshape(B * self.n_local_heads, T, D)
            lv = v[:, n_lsh:].reshape(B * self.n_local_heads, T, D)
            lmask = jnp.repeat(mask, self.n_local_heads, axis=0)
            o = local_attention(
                lq, lq, lv, lmask, self.bucket_size * 2, self.causal
            )
            outs.append(o.reshape(B, self.n_local_heads, T, D))

        out = jnp.concatenate(outs, axis=1).transpose(0, 2, 1, 3).reshape(B, T, -1)
        out = out[:, :T0]
        out = nn.Dense(self.d_model, dtype=self.dtype, name="to_out")(out)
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)


class ChunkedFeedForward(nn.Module):
    """GELU MLP; the reference chunks over time to bound memory
    (ff_chunks=10) — XLA fuses this fine without chunking, kept whole."""

    d_model: int
    mult: int = 4
    dropout: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        h = nn.Dense(self.d_model * self.mult, dtype=self.dtype)(x)
        h = nn.gelu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.Dense(self.d_model, dtype=self.dtype)(h)


class ReformerStack(nn.Module):
    n_layers: int
    d_model: int
    n_head: int = 8
    n_local_heads: int = 4
    bucket_size: int = 64
    n_hashes: int = 4
    dropout: float = 0.2
    weight_tie: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        # weight_tie=True (reference config): one attention + one FF shared
        # by all layers
        n_unique = 1 if self.weight_tie else self.n_layers
        self.attns = [
            LSHSelfAttention(
                self.d_model, self.n_head, self.n_local_heads,
                self.bucket_size, self.n_hashes, True, self.dropout,
                self.dtype, name=f"attn_{i}",
            )
            for i in range(n_unique)
        ]
        self.ffs = [
            ChunkedFeedForward(self.d_model, 4, self.dropout, self.dtype, name=f"ff_{i}")
            for i in range(n_unique)
        ]
        self.attn_norms = [
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"attn_norm_{i}")
            for i in range(n_unique)
        ]
        self.ff_norms = [
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"ff_norm_{i}")
            for i in range(n_unique)
        ]

    def __call__(self, x, mask, deterministic: bool = True):
        # remat replaces the reference's reversible residuals: per-layer
        # activations are recomputed in the backward pass instead of stored,
        # the same O(1)-layers activation memory the reversible coupling buys
        # (reference blocks/reformer.py:896-933) without its split-channel
        # machinery
        def layer(mdl, x, mask, j):
            h = mdl.attn_norms[j](x)
            x = x + mdl.attns[j](h, mask, deterministic)
            x = x * mask[..., None]
            h = mdl.ff_norms[j](x)
            x = x + mdl.ffs[j](h, deterministic)
            return x * mask[..., None]

        for i in range(self.n_layers):
            j = 0 if self.weight_tie else i
            x = nn.remat(layer, static_argnums=(3,))(self, x, mask, j)
        return x


class ReformerEncoder(nn.Module):
    n_symbols: int
    n_layers: int
    d_model: int
    n_head: int = 8
    bucket_size: int = 64
    n_hashes: int = 4
    dropout: float = 0.2
    max_seq_len: int = 1000
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
        x = (emb + pos[None, :T]) * mask[..., None]
        x = ReformerStack(
            self.n_layers, self.d_model, self.n_head, 4, self.bucket_size,
            self.n_hashes, self.dropout, True, self.dtype, name="stack",
        )(x, mask, deterministic)
        return x, emb


class ReformerDecoder(nn.Module):
    n_layers: int
    d_model: int
    n_head: int = 8
    bucket_size: int = 64
    n_hashes: int = 4
    dropout: float = 0.2
    max_seq_len: int = 1000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        T = x.shape[1]
        pos = jnp.asarray(sinusoid_table(max(T, 1), self.d_model), self.dtype)
        x = (x.astype(self.dtype) + pos[None, :T]) * mask[..., None]
        x = ReformerStack(
            self.n_layers, self.d_model, self.n_head, 4, self.bucket_size,
            self.n_hashes, self.dropout, True, self.dtype, name="stack",
        )(x, mask, deterministic)
        return x, mask
