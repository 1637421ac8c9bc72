"""Long-Short Transformer blocks (reference: blocks/lstransformer.py,
after Zhu et al. 2021).

Attention per layer = windowed local attention (window 128, each window also
sees the previous window, causal) + low-rank global attention where keys and
values are tied and compressed per 16-frame segment by a learned r=1 dynamic
projection; rotary position embeddings on q/kv.  Everything is expressed as
blocked einsums with static shapes — the windowing is a reshape, never a
Python loop.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .common import Conv1d, sinusoid_table

NEG_INF = -1e9


def _rotary_freqs(T: int, d: int, interleaved: bool = False) -> np.ndarray:
    inv = 1.0 / (10000 ** (np.arange(0, d, 2) / d))
    ang = np.arange(T)[:, None] * inv[None, :]
    if interleaved:
        # lucidrains rotary-embedding-torch layout: freqs repeated per
        # adjacent channel pair [a0,a0,a1,a1,...] — what the reference
        # imports (lstransformer.py:6)
        return np.repeat(ang, 2, axis=-1).astype(np.float32)
    return np.concatenate([ang, ang], axis=-1).astype(np.float32)  # (T, d)


def _rotate_half(x: jnp.ndarray, interleaved: bool = False) -> jnp.ndarray:
    if interleaved:
        # pairs (x0, x1) -> (-x1, x0), interleaved back
        pair = x.reshape(*x.shape[:-1], -1, 2)
        rot = jnp.stack([-pair[..., 1], pair[..., 0]], axis=-1)
        return rot.reshape(x.shape)
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def _apply_rotary(
    x: jnp.ndarray, freqs: jnp.ndarray, interleaved: bool = False
) -> jnp.ndarray:
    return x * jnp.cos(freqs) + _rotate_half(x, interleaved) * jnp.sin(freqs)


class LongShortAttention(nn.Module):
    d_model: int
    n_head: int
    window_size: int = 128
    segment_size: int = 16
    r: int = 1
    causal: bool = True
    dropout: float = 0.2
    rotary_interleaved: bool = False  # True = reference library convention
    # Reference mask-polarity bug parity: the reference passes its True=pad
    # mask into lucidrains attention code that expects True=valid
    # (lstransformer.py:171-174 vs 284-298), so attention KEEPS padded keys
    # and masks valid ones (uniform local attention when nothing is
    # padded).  True reproduces that for checkpoint migration.
    invert_mask: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, deterministic=True):
        B, T0, _ = x.shape
        H = self.n_head
        D = self.d_model // H
        w, s, r = self.window_size, self.segment_size, self.r

        # pad to a multiple of lcm(window, segment)
        mult = int(np.lcm(w, s)) if self.causal else w
        T = int(np.ceil(T0 / mult) * mult)
        pad = T - T0
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
            mask = jnp.pad(mask, ((0, 0), (0, pad)))
        if self.invert_mask:
            # reference bug: keep = NOT valid, and never the multiple-pad
            # tail (its pad_to_multiple extends the mask with "pad")
            real = (jnp.arange(T) < T0)[None, :]
            mask = real & ~mask

        q = nn.Dense(H * D, use_bias=False, dtype=self.dtype, name="to_q")(x)
        kv = nn.Dense(H * D, use_bias=False, dtype=self.dtype, name="to_kv")(x)

        # fold heads into batch: (B*H, T, D)
        fold = lambda t: t.reshape(B, T, H, D).transpose(0, 2, 1, 3).reshape(B * H, T, D)
        q, kv = fold(q), fold(kv)

        freqs = jnp.asarray(
            _rotary_freqs(T, D, self.rotary_interleaved), self.dtype
        )[None]
        q = _apply_rotary(q, freqs, self.rotary_interleaved)
        kv = _apply_rotary(kv, freqs, self.rotary_interleaved)
        q = q * (D**-0.5)

        n_win = T // w
        hmask = jnp.repeat(mask, H, axis=0)  # (B*H, T)

        # ---- local windowed attention: each window sees [prev, self] ----
        lq = q.reshape(-1, n_win, w, D)
        lkv = kv.reshape(-1, n_win, w, D)
        prev_kv = jnp.concatenate([jnp.zeros_like(lkv[:, :1]), lkv[:, :-1]], axis=1)
        lkv2 = jnp.concatenate([prev_kv, lkv], axis=2)  # (BH, n_win, 2w, D)
        lkv2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="local_norm")(lkv2)
        lsim = jnp.einsum("bwid,bwjd->bwij", lq, lkv2)

        # key validity: real tokens only, and window 0 has no previous window
        m_win = hmask.reshape(-1, n_win, w)
        prev_m = jnp.concatenate(
            [jnp.zeros_like(m_win[:, :1]), m_win[:, :-1]], axis=1
        )
        key_m = jnp.concatenate([prev_m, m_win], axis=2)  # (BH, n_win, 2w)
        lsim = jnp.where(key_m[:, :, None, :], lsim, NEG_INF)

        if self.causal:
            # within the [prev | self] key layout, query i (global pos
            # win*w + i) may attend key j where j's global pos <= i
            i_pos = jnp.arange(w)
            j_off = jnp.arange(2 * w) - w  # offset relative to window start
            causal_m = j_off[None, :] <= i_pos[:, None]
            lsim = jnp.where(causal_m[None, None], lsim, NEG_INF)

        # ---- global low-rank attention ----
        if self.causal:
            n_seg = T // s
            gkv_seg = kv.reshape(-1, n_seg, s, D)
            p_logits = nn.Dense(r, use_bias=False, dtype=self.dtype, name="to_dynamic_proj")(
                gkv_seg
            )  # (BH, n_seg, s, r)
            seg_m = hmask.reshape(-1, n_seg, s)
            p_logits = jnp.where(seg_m[..., None], p_logits, NEG_INF)
            p = nn.softmax(p_logits.astype(jnp.float32), axis=-2).astype(self.dtype)
            gkv = jnp.einsum("bnsd,bnsr->bnrd", gkv_seg, p).reshape(-1, n_seg * r, D)
            n_glob = n_seg * r
        else:
            p_logits = nn.Dense(r, use_bias=False, dtype=self.dtype, name="to_dynamic_proj")(kv)
            p_logits = jnp.where(hmask[..., None], p_logits, NEG_INF)
            p = nn.softmax(p_logits.astype(jnp.float32), axis=-2).astype(self.dtype)
            gkv = jnp.einsum("bnd,bnr->brd", kv, p)
            n_glob = r

        gkv = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="global_norm")(gkv)
        gsim = jnp.einsum("bnd,brd->bnr", q, gkv)  # (BH, T, n_glob)

        if self.causal:
            # query may use segment g only once the whole segment is past
            seg_max = (jnp.arange(T // s) + 1) * s - 1
            seg_max = jnp.repeat(seg_max, r)
            g_ok = jnp.arange(T)[:, None] >= seg_max[None, :]
            gsim = jnp.where(g_ok[None], gsim, NEG_INF)

        gsim = gsim.reshape(-1, n_win, w, n_glob)
        sim = jnp.concatenate([gsim, lsim], axis=-1)
        attn = nn.softmax(sim.astype(jnp.float32), axis=-1).astype(self.dtype)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)

        g_attn, l_attn = attn[..., :n_glob], attn[..., n_glob:]
        out = jnp.einsum("bwij,bwjd->bwid", l_attn, lkv2)
        out = out + jnp.einsum("bwir,brd->bwid", g_attn, gkv)
        out = out.reshape(-1, T, D)

        out = out.reshape(B, H, T, D).transpose(0, 2, 1, 3).reshape(B, T, H * D)
        out = out[:, :T0]
        return nn.Dense(self.d_model, dtype=self.dtype, name="to_out")(out)


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
    """One pre-norm long-short layer — a free function so nn.remat can wrap
    it (recompute-in-backward) without disturbing parameter names."""
    h = nn.LayerNorm(epsilon=1e-5, dtype=mdl.dtype, name=f"attn_norm_{i}")(x)
    x = x + LongShortAttention(
        mdl.d_model, mdl.n_head, mdl.window_size, mdl.segment_size,
        mdl.r, True, mdl.dropout, mdl.rotary_interleaved,
        mdl.invert_mask, mdl.dtype, name=f"attn_{i}",
    )(h, mask, deterministic)
    x = x * mask[..., None]
    h = nn.LayerNorm(epsilon=1e-5, dtype=mdl.dtype, name=f"ff_norm_{i}")(x)
    x = x + _ConvFFN(
        mdl.d_model, mdl.d_inner, mdl.kernel_sizes, mdl.dropout,
        mdl.dtype, name=f"ff_{i}",
    )(h, deterministic)
    return x * mask[..., None]


class LSTransformerStack(nn.Module):
    n_layers: int
    d_model: int
    n_head: int
    d_inner: int
    kernel_sizes: Tuple[int, int] = (9, 1)
    window_size: int = 128
    segment_size: int = 16
    r: int = 1
    dropout: float = 0.2
    rotary_interleaved: bool = False
    invert_mask: bool = False
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        layer = (
            nn.remat(_stack_layer, static_argnums=(3, 4))
            if self.remat else _stack_layer
        )
        for i in range(self.n_layers):
            x = layer(self, x, mask, i, deterministic)
        return x


class LSTransformerEncoder(nn.Module):
    n_symbols: int
    n_layers: int
    d_model: int
    n_head: int
    d_inner: int
    kernel_sizes: Tuple[int, int] = (9, 1)
    window_size: int = 128
    segment_size: int = 16
    r: int = 1
    dropout: float = 0.2
    max_seq_len: int = 1000
    # reference parity (lstransformer.py:50-70): no pre-zero of padded rows,
    # interleaved rotary pairs (the imported rotary-embedding-torch layout)
    pre_zero: bool = True
    rotary_interleaved: bool = False
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
        x = LSTransformerStack(
            self.n_layers, self.d_model, self.n_head, self.d_inner,
            self.kernel_sizes, self.window_size, self.segment_size, self.r,
            self.dropout, self.rotary_interleaved, self.invert_mask,
            remat=self.remat, dtype=self.dtype, name="stack",
        )(x, mask, deterministic)
        return x, emb


class LSTransformerDecoder(nn.Module):
    n_layers: int
    d_model: int
    n_head: int
    d_inner: int
    kernel_sizes: Tuple[int, int] = (9, 1)
    window_size: int = 128
    segment_size: int = 16
    r: int = 1
    dropout: float = 0.2
    max_seq_len: int = 1000
    pre_zero: bool = True  # see LSTransformerEncoder note
    rotary_interleaved: bool = False
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
        x = LSTransformerStack(
            self.n_layers, self.d_model, self.n_head, self.d_inner,
            self.kernel_sizes, self.window_size, self.segment_size, self.r,
            self.dropout, self.rotary_interleaved, self.invert_mask,
            remat=self.remat, dtype=self.dtype, name="stack",
        )(x, mask, deterministic)
        return x, mask
