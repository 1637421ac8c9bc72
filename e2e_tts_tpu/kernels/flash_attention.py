"""Pallas flash attention for the mel-rate decoder — forward AND backward.

The decoder attends over up-to-2048-frame mel sequences; materializing the
(B, H, T, T) score tensor costs HBM bandwidth XLA can't always fuse away.
The forward kernel streams KV blocks through VMEM with an online-softmax
accumulator, so scores never leave VMEM (standard flash-attention scheme,
blocked for the 128x128 MXU).  The backward pass uses the standard
recompute scheme: the forward saves only the per-row logsumexp; two kernels
rebuild the probabilities blockwise to accumulate dq (grid over query
blocks) and dk/dv (grid over key blocks) without ever materializing the
score matrix.

Variable lengths are handled with -inf masking on key blocks past kv_len.
Callers fall back to plain XLA attention off-TPU or for short sequences
where the fused path wins nothing (nn/transformer.py:38-46).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

BLOCK_Q = 128
BLOCK_KV = 128
LANES = 128  # lane-broadcast width for per-row scalars (lse, delta)


def _flash_fwd_kernel(kv_len_ref, q_ref, k_ref, v_ref, o_ref, lse_ref=None, *, scale, t_kv):
    """Grid: (BH, T_q // BLOCK_Q).  Blocks: q (1, BLOCK_Q, D); k/v stream.
    lse_ref is only present under differentiation — inference skips the
    residual write entirely (it costs measurable HBM bandwidth)."""
    kv_len = kv_len_ref[pl.program_id(0)]
    q = q_ref[0].astype(jnp.float32) * scale  # (BLOCK_Q, D)

    n_kv = t_kv // BLOCK_KV

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(i * BLOCK_KV, BLOCK_KV), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * BLOCK_KV, BLOCK_KV), :].astype(jnp.float32)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BLOCK_Q, BLOCK_KV)

        kv_ids = i * BLOCK_KV + jax.lax.broadcasted_iota(
            jnp.int32, (BLOCK_Q, BLOCK_KV), 1
        )
        s = jnp.where(kv_ids < kv_len, s, NEG_INF)

        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc, m_new, l_new

    acc = jnp.zeros((BLOCK_Q, q_ref.shape[-1]), jnp.float32)
    m0 = jnp.full((BLOCK_Q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((BLOCK_Q, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, n_kv, body, (acc, m0, l0))

    o_ref[0] = (acc / jnp.maximum(l, 1e-20)).astype(o_ref.dtype)
    if lse_ref is not None:
        # logsumexp of the SCALED scores; 0 for fully-masked rows so the
        # backward's exp(s - lse) stays finite (p == 0 via s == NEG_INF).
        # Stored lane-broadcast (BLOCK_Q, LANES): Mosaic requires the last
        # two block dims be (8k, 128m)-shaped, so a flat (1, BLOCK_Q) block
        # is illegal — same layout jax's own TPU flash op uses for l/m.
        lse = jnp.where(l > 0, m + jnp.log(jnp.maximum(l, 1e-37)), 0.0)
        lse_ref[0] = jnp.broadcast_to(lse, (lse.shape[0], LANES))


def _flash_dq_kernel(
    kv_len_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
    *, scale, t_kv,
):
    """Grid: (BH, T_q // BLOCK_Q) — one q block accumulates over all kv."""
    kv_len = kv_len_ref[pl.program_id(0)]
    q = q_ref[0].astype(jnp.float32)          # (BLOCK_Q, D)
    do = do_ref[0].astype(jnp.float32)        # (BLOCK_Q, D)
    lse = lse_ref[0][:, :1]                   # (BLOCK_Q, 1) from lane-bcast
    delta = delta_ref[0][:, :1]               # (BLOCK_Q, 1)

    n_kv = t_kv // BLOCK_KV

    def body(i, dq):
        k = k_ref[0, pl.ds(i * BLOCK_KV, BLOCK_KV), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * BLOCK_KV, BLOCK_KV), :].astype(jnp.float32)
        s = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        kv_ids = i * BLOCK_KV + jax.lax.broadcasted_iota(
            jnp.int32, (BLOCK_Q, BLOCK_KV), 1
        )
        s = jnp.where(kv_ids < kv_len, s, NEG_INF)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta) * scale
        return dq + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    dq = jax.lax.fori_loop(
        0, n_kv, body, jnp.zeros((BLOCK_Q, q_ref.shape[-1]), jnp.float32)
    )
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _flash_dkv_kernel(
    kv_len_ref, k_ref, v_ref, q_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    *, scale, t_q,
):
    """Grid: (BH, T_kv // BLOCK_KV) — one kv block accumulates over all q."""
    kv_len = kv_len_ref[pl.program_id(0)]
    k = k_ref[0].astype(jnp.float32)          # (BLOCK_KV, D)
    v = v_ref[0].astype(jnp.float32)          # (BLOCK_KV, D)
    kv_ids = pl.program_id(1) * BLOCK_KV + jax.lax.broadcasted_iota(
        jnp.int32, (1, BLOCK_KV), 1
    )  # (1, BLOCK_KV) — broadcast over the q rows of each block

    n_q = t_q // BLOCK_Q

    def body(i, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(i * BLOCK_Q, BLOCK_Q), :].astype(jnp.float32)
        do = do_ref[0, pl.ds(i * BLOCK_Q, BLOCK_Q), :].astype(jnp.float32)
        lse = lse_ref[0, pl.ds(i * BLOCK_Q, BLOCK_Q), :][:, :1]
        delta = delta_ref[0, pl.ds(i * BLOCK_Q, BLOCK_Q), :][:, :1]

        s = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BLOCK_Q, BLOCK_KV)
        s = jnp.where(kv_ids < kv_len, s, NEG_INF)
        p = jnp.exp(s - lse)

        dv = dv + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # p^T @ do -> (BLOCK_KV, D)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta) * scale
        dk = dk + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # ds^T @ q -> (BLOCK_KV, D)
        return dk, dv

    zeros = jnp.zeros((BLOCK_KV, k_ref.shape[-1]), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, n_q, body, (zeros, zeros))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (0, pad)
    return jnp.pad(x, cfg)


def _padded(q, k, v):
    BH, T, D = q.shape
    t_pad = int(np.ceil(T / BLOCK_Q) * BLOCK_Q)
    d_pad = int(np.ceil(D / 128) * 128)
    pad = lambda x: _pad_to(_pad_to(x, t_pad, 1), d_pad, 2)
    return pad(q), pad(k), pad(v), t_pad, d_pad


def _fwd_impl(q, k, v, kv_lens, interpret, with_lse=False):
    BH, T, D = q.shape
    scale = 1.0 / np.sqrt(D)
    qp, kp, vp, t_pad, d_pad = _padded(q, k, v)

    out_specs = [pl.BlockSpec((1, BLOCK_Q, d_pad), lambda b, i, kv: (b, i, 0))]
    out_shape = [jax.ShapeDtypeStruct((BH, t_pad, d_pad), q.dtype)]
    if with_lse:
        out_specs.append(
            pl.BlockSpec((1, BLOCK_Q, LANES), lambda b, i, kv: (b, i, 0))
        )
        out_shape.append(jax.ShapeDtypeStruct((BH, t_pad, LANES), jnp.float32))

    grid = (BH, t_pad // BLOCK_Q)
    res = pl.pallas_call(
        functools.partial(_flash_fwd_kernel, scale=scale, t_kv=t_pad),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                # index maps receive the scalar-prefetch ref as last arg
                pl.BlockSpec((1, BLOCK_Q, d_pad), lambda b, i, kv: (b, i, 0)),
                pl.BlockSpec((1, t_pad, d_pad), lambda b, i, kv: (b, 0, 0)),
                pl.BlockSpec((1, t_pad, d_pad), lambda b, i, kv: (b, 0, 0)),
            ],
            out_specs=out_specs,
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(kv_lens.astype(jnp.int32), qp, kp, vp)
    if with_lse:
        out, lse = res
        return out[:, :T, :D], lse  # lse lane-broadcast (BH, t_pad, LANES)
    return res[0][:, :T, :D], None


def _bwd_impl(q, k, v, kv_lens, o, lse_p, g, interpret):
    BH, T, D = q.shape
    scale = 1.0 / np.sqrt(D)
    qp, kp, vp, t_pad, d_pad = _padded(q, k, v)
    gp = _pad_to(_pad_to(g, t_pad, 1), d_pad, 2)
    # delta_i = sum_d do_i * o_i — the softmax-jacobian row correction,
    # lane-broadcast like lse for legal Mosaic block shapes
    delta = jnp.sum(
        g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1
    )  # (BH, T)
    delta_p = jnp.broadcast_to(
        _pad_to(delta, t_pad, 1)[..., None], (BH, t_pad, LANES)
    )

    kv32 = kv_lens.astype(jnp.int32)
    grid_q = (BH, t_pad // BLOCK_Q)
    dq = pl.pallas_call(
        functools.partial(_flash_dq_kernel, scale=scale, t_kv=t_pad),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid_q,
            in_specs=[
                pl.BlockSpec((1, BLOCK_Q, d_pad), lambda b, i, kv: (b, i, 0)),
                pl.BlockSpec((1, t_pad, d_pad), lambda b, i, kv: (b, 0, 0)),
                pl.BlockSpec((1, t_pad, d_pad), lambda b, i, kv: (b, 0, 0)),
                pl.BlockSpec((1, BLOCK_Q, d_pad), lambda b, i, kv: (b, i, 0)),
                pl.BlockSpec((1, BLOCK_Q, LANES), lambda b, i, kv: (b, i, 0)),
                pl.BlockSpec((1, BLOCK_Q, LANES), lambda b, i, kv: (b, i, 0)),
            ],
            out_specs=pl.BlockSpec((1, BLOCK_Q, d_pad), lambda b, i, kv: (b, i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((BH, t_pad, d_pad), q.dtype),
        interpret=interpret,
    )(kv32, qp, kp, vp, gp, lse_p, delta_p)

    grid_kv = (BH, t_pad // BLOCK_KV)
    dk, dv = pl.pallas_call(
        functools.partial(_flash_dkv_kernel, scale=scale, t_q=t_pad),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid_kv,
            in_specs=[
                pl.BlockSpec((1, BLOCK_KV, d_pad), lambda b, j, kv: (b, j, 0)),
                pl.BlockSpec((1, BLOCK_KV, d_pad), lambda b, j, kv: (b, j, 0)),
                pl.BlockSpec((1, t_pad, d_pad), lambda b, j, kv: (b, 0, 0)),
                pl.BlockSpec((1, t_pad, d_pad), lambda b, j, kv: (b, 0, 0)),
                pl.BlockSpec((1, t_pad, LANES), lambda b, j, kv: (b, 0, 0)),
                pl.BlockSpec((1, t_pad, LANES), lambda b, j, kv: (b, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, BLOCK_KV, d_pad), lambda b, j, kv: (b, j, 0)),
                pl.BlockSpec((1, BLOCK_KV, d_pad), lambda b, j, kv: (b, j, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((BH, t_pad, d_pad), k.dtype),
            jax.ShapeDtypeStruct((BH, t_pad, d_pad), v.dtype),
        ],
        interpret=interpret,
    )(kv32, kp, vp, qp, gp, lse_p, delta_p)

    trim = lambda x: x[:, :T, :D]
    return trim(dq), trim(dk), trim(dv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash(interpret, q, k, v, kv_lens):
    out, _ = _fwd_impl(q, k, v, kv_lens, interpret, with_lse=False)
    return out


def _flash_fwd_rule(interpret, q, k, v, kv_lens):
    out, lse = _fwd_impl(q, k, v, kv_lens, interpret, with_lse=True)
    return out, (q, k, v, kv_lens, out, lse)


def _flash_bwd_rule(interpret, res, g):
    q, k, v, kv_lens, o, lse = res
    dq, dk, dv = _bwd_impl(q, k, v, kv_lens, o, lse, g, interpret)
    return dq, dk, dv, None


_flash.defvjp(_flash_fwd_rule, _flash_bwd_rule)


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_attention(
    q: jnp.ndarray,      # (BH, T, D)
    k: jnp.ndarray,      # (BH, T, D)
    v: jnp.ndarray,      # (BH, T, D)
    kv_lens: jnp.ndarray,  # (BH,)
    interpret: bool = False,
) -> jnp.ndarray:
    """Length-masked attention with a flash forward and backward."""
    return _flash(interpret, q, k, v, kv_lens)


def attention_reference(q, k, v, kv_lens):
    """Plain XLA attention with the same masking — the fallback path and
    the kernel's correctness oracle."""
    BH, T, D = q.shape
    s = jnp.einsum("bqd,bkd->bqk", q, k) / np.sqrt(D)
    ids = jnp.arange(T)
    s = jnp.where(ids[None, None, :] < kv_lens[:, None, None], s, -1e9)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p, v)
