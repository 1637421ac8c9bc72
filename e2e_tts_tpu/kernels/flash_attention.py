"""Pallas flash attention (forward only) — RETIRED from the default path.

The decoder attends over up-to-2048-frame mel sequences; the forward kernel
streams KV blocks through VMEM with an online-softmax accumulator, so scores
never leave VMEM (standard flash-attention scheme, blocked for the 128x128
MXU).  Variable lengths are handled with -inf masking on key blocks past
kv_len.

DECISION (round 5, recorded per tools/bench_flash.py on a real v5e chip,
bf16, B=16 H=2 D=128 — assets/bench/flash_attention_v5e.json):

    T      fwd flash/XLA   bwd flash/XLA
    256        0.67x           0.79x
    512        0.67x           0.53x
    1024       0.37x           0.72x
    2048       0.42x           0.73x

XLA's fused attention wins at EVERY decoder-realistic shape, including the
T=2048 width the kernel was built for: at d_model=384 with 2 heads the
score matrix is small relative to the MXU-bound projections, XLA already
keeps the softmax fused, and the hand kernel only adds grid overhead.  The
backward (recompute-scheme dq/dkv kernels, ~180 LoC) was therefore DELETED
— training always uses XLA attention.  The forward stays available behind
the documented experimental `use_flash=True` flag (serve/engine.py) for
future hardware where the balance may flip; it is inference-only — taking
gradients through it raises, by design.

Reference context: the upstream repo has no attention kernels at all (plain
bmm softmax, e2e_tts/models/acoustic/unsupervised_fastspeech2/blocks/
transformer.py:243-261); this kernel was always a beyond-parity experiment.
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


def _flash_fwd_kernel(kv_len_ref, q_ref, k_ref, v_ref, o_ref, *, scale, t_kv):
    """Grid: (BH, T_q // BLOCK_Q).  Blocks: q (1, BLOCK_Q, D); k/v stream."""
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


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (0, pad)
    return jnp.pad(x, cfg)


def _fwd_impl(q, k, v, kv_lens, interpret):
    BH, T, D = q.shape
    scale = 1.0 / np.sqrt(D)
    t_pad = int(np.ceil(T / BLOCK_Q) * BLOCK_Q)
    d_pad = int(np.ceil(D / 128) * 128)
    pad = lambda x: _pad_to(_pad_to(x, t_pad, 1), d_pad, 2)
    qp, kp, vp = pad(q), pad(k), pad(v)

    grid = (BH, t_pad // BLOCK_Q)
    out = pl.pallas_call(
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
            out_specs=pl.BlockSpec((1, BLOCK_Q, d_pad), lambda b, i, kv: (b, i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((BH, t_pad, d_pad), q.dtype),
        interpret=interpret,
    )(kv_lens.astype(jnp.int32), qp, kp, vp)
    return out[:, :T, :D]


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_attention(
    q: jnp.ndarray,      # (BH, T, D)
    k: jnp.ndarray,      # (BH, T, D)
    v: jnp.ndarray,      # (BH, T, D)
    kv_lens: jnp.ndarray,  # (BH,)
    interpret: bool = False,
) -> jnp.ndarray:
    """Length-masked flash attention, FORWARD ONLY (inference path).

    The backward kernels were retired in round 5 (see module docstring);
    differentiating through this op raises — training uses XLA attention.
    """
    return _fwd_impl(q, k, v, kv_lens, interpret)


def attention_reference(q, k, v, kv_lens):
    """Plain XLA attention with the same masking — the default path and
    the kernel's correctness oracle."""
    BH, T, D = q.shape
    s = jnp.einsum("bqd,bkd->bqk", q, k) / np.sqrt(D)
    ids = jnp.arange(T)
    s = jnp.where(ids[None, None, :] < kv_lens[:, None, None], s, -1e9)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p, v)
