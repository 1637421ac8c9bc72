"""Monotonic Alignment Search, on-device.

The reference round-trips attention to host memory every training step and
runs a numba DP kernel (reference: unsupervised_fastspeech2/layers.py:124-134,
function.py:96-137).  Here the same width-1 monotonic DP is a ``lax.scan``
over mel frames whose inner step is an O(T_text) vectorized max — the whole
search stays on the TPU inside the training program, and the backtrack is a
second (reverse) scan over the stored argmax bits.

Shapes are static; variable lengths are handled with -inf masking.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _mas_single(log_attn: jnp.ndarray, text_len: jnp.ndarray, mel_len: jnp.ndarray):
    """Width-1 MAS for one (T_mel, T_text) log-attention map.

    Returns a hard 0/1 alignment of the same shape.
    """
    T_mel, T_text = log_attn.shape
    j = jnp.arange(T_text)
    t_ids = jnp.arange(T_mel)

    # mask invalid text/mel cells
    valid_j = j < text_len
    log_attn = jnp.where(valid_j[None, :], log_attn, NEG_INF)

    # first frame must start at phoneme 0
    first = jnp.where(j == 0, log_attn[0], NEG_INF)

    def forward(log_p_prev, row):
        log_attn_i, i = row
        shifted = jnp.concatenate([jnp.full((1,), NEG_INF), log_p_prev[:-1]])
        from_left = shifted >= log_p_prev
        best_prev = jnp.maximum(shifted, log_p_prev)
        log_p = log_attn_i + best_prev
        # frames at/after mel_len: hold the carry so backtrack sees the
        # last valid row's scores
        log_p = jnp.where(i < mel_len, log_p, log_p_prev)
        return log_p, from_left

    _, from_left = jax.lax.scan(
        forward, first, (log_attn[1:], t_ids[1:])
    )
    # from_left[i-1] corresponds to transition into frame i
    from_left = jnp.concatenate(
        [jnp.zeros((1, T_text), bool), from_left], axis=0
    )

    # backtrack: reverse scan from the last valid frame at phoneme text_len-1
    def backward(cur_j, row):
        from_left_i, i = row
        active = i < mel_len
        out = jnp.where(
            active, jax.nn.one_hot(cur_j, T_text, dtype=jnp.float32), 0.0
        )
        step_left = from_left_i[cur_j] & active & (i > 0)
        nxt = jnp.where(step_left, cur_j - 1, cur_j)
        return nxt, out

    _, opt_rev = jax.lax.scan(
        backward,
        text_len - 1,
        (from_left[::-1], t_ids[::-1]),
    )
    opt = opt_rev[::-1]
    # anchor: frame 0 maps to phoneme 0 (reference function.py:123)
    opt = opt.at[0].set(
        jnp.where((j == 0) & (mel_len > 0), 1.0, opt[0])
    )
    return opt


def monotonic_align(
    attn: jnp.ndarray,
    text_lens: jnp.ndarray,
    mel_lens: jnp.ndarray,
    from_log: bool = False,
) -> jnp.ndarray:
    """Batched width-1 MAS.

    attn: (B, T_mel, T_text) soft attention (probabilities, or log-probs when
    ``from_log``).  Returns hard alignment (B, T_mel, T_text) float32 whose
    mel-axis sum gives per-phoneme durations.  Gradients are stopped — the
    hard alignment is a training target (reference layers.py:124-134).
    """
    log_attn = attn if from_log else jnp.log(jnp.maximum(attn, 1e-30))
    log_attn = jax.lax.stop_gradient(log_attn)
    hard = jax.vmap(_mas_single)(log_attn, text_lens, mel_lens)
    # zero out rows beyond mel_len (backtrack already does, belt&braces for j pad)
    j = jnp.arange(attn.shape[-1])
    hard = hard * (j[None, None, :] < text_lens[:, None, None])
    return hard


def mas_numpy(log_attn, text_len, mel_len):
    """NumPy oracle of the same DP (test use only): returns hard alignment
    for one unpadded (mel_len, text_len) map."""
    import numpy as np

    A = log_attn[:mel_len, :text_len].astype(np.float64).copy()
    A[0, 1:] = -np.inf
    log_p = np.full_like(A, -np.inf)
    log_p[0] = A[0]
    prev = np.zeros(A.shape, dtype=np.int64)
    for i in range(1, mel_len):
        for jj in range(text_len):
            best, arg = log_p[i - 1, jj], jj
            if jj > 0 and log_p[i - 1, jj - 1] >= best:
                best, arg = log_p[i - 1, jj - 1], jj - 1
            log_p[i, jj] = A[i, jj] + best
            prev[i, jj] = arg
    opt = np.zeros_like(A)
    jj = text_len - 1
    for i in range(mel_len - 1, -1, -1):
        opt[i, jj] = 1
        jj = prev[i, jj]
    opt[0, jj] = 1
    out = np.zeros(log_attn.shape)
    out[:mel_len, :text_len] = opt
    return out
