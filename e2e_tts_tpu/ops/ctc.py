"""Forward-sum (CTC) alignment loss, vectorized.

The reference loops over batch items calling ``nn.CTCLoss`` per utterance
(reference: unsupervised_fastspeech2/loss.py:187-215).  Because the target
sequence for alignment is always the strictly increasing 1..K, CTC reduces to
a fixed 2K+1-state left-to-right lattice; the forward algorithm is a
``lax.scan`` over mel frames with an O(K) vectorized inner step, vmapped over
the batch — no host loop, no per-item kernel launches.

Matches torch.nn.CTCLoss(zero_infinity=True, reduction="mean") semantics on
that lattice: per-item loss divided by target length, then batch-averaged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _logsumexp3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    m_safe = jnp.maximum(m, NEG_INF)
    return m_safe + jnp.log(
        jnp.exp(a - m_safe) + jnp.exp(b - m_safe) + jnp.exp(c - m_safe)
    )


def _forward_single(
    logits: jnp.ndarray, key_len: jnp.ndarray, query_len: jnp.ndarray,
    blank_logprob: float,
):
    """One item: logits (T_mel, K_max) raw alignment log-energies.

    Returns -log p(path covers phonemes 1..key_len) / key_len.
    """
    T, K = logits.shape
    # prepend blank class and renormalize over (blank + valid phonemes)
    classes = jnp.concatenate(
        [jnp.full((T, 1), blank_logprob, logits.dtype), logits], axis=1
    )
    class_valid = jnp.arange(K + 1) <= key_len  # blank + 1..key_len
    classes = jnp.where(class_valid[None, :], classes, NEG_INF)
    log_probs = jax.nn.log_softmax(classes, axis=-1)

    # CTC lattice: states s=0..2K; even = blank, odd = label (s+1)//2
    S = 2 * K + 1
    s = jnp.arange(S)
    state_class = jnp.where(s % 2 == 1, (s + 1) // 2, 0)

    alpha0 = jnp.full((S,), NEG_INF)
    alpha0 = alpha0.at[0].set(log_probs[0, 0])
    alpha0 = alpha0.at[1].set(log_probs[0, 1])

    t_ids = jnp.arange(T)

    def step(alpha, row):
        lp, t = row
        emit = lp[state_class]
        shift1 = jnp.concatenate([jnp.full((1,), NEG_INF), alpha[:-1]])
        shift2 = jnp.concatenate([jnp.full((2,), NEG_INF), alpha[:-2]])
        # skip transition (s-2 -> s) only into label states; labels are all
        # distinct (1..K) so it is always allowed
        skip = jnp.where(s % 2 == 1, shift2, NEG_INF)
        new_alpha = _logsumexp3(alpha, shift1, skip) + emit
        new_alpha = jnp.where((t > 0) & (t < query_len), new_alpha, alpha)
        return new_alpha, None

    alpha, _ = jax.lax.scan(step, alpha0, (log_probs, t_ids))

    # accept in final blank (s = 2*key_len) or final label (s = 2*key_len - 1)
    final_blank = alpha[2 * key_len]
    final_label = alpha[2 * key_len - 1]
    m = jnp.maximum(final_blank, final_label)
    total = m + jnp.log(jnp.exp(final_blank - m) + jnp.exp(final_label - m))
    loss = -total / key_len.astype(logits.dtype)
    # zero_infinity=True: infeasible alignments contribute 0
    return jnp.where(jnp.isfinite(loss) & (total > NEG_INF / 2), loss, 0.0)


def forward_sum_loss(
    attn_logprob: jnp.ndarray,
    text_lens: jnp.ndarray,
    mel_lens: jnp.ndarray,
    blank_logprob: float = -1.0,
) -> jnp.ndarray:
    """Batched forward-sum loss.

    attn_logprob: (B, T_mel, T_text) unnormalized alignment log-energies
    (the aligner's pre-softmax output, reference layers.py:363).
    """
    per_item = jax.vmap(_forward_single, in_axes=(0, 0, 0, None))(
        attn_logprob, text_lens, mel_lens, blank_logprob
    )
    return jnp.mean(per_item)
