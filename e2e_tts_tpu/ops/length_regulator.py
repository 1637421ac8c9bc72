"""Length regulation (phoneme -> frame expansion) as static-shape gathers.

The reference expands with a Python loop over batch items and
``tensor.expand`` per phoneme (reference: unsupervised_fastspeech2/
layers.py:423-457) — impossible under jit.  Here expansion is a gather:

    mel2ph[t] = #{ j : cumsum(dur)[j] <= t }        (searchsorted)
    x_mel[t]  = x_phon[mel2ph[t]]

which is one O(T log L) vectorized op with fully static shapes; padding
frames (t >= sum(dur)) clamp to the last phoneme and are masked by callers.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def durations_to_mel2ph(durations: jnp.ndarray, max_mel_len: int) -> jnp.ndarray:
    """(B, L) int durations -> (B, T) phoneme index per mel frame.

    Frames beyond the total duration point at the last phoneme (masked out
    downstream via mel_lens).
    """
    cs = jnp.cumsum(durations.astype(jnp.int32), axis=-1)  # (B, L)
    t = jnp.arange(max_mel_len, dtype=jnp.int32)

    def per_item(cs_row):
        return jnp.searchsorted(cs_row, t, side="right")

    mel2ph = jax.vmap(per_item)(cs)
    return jnp.minimum(mel2ph, durations.shape[-1] - 1)


def regulate_length(
    x: jnp.ndarray, durations: jnp.ndarray, max_mel_len: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Expand (B, L, H) phoneme features by (B, L) durations.

    Returns (x_mel (B, T, H), mel_lens (B,), mel2ph (B, T)).
    """
    mel2ph = durations_to_mel2ph(durations, max_mel_len)
    x_mel = jnp.take_along_axis(x, mel2ph[..., None], axis=1)
    mel_lens = jnp.minimum(
        jnp.sum(durations, axis=-1).astype(jnp.int32), max_mel_len
    )
    # zero padding frames so downstream matmuls see clean zeros
    t = jnp.arange(max_mel_len, dtype=jnp.int32)
    valid = t[None, :] < mel_lens[:, None]
    x_mel = x_mel * valid[..., None].astype(x_mel.dtype)
    return x_mel, mel_lens, mel2ph


def expansion_matrix(
    durations: jnp.ndarray, max_mel_len: int
) -> jnp.ndarray:
    """(B, L) durations -> (B, T, L) one-hot expansion matrix.

    ``x_mel = expansion_matrix @ x_phon`` — the MXU-friendly alternative used
    when the expansion must stay a matmul (e.g. fusing with an adjacent
    projection, or soft-alignment expansion during aligner warmup).
    """
    mel2ph = durations_to_mel2ph(durations, max_mel_len)
    mel_lens = jnp.sum(durations, axis=-1).astype(jnp.int32)
    onehot = jax.nn.one_hot(mel2ph, durations.shape[-1], dtype=jnp.float32)
    t = jnp.arange(max_mel_len, dtype=jnp.int32)
    valid = (t[None, :] < mel_lens[:, None]).astype(jnp.float32)
    return onehot * valid[..., None]


def average_by_segments(
    frame_feature: jnp.ndarray,
    mel2ph: jnp.ndarray,
    mel_lens: jnp.ndarray,
    n_segments: int,
) -> jnp.ndarray:
    """Frame-level -> phoneme-level pooling (mean per assigned segment).

    Replaces the reference's per-item numpy loop ``get_phoneme_level``
    (function.py:155-175) with a one-hot segment-sum matmul:
    (B, T) features, (B, T) segment ids -> (B, n_segments) means.
    """
    t = jnp.arange(mel2ph.shape[-1], dtype=jnp.int32)
    valid = (t[None, :] < mel_lens[:, None]).astype(frame_feature.dtype)
    onehot = jax.nn.one_hot(mel2ph, n_segments, dtype=frame_feature.dtype)
    onehot = onehot * valid[..., None]
    sums = jnp.einsum("btl,bt->bl", onehot, frame_feature)
    counts = jnp.sum(onehot, axis=1)
    return sums / jnp.maximum(counts, 1.0)


def sum_by_words(
    phoneme_values: jnp.ndarray, word_ids: jnp.ndarray, n_words: int
) -> jnp.ndarray:
    """Pool phoneme-level values to word level by summing.

    Replaces the reference's double Python loop ``phone2words``
    (function.py:140-152).  ``word_ids``: (B, L) word index per phoneme
    (padding positions must carry word_id = n_words-ignored via zero value).
    """
    onehot = jax.nn.one_hot(word_ids, n_words, dtype=phoneme_values.dtype)
    return jnp.einsum("blw,bl->bw", onehot, phoneme_values)
