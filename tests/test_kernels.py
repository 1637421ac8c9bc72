"""Pallas kernel tests (interpret mode on CPU; compiled path exercised on
real TPU by bench/serving)."""

import jax
import jax.numpy as jnp
import numpy as np

from e2e_tts_tpu.kernels import attention_reference, flash_attention


def test_flash_attention_matches_reference():
    rng = np.random.RandomState(0)
    BH, T, D = 4, 256, 192
    q = jnp.asarray(rng.randn(BH, T, D), jnp.float32) * 0.3
    k = jnp.asarray(rng.randn(BH, T, D), jnp.float32) * 0.3
    v = jnp.asarray(rng.randn(BH, T, D), jnp.float32)
    kv_lens = jnp.asarray([256, 200, 129, 64], jnp.int32)

    ours = flash_attention(q, k, v, kv_lens, interpret=True)
    ref = attention_reference(q, k, v, kv_lens)
    # compare only valid query rows (padding queries are meaningless)
    for b in range(BH):
        n = int(kv_lens[b])
        err = np.abs(np.asarray(ours)[b, :n] - np.asarray(ref)[b, :n]).max()
        assert err < 2e-5, (b, err)


def test_flash_attention_unaligned_shapes():
    rng = np.random.RandomState(1)
    BH, T, D = 2, 100, 64  # not multiples of the block sizes
    q = jnp.asarray(rng.randn(BH, T, D), jnp.float32) * 0.3
    k = jnp.asarray(rng.randn(BH, T, D), jnp.float32) * 0.3
    v = jnp.asarray(rng.randn(BH, T, D), jnp.float32)
    kv_lens = jnp.asarray([100, 37], jnp.int32)

    ours = flash_attention(q, k, v, kv_lens, interpret=True)
    ref = attention_reference(q, k, v, kv_lens)
    for b in range(BH):
        n = int(kv_lens[b])
        err = np.abs(np.asarray(ours)[b, :n] - np.asarray(ref)[b, :n]).max()
        assert err < 2e-5, (b, err)
