"""Pallas kernel tests (interpret mode on CPU; the compiled TPU path has a
gated test below plus bench/serving coverage).

The flash BACKWARD was retired in round 5 — it lost to XLA at every decoder
shape (see kernels/flash_attention.py docstring and
assets/bench/flash_attention_v5e.json) — so only the forward is tested, and
one test pins the inference-only contract (grad raises)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


def test_flash_attention_is_inference_only():
    """The backward kernels were deleted (round-5 retirement); taking a
    gradient through the forward must raise, not silently mis-train."""
    rng = np.random.RandomState(2)
    BH, T, D = 2, 128, 64
    q = jnp.asarray(rng.randn(BH, T, D), jnp.float32)
    k = jnp.asarray(rng.randn(BH, T, D), jnp.float32)
    v = jnp.asarray(rng.randn(BH, T, D), jnp.float32)
    kv_lens = jnp.asarray([128, 64], jnp.int32)

    def loss(q):
        return jnp.sum(flash_attention(q, k, v, kv_lens, interpret=True) ** 2)

    with pytest.raises(Exception):
        jax.grad(loss)(q)


@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="compiled Pallas path needs a TPU"
)
def test_flash_attention_compiled_on_tpu():
    """Compiled-mode forward numerics on real hardware.  Tolerance reflects
    the MXU's default (reduced-precision) matmul accumulation."""
    rng = np.random.RandomState(3)
    BH, T, D = 4, 512, 192
    q = jnp.asarray(rng.randn(BH, T, D), jnp.float32) * 0.3
    k = jnp.asarray(rng.randn(BH, T, D), jnp.float32) * 0.3
    v = jnp.asarray(rng.randn(BH, T, D), jnp.float32)
    kv_lens = jnp.asarray([512, 300, 129, 64], jnp.int32)
    ours = np.asarray(flash_attention(q, k, v, kv_lens))
    ref = np.asarray(attention_reference(q, k, v, kv_lens))
    for b in range(BH):
        n = int(kv_lens[b])
        assert np.abs(ours[b, :n] - ref[b, :n]).max() < 5e-3
