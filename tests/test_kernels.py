"""Pallas kernel tests (interpret mode on CPU; the compiled TPU path has a
gated test below plus bench/serving coverage)."""

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


def _grad_case(interpret: bool, tol: float):
    """Flash VJP vs the XLA-attention oracle, masked-loss gradients."""
    rng = np.random.RandomState(2)
    BH, T, D = 4, 300, 64
    q = jnp.asarray(rng.randn(BH, T, D), jnp.float32) * 0.3
    k = jnp.asarray(rng.randn(BH, T, D), jnp.float32) * 0.3
    v = jnp.asarray(rng.randn(BH, T, D), jnp.float32)
    kv_lens = jnp.asarray([300, 257, 128, 1], jnp.int32)
    mask = (jnp.arange(T)[None, :] < kv_lens[:, None]).astype(jnp.float32)[..., None]

    def loss(fn):
        return lambda q, k, v: jnp.sum((fn(q, k, v) * mask) ** 2)

    g_ours = jax.grad(
        loss(lambda q, k, v: flash_attention(q, k, v, kv_lens, interpret=interpret)),
        argnums=(0, 1, 2),
    )(q, k, v)
    g_ref = jax.grad(
        loss(lambda q, k, v: attention_reference(q, k, v, kv_lens)),
        argnums=(0, 1, 2),
    )(q, k, v)
    for name, a, b in zip("qkv", g_ours, g_ref):
        assert bool(jnp.isfinite(a).all()), f"d{name} not finite"
        err = float(jnp.abs(a - b).max())
        assert err < tol, (name, err)


def test_flash_attention_vjp_matches_reference():
    _grad_case(interpret=True, tol=1e-4)


@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="compiled Pallas path needs a TPU"
)
def test_flash_attention_compiled_on_tpu():
    """Compiled-mode numerics: forward and backward on real hardware.
    Tolerances reflect the MXU's default (reduced-precision) matmul
    accumulation — measured ~8e-4 fwd / ~2e-4 grad on v5e."""
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
    _grad_case(interpret=False, tol=5e-3)
