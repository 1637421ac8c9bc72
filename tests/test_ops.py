"""Core op tests: length regulator vs loop oracle, MAS vs DP oracle,
forward-sum vs torch.nn.CTCLoss, pooling ops, masks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from e2e_tts_tpu.ops import (
    average_by_segments,
    bucketize,
    durations_to_mel2ph,
    expansion_matrix,
    f0_to_coarse,
    forward_sum_loss,
    monotonic_align,
    regulate_length,
    sequence_mask,
    sum_by_words,
)
from e2e_tts_tpu.ops.mas import mas_numpy


@pytest.mark.smoke
def test_sequence_mask():
    m = sequence_mask(jnp.array([3, 1, 0]), 4)
    assert m.tolist() == [
        [True, True, True, False],
        [True, False, False, False],
        [False, False, False, False],
    ]


@pytest.mark.smoke
def test_mel2ph_and_regulate_vs_loop_oracle():
    rng = np.random.RandomState(0)
    B, L, H, T = 3, 7, 5, 30
    durs = rng.randint(0, 5, size=(B, L)).astype(np.int32)
    x = rng.randn(B, L, H).astype(np.float32)

    x_mel, mel_lens, mel2ph = regulate_length(jnp.asarray(x), jnp.asarray(durs), T)

    for b in range(B):
        # loop oracle: repeat each phoneme vector dur times (reference
        # LengthRegulator semantics, layers.py:429-452)
        expanded = np.concatenate(
            [np.repeat(x[b, j : j + 1], durs[b, j], axis=0) for j in range(L)]
        ) if durs[b].sum() else np.zeros((0, H), np.float32)
        n = min(len(expanded), T)
        assert mel_lens[b] == min(durs[b].sum(), T)
        np.testing.assert_allclose(np.asarray(x_mel)[b, :n], expanded[:n], rtol=1e-6)
        # padding region zeroed
        assert np.abs(np.asarray(x_mel)[b, mel_lens[b]:]).max() == 0 if mel_lens[b] < T else True


@pytest.mark.smoke
def test_expansion_matrix_equals_gather():
    rng = np.random.RandomState(1)
    B, L, H, T = 2, 5, 4, 16
    durs = jnp.asarray(rng.randint(0, 5, size=(B, L)), jnp.int32)
    x = jnp.asarray(rng.randn(B, L, H), jnp.float32)
    x_mel, mel_lens, _ = regulate_length(x, durs, T)
    E = expansion_matrix(durs, T)
    x_mel2 = jnp.einsum("btl,blh->bth", E, x)
    np.testing.assert_allclose(np.asarray(x_mel), np.asarray(x_mel2), atol=1e-6)


@pytest.mark.smoke
def test_mas_matches_numpy_oracle():
    rng = np.random.RandomState(2)
    B, T_mel, T_text = 4, 40, 13
    attn = rng.rand(B, T_mel, T_text).astype(np.float32) + 1e-4
    attn /= attn.sum(-1, keepdims=True)
    text_lens = np.array([13, 9, 5, 2])
    mel_lens = np.array([40, 31, 17, 6])

    hard = np.asarray(
        monotonic_align(jnp.asarray(attn), jnp.asarray(text_lens), jnp.asarray(mel_lens))
    )
    for b in range(B):
        oracle = mas_numpy(np.log(attn[b]), text_lens[b], mel_lens[b])
        np.testing.assert_array_equal(hard[b], oracle, err_msg=f"item {b}")


@pytest.mark.smoke
def test_mas_durations_are_valid():
    rng = np.random.RandomState(3)
    attn = rng.rand(2, 50, 11).astype(np.float32)
    text_lens = jnp.array([11, 7])
    mel_lens = jnp.array([50, 33])
    hard = monotonic_align(jnp.asarray(attn), text_lens, mel_lens)
    durs = np.asarray(hard.sum(axis=1))
    # every valid phoneme gets >= 1 frame; durations sum to mel_len
    for b, (tl, ml) in enumerate([(11, 50), (7, 33)]):
        assert durs[b, :tl].sum() == ml
        assert (durs[b, :tl] >= 1).all()
        assert durs[b, tl:].sum() == 0


def _torch_forward_sum(attn_logprob, text_lens, mel_lens, blank=-1.0):
    """The reference ForwardSumLoss (loss.py:187-215) as an oracle."""
    B = attn_logprob.shape[0]
    x = torch.from_numpy(attn_logprob).unsqueeze(1)  # (B,1,T_mel,T_text)
    x = torch.nn.functional.pad(x, (1, 0), value=blank)
    ctc = torch.nn.CTCLoss(zero_infinity=True)
    total = 0.0
    for b in range(B):
        kl, ql = int(text_lens[b]), int(mel_lens[b])
        target = torch.arange(1, kl + 1).unsqueeze(0)
        cur = x[b].permute(1, 0, 2)[:ql, :, : kl + 1]
        cur = torch.nn.functional.log_softmax(cur[None], dim=3)[0]
        total = total + ctc(
            cur, target,
            input_lengths=torch.tensor([ql]), target_lengths=torch.tensor([kl]),
        )
    return float(total / B)


@pytest.mark.smoke
def test_forward_sum_matches_torch_ctc():
    rng = np.random.RandomState(4)
    B, T_mel, T_text = 3, 25, 8
    logp = rng.randn(B, T_mel, T_text).astype(np.float32)
    text_lens = np.array([8, 5, 3])
    mel_lens = np.array([25, 18, 9])
    ours = float(
        forward_sum_loss(jnp.asarray(logp), jnp.asarray(text_lens), jnp.asarray(mel_lens))
    )
    theirs = _torch_forward_sum(logp, text_lens, mel_lens)
    assert abs(ours - theirs) < 2e-3, (ours, theirs)


def test_forward_sum_grad_finite():
    rng = np.random.RandomState(5)
    logp = jnp.asarray(rng.randn(2, 20, 6).astype(np.float32))
    g = jax.grad(
        lambda x: forward_sum_loss(x, jnp.array([6, 4]), jnp.array([20, 12]))
    )(logp)
    assert np.isfinite(np.asarray(g)).all()


@pytest.mark.smoke
def test_average_by_segments():
    # 2 phonemes: frames [0,1] -> ph0, [2,3,4] -> ph1; one padded frame
    feat = jnp.asarray([[1.0, 3.0, 2.0, 4.0, 6.0, 99.0]])
    mel2ph = jnp.asarray([[0, 0, 1, 1, 1, 1]])
    out = average_by_segments(feat, mel2ph, jnp.array([5]), 2)
    np.testing.assert_allclose(np.asarray(out), [[2.0, 4.0]], atol=1e-6)


@pytest.mark.smoke
def test_sum_by_words():
    pdur = jnp.asarray([[2.0, 3.0, 1.0, 4.0, 0.0]])
    word_ids = jnp.asarray([[0, 0, 1, 2, 2]])
    out = sum_by_words(pdur, word_ids, 3)
    np.testing.assert_allclose(np.asarray(out), [[5.0, 1.0, 4.0]], atol=1e-6)


def test_f0_to_coarse_matches_host():
    from e2e_tts_tpu.audio.features import f0_to_coarse as host_f0
    f0 = np.array([0.0, 55.0, 110.0, 440.0, 880.0, 1100.0])
    ours = np.asarray(f0_to_coarse(jnp.asarray(f0)))
    theirs = host_f0(f0)
    np.testing.assert_array_equal(ours, theirs)


@pytest.mark.smoke
def test_bucketize_matches_torch():
    bounds = np.linspace(-2, 2, 255).astype(np.float32)
    x = np.random.RandomState(6).randn(100).astype(np.float32)
    # include values exactly ON boundaries: torch (right=False) puts them
    # in the LOWER bin (side='left'); random draws never cover this edge
    x = np.concatenate([x, bounds[:5], bounds[-3:], [-2.0, 2.0]])
    ours = np.asarray(bucketize(jnp.asarray(x), jnp.asarray(bounds)))
    theirs = torch.bucketize(torch.from_numpy(x), torch.from_numpy(bounds)).numpy()
    np.testing.assert_array_equal(ours, theirs)
