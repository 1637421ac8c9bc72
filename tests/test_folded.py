"""Time-fold-to-lanes vocoder rewrite (kernels/folded_tail.py).

The fold is an exact algebraic transform: per-op tests check bit-level
equivalence against the direct lax convs; the full-generator test allows
reassociation noise (XLA picks different f32 accumulation paths for the
in-graph weight-norm vs the prefused kernels — measured ~5e-3 rel on this
18-conv chain, well under the bf16 rounding the serving path runs at).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e2e_tts_tpu.config import default_config
from e2e_tts_tpu.kernels.folded_tail import (
    FoldedHifiGan,
    fold_conv_weight,
    fold_convT_weight,
    fold_head_weight,
)


def _conv(x, w, dil=1, pad=None):
    k = w.shape[0]
    total = (k - 1) * dil
    if pad is None:
        pad = (total // 2, total - total // 2)
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[pad], rhs_dilation=(dil,),
        dimension_numbers=("NWC", "WIO", "NWC"))


def _convT(x, w, k, s):
    p = (k - s) // 2
    return jax.lax.conv_general_dilated(
        x, jnp.flip(w, 0), window_strides=(1,), padding=[(k - 1 - p,) * 2],
        lhs_dilation=(s,), dimension_numbers=("NWC", "WIO", "NWC"))


@pytest.mark.parametrize("k,d", [(3, 1), (3, 5), (7, 3), (11, 5), (11, 1)])
def test_fold_conv_exact(k, d):
    rng = np.random.RandomState(0)
    B, T, C, F = 2, 64, 32, 4
    x = rng.randn(B, T, C).astype(np.float32)
    w = (rng.randn(k, C, C) * 0.1).astype(np.float32)
    y_ref = np.asarray(_conv(jnp.asarray(x), jnp.asarray(w), d))
    wf = fold_conv_weight(w, d, F)
    yf = np.asarray(_conv(jnp.asarray(x.reshape(B, T // F, F * C)),
                          jnp.asarray(wf)))
    assert np.abs(yf.reshape(B, T, C) - y_ref).max() < 1e-4


def test_fold_convT_exact():
    rng = np.random.RandomState(1)
    B, T, k, s, c_in, c_out = 2, 32, 4, 2, 64, 32
    f_in = 2
    x = rng.randn(B, T, c_in).astype(np.float32)
    w = (rng.randn(k, c_in, c_out) * 0.1).astype(np.float32)
    y_ref = np.asarray(_convT(jnp.asarray(x), jnp.asarray(w), k, s))
    wf, lpad = fold_convT_weight(w, s, f_in)
    kf = wf.shape[0]
    yf = np.asarray(_conv(jnp.asarray(x.reshape(B, T // f_in, f_in * c_in)),
                          jnp.asarray(wf), pad=(lpad, kf - 1 - lpad)))
    assert np.abs(yf.reshape(B, T * s, c_out) - y_ref).max() < 1e-4


def test_fold_head_exact():
    rng = np.random.RandomState(2)
    B, T, C, F, k = 2, 64, 32, 4, 7
    x = rng.randn(B, T, C).astype(np.float32)
    w = (rng.randn(k, C, 1) * 0.1).astype(np.float32)
    y_ref = np.asarray(_conv(jnp.asarray(x), jnp.asarray(w)))
    wf, hf = fold_head_weight(w, F)
    yf = np.asarray(_conv(jnp.asarray(x.reshape(B, T // F, F * C)),
                          jnp.asarray(wf), pad=(hf, hf)))
    assert np.abs(yf.reshape(B, T, 1) - y_ref).max() < 1e-4


@pytest.fixture(scope="module")
def hifigan_pair():
    from e2e_tts_tpu.models.vocoder import build_generator, init_generator_params

    cfg = default_config()
    gen = build_generator(cfg, "hifigan", dtype=jnp.float32)
    params = init_generator_params(gen, jax.random.PRNGKey(0))
    return cfg, gen, params


def test_folded_generator_matches_flax(hifigan_pair):
    cfg, gen, params = hifigan_pair
    folded = FoldedHifiGan(cfg.models.hifigan, params)
    mel = jnp.asarray(np.random.RandomState(0).randn(2, 24, 80), jnp.float32)
    y_ref = np.asarray(gen.apply(params, mel))
    y_fold = np.asarray(folded(folded.weights, mel))
    assert y_fold.shape == y_ref.shape
    rel = np.abs(y_fold - y_ref).max() / (np.abs(y_ref).max() + 1e-9)
    assert rel < 2e-2  # reassociation noise; serving runs bf16 (ulp ~4e-3)


def test_engine_folded_vocoder_end_to_end():
    """The engine's folded path produces the same audio as the flax path."""
    from e2e_tts_tpu.serve import SynthesisEngine

    base = SynthesisEngine.from_random(seed=0, use_folded_vocoder=False)
    fold = SynthesisEngine(
        base.config, base.acoustic_params, base.vocoder_params,
        base.speakers, base.stats, vocoder_kind="hifigan",
        use_folded_vocoder=True,
    )
    assert fold.use_folded_vocoder and not base.use_folded_vocoder
    text = "xin chào các bạn"
    a = base.synthesize(text, silence_distance=0.0).astype(np.float32)
    b = fold.synthesize(text, silence_distance=0.0).astype(np.float32)
    assert a.shape == b.shape and len(a) > 0
    # int16 waveforms; reassociation noise stays far below audibility
    # (random-init output is near-silent, so correlation is undefined —
    # the bundle-level quality test covers trained-weight parity)
    assert np.abs(a - b).max() <= 256  # < -42 dBFS
