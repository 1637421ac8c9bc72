"""Weight-conversion parity: run the REFERENCE torch models (numba stubbed)
with random weights, convert the state_dict, and compare outputs.

This is the BASELINE.md north-star check: mel MAE < 1e-3 vs the reference
CPU pipeline with identical (converted) weights.
"""

import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import torch

from conftest import REFERENCE_ROOT, requires_reference

torch.manual_seed(0)


def _stub_numba():
    if "numba" in sys.modules and not hasattr(sys.modules["numba"], "_is_stub"):
        return
    numba = types.ModuleType("numba")
    numba._is_stub = True

    def jit(*a, **k):
        def deco(fn):
            return fn
        return deco

    numba.jit = jit
    numba.prange = range
    sys.modules["numba"] = numba


def _anchor_durations(tmodel, frames: float = 6.0):
    """Pin the duration head to predict ~``frames`` per phoneme so parity
    tests don't depend on what random weights round durations to (duration
    = round(exp(x) - 1)); the converter copies the same weights, so both
    sides stay identical."""
    import math

    dp = tmodel.variance_adaptor.duration_predictor
    linear = getattr(dp, "linear", None) or dp.linear_layer
    with torch.no_grad():
        linear.weight.mul_(0.1)
        linear.bias.fill_(math.log(frames + 1.0))


def _stub_rotary():
    """Faithful reimplementation of lucidrains' rotary-embedding-torch
    (the package the reference lstransformer imports, absent from this
    image): interleaved channel pairs, freqs repeated per pair."""
    if "rotary_embedding_torch" in sys.modules:
        return
    import torch.nn as tnn
    from einops import rearrange, repeat

    mod = types.ModuleType("rotary_embedding_torch")

    def rotate_half(x):
        x = rearrange(x, "... (d r) -> ... d r", r=2)
        x1, x2 = x.unbind(dim=-1)
        x = torch.stack((-x2, x1), dim=-1)
        return rearrange(x, "... d r -> ... (d r)")

    def apply_rotary_emb(freqs, t, start_index=0):
        rot_dim = freqs.shape[-1]
        end = start_index + rot_dim
        t_left = t[..., :start_index]
        t_mid = t[..., start_index:end]
        t_right = t[..., end:]
        t_mid = (t_mid * freqs.cos()) + (rotate_half(t_mid) * freqs.sin())
        return torch.cat((t_left, t_mid, t_right), dim=-1)

    class RotaryEmbedding(tnn.Module):
        def __init__(self, dim, theta=10000):
            super().__init__()
            freqs = 1.0 / (
                theta ** (torch.arange(0, dim, 2)[: dim // 2].float() / dim)
            )
            self.register_buffer("freqs", freqs)
            self.cache = {}

        def forward(self, t, cache_key=None):
            if cache_key is not None and cache_key in self.cache:
                return self.cache[cache_key]
            if callable(t):
                t = t()
            freqs = torch.einsum(
                "..., f -> ... f", t.type(self.freqs.dtype), self.freqs
            )
            freqs = repeat(freqs, "... n -> ... (n r)", r=2)
            if cache_key is not None:
                self.cache[cache_key] = freqs
            return freqs

    mod.RotaryEmbedding = RotaryEmbedding
    mod.apply_rotary_emb = apply_rotary_emb
    mod.rotate_half = rotate_half
    sys.modules["rotary_embedding_torch"] = mod


@pytest.fixture(scope="module")
def ref_modules():
    _stub_numba()
    sys.path.insert(0, f"{REFERENCE_ROOT}/e2e_tts/models/acoustic")
    sys.path.insert(0, f"{REFERENCE_ROOT}/e2e_tts/models")
    import unsupervised_fastspeech2 as ref_fs2
    import vocoder as ref_voc

    return ref_fs2, ref_voc


@requires_reference
def test_acoustic_parity_with_converted_weights(ref_modules):
    ref_fs2, _ = ref_modules
    import jax
    import jax.numpy as jnp

    from e2e_tts_tpu.compat import convert_acoustic
    from e2e_tts_tpu.config import default_config
    from e2e_tts_tpu.models import FastSpeech2
    from e2e_tts_tpu.nn import FeatureStats
    from e2e_tts_tpu.text import symbols

    cfg = default_config()
    fs2_cfg = cfg.models.fastspeech2.replace(encoder_layers=2, decoder_layers=2)
    stats = FeatureStats()

    tmodel = ref_fs2.UnsupervisedFastSpeech2(
        n_symbols=len(symbols),
        n_speakers=3,
        n_channels=80,
        config=fs2_cfg.to_dict(),
        stats=stats.to_dict(),
        device=torch.device("cpu"),
    ).eval()

    B, L = 2, 17
    rng = np.random.RandomState(0)
    texts = rng.randint(4, len(symbols), (B, L)).astype(np.int64)
    txt_lens = np.array([17, 11])
    speakers = np.array([1, 2])

    with torch.no_grad():
        (t_mel, t_postnet, t_dur), t_mel_lens = tmodel.inference(
            speaker=torch.from_numpy(speakers),
            texts=torch.from_numpy(texts),
            txt_lens=torch.from_numpy(txt_lens),
            max_txt_len=L,
        )
    t_mel_lens = t_mel_lens.numpy()
    T = int(t_mel_lens.max())

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_acoustic(sd, encoder_layers=2, decoder_layers=2)

    jmodel = FastSpeech2(
        config=fs2_cfg,
        n_symbols=len(symbols),
        n_speakers=3,
        n_mel_channels=80,
        stats=stats,
    )
    out = jmodel.apply(
        variables,
        speakers=jnp.asarray(speakers, jnp.int32),
        texts=jnp.asarray(texts, jnp.int32),
        txt_lens=jnp.asarray(txt_lens, jnp.int32),
        max_mel_len=T,
    )

    j_dur = np.asarray(out["duration_rounded"])
    np.testing.assert_array_equal(
        j_dur[0, :17], t_dur.numpy()[0, :17]
    )
    j_mel_lens = np.asarray(out["mel_lens"])
    np.testing.assert_array_equal(j_mel_lens, t_mel_lens)

    j_post = np.asarray(out["postnet_mel"])
    for b in range(B):
        n = int(t_mel_lens[b])
        mae = np.abs(j_post[b, :n] - t_postnet.numpy()[b, :n]).mean()
        assert mae < 1e-3, f"item {b}: postnet mel MAE {mae}"
        mae_pre = np.abs(
            np.asarray(out["mel"])[b, :n] - t_mel.numpy()[b, :n]
        ).mean()
        assert mae_pre < 1e-3, f"item {b}: mel MAE {mae_pre}"


@requires_reference
def test_supervised_acoustic_parity(ref_modules):
    """The supervised (MFA-duration) reference tree through the same
    converter: durations bit-equal, postnet mel < 1e-3 MAE."""
    import importlib

    import jax.numpy as jnp

    import supervised_fastspeech2 as ref_sup

    from e2e_tts_tpu.compat import convert_acoustic
    from e2e_tts_tpu.config import default_config
    from e2e_tts_tpu.models import FastSpeech2
    from e2e_tts_tpu.nn import FeatureStats
    from e2e_tts_tpu.text import symbols

    cfg = default_config()
    fs2 = cfg.models.fastspeech2
    sup_cfg = fs2.replace(
        encoder_layers=2,
        decoder_layers=2,
        variance=fs2.variance.replace(
            duration_modelling=fs2.variance.duration_modelling.replace(
                learn_alignment=False
            )
        ),
    )
    stats = FeatureStats()
    tmodel = ref_sup.SupervisedFastSpeech2(
        n_symbols=len(symbols),
        n_speakers=2,
        n_channels=80,
        config=sup_cfg.to_dict(),
        stats=stats.to_dict(),
        device=torch.device("cpu"),
    ).eval()

    B, L = 2, 13
    rng = np.random.RandomState(3)
    texts = rng.randint(4, len(symbols), (B, L)).astype(np.int64)
    txt_lens = np.array([13, 9])
    speakers = np.array([0, 1])

    with torch.no_grad():
        # supervised tree signature: (speaker, texts, src_lens, max_src_len)
        (t_mel, t_postnet, t_dur), t_mel_lens = tmodel.inference(
            torch.from_numpy(speakers),
            torch.from_numpy(texts),
            torch.from_numpy(txt_lens),
            L,
        )
    T = int(t_mel_lens.numpy().max())

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_acoustic(
        sd, encoder_layers=2, decoder_layers=2, learn_alignment=False
    )
    jmodel = FastSpeech2(
        config=sup_cfg, n_symbols=len(symbols), n_speakers=2,
        n_mel_channels=80, stats=stats,
    )
    out = jmodel.apply(
        variables,
        speakers=jnp.asarray(speakers, jnp.int32),
        texts=jnp.asarray(texts, jnp.int32),
        txt_lens=jnp.asarray(txt_lens, jnp.int32),
        max_mel_len=T,
    )
    np.testing.assert_array_equal(
        np.asarray(out["mel_lens"]), t_mel_lens.numpy()
    )
    j_post = np.asarray(out["postnet_mel"])
    for b in range(B):
        n = int(t_mel_lens.numpy()[b])
        mae = np.abs(j_post[b, :n] - t_postnet.numpy()[b, :n]).mean()
        assert mae < 1e-3, f"item {b}: supervised postnet MAE {mae}"


@requires_reference
def test_conformer_acoustic_parity(ref_modules):
    torch.manual_seed(102)  # order-independent weights
    """Conformer building blocks through the converter: the reference
    conformer FS2 (blocks/conformer.py) and our ConformerEncoder/Decoder
    (nn/conformer.py) produce matching mels from converted weights."""
    ref_fs2, _ = ref_modules
    import jax.numpy as jnp

    from e2e_tts_tpu.compat import convert_acoustic
    from e2e_tts_tpu.config import default_config
    from e2e_tts_tpu.models import FastSpeech2
    from e2e_tts_tpu.nn import FeatureStats
    from e2e_tts_tpu.text import symbols

    cfg = default_config()
    fs2 = cfg.models.fastspeech2
    fs2_cfg = fs2.replace(
        encoder_layers=2,
        decoder_layers=2,
        building_block=fs2.building_block.replace(
            block_type="conformer",
            # the reference conformer never masks attention (its Sequential
            # drops the mask); parity requires reproducing that
            conformer=fs2.building_block.conformer.replace(
                mask_attention=False
            ),
        ),
    )
    stats = FeatureStats()

    tmodel = ref_fs2.UnsupervisedFastSpeech2(
        n_symbols=len(symbols),
        n_speakers=3,
        n_channels=80,
        config=fs2_cfg.to_dict(),
        stats=stats.to_dict(),
        device=torch.device("cpu"),
    ).eval()
    _anchor_durations(tmodel)

    B, L = 2, 15
    rng = np.random.RandomState(7)
    texts = rng.randint(4, len(symbols), (B, L)).astype(np.int64)
    txt_lens = np.array([15, 10])
    speakers = np.array([1, 2])

    with torch.no_grad():
        (t_mel, t_postnet, t_dur), t_mel_lens = tmodel.inference(
            speaker=torch.from_numpy(speakers),
            texts=torch.from_numpy(texts),
            txt_lens=torch.from_numpy(txt_lens),
            max_txt_len=L,
        )
    t_mel_lens = t_mel_lens.numpy()
    T = int(t_mel_lens.max())

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_acoustic(
        sd, encoder_layers=2, decoder_layers=2, block_type="conformer"
    )

    jmodel = FastSpeech2(
        config=fs2_cfg,
        n_symbols=len(symbols),
        n_speakers=3,
        n_mel_channels=80,
        stats=stats,
    )
    out = jmodel.apply(
        variables,
        speakers=jnp.asarray(speakers, jnp.int32),
        texts=jnp.asarray(texts, jnp.int32),
        txt_lens=jnp.asarray(txt_lens, jnp.int32),
        max_mel_len=T,
    )
    np.testing.assert_array_equal(
        np.asarray(out["duration_rounded"])[0, :L], t_dur.numpy()[0, :L]
    )
    np.testing.assert_array_equal(np.asarray(out["mel_lens"]), t_mel_lens)
    j_post = np.asarray(out["postnet_mel"])
    for b in range(B):
        n = int(t_mel_lens[b])
        mae = np.abs(j_post[b, :n] - t_postnet.numpy()[b, :n]).mean()
        assert mae < 1e-3, f"item {b}: conformer postnet MAE {mae}"


@requires_reference
def test_fastformer_acoustic_parity(ref_modules):
    torch.manual_seed(103)  # order-independent weights
    """Fastformer building blocks through the converter.  Runs in
    reference_compat mode: the reference FastAttention inverts head
    semantics (hidden//encoder_head heads of size encoder_head) and never
    zeroes padded rows before block 0 — both reproduced behind the flag."""
    ref_fs2, _ = ref_modules
    import jax.numpy as jnp

    from e2e_tts_tpu.compat import convert_acoustic
    from e2e_tts_tpu.config import default_config
    from e2e_tts_tpu.models import FastSpeech2
    from e2e_tts_tpu.nn import FeatureStats
    from e2e_tts_tpu.text import symbols

    cfg = default_config()
    fs2 = cfg.models.fastspeech2
    fs2_cfg = fs2.replace(
        encoder_layers=2,
        decoder_layers=2,
        building_block=fs2.building_block.replace(
            block_type="fastformer",
            fastformer=fs2.building_block.fastformer.replace(
                reference_compat=True
            ),
        ),
    )
    stats = FeatureStats()

    tmodel = ref_fs2.UnsupervisedFastSpeech2(
        n_symbols=len(symbols),
        n_speakers=3,
        n_channels=80,
        config=fs2_cfg.to_dict(),
        stats=stats.to_dict(),
        device=torch.device("cpu"),
    ).eval()
    _anchor_durations(tmodel)

    B, L = 2, 14
    rng = np.random.RandomState(11)
    texts = rng.randint(4, len(symbols), (B, L)).astype(np.int64)
    txt_lens = np.array([14, 9])
    speakers = np.array([0, 2])

    with torch.no_grad():
        (t_mel, t_postnet, t_dur), t_mel_lens = tmodel.inference(
            speaker=torch.from_numpy(speakers),
            texts=torch.from_numpy(texts),
            txt_lens=torch.from_numpy(txt_lens),
            max_txt_len=L,
        )
    t_mel_lens = t_mel_lens.numpy()
    T = int(t_mel_lens.max())

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_acoustic(
        sd, encoder_layers=2, decoder_layers=2, block_type="fastformer"
    )

    jmodel = FastSpeech2(
        config=fs2_cfg,
        n_symbols=len(symbols),
        n_speakers=3,
        n_mel_channels=80,
        stats=stats,
    )
    out = jmodel.apply(
        variables,
        speakers=jnp.asarray(speakers, jnp.int32),
        texts=jnp.asarray(texts, jnp.int32),
        txt_lens=jnp.asarray(txt_lens, jnp.int32),
        max_mel_len=T,
    )
    np.testing.assert_array_equal(np.asarray(out["mel_lens"]), t_mel_lens)
    assert t_mel_lens.max() > 0
    j_post = np.asarray(out["postnet_mel"])
    for b in range(B):
        n = int(t_mel_lens[b])
        if n == 0:  # random weights may predict zero frames for a row
            continue
        mae = np.abs(j_post[b, :n] - t_postnet.numpy()[b, :n]).mean()
        assert mae < 1e-3, f"item {b}: fastformer postnet MAE {mae}"


@requires_reference
def test_lstransformer_acoustic_parity(ref_modules):
    torch.manual_seed(104)  # order-independent weights
    """Long-short transformer blocks through the converter, in
    reference_compat mode (r=1, interleaved rotary, no input pre-zero)."""
    ref_fs2, _ = ref_modules
    _stub_rotary()
    import jax.numpy as jnp

    from e2e_tts_tpu.compat import convert_acoustic
    from e2e_tts_tpu.config import default_config
    from e2e_tts_tpu.models import FastSpeech2
    from e2e_tts_tpu.nn import FeatureStats
    from e2e_tts_tpu.text import symbols

    cfg = default_config()
    fs2 = cfg.models.fastspeech2
    fs2_cfg = fs2.replace(
        encoder_layers=2,
        decoder_layers=2,
        building_block=fs2.building_block.replace(
            block_type="lstransformer",
            lstransformer=fs2.building_block.lstransformer.replace(
                reference_compat=True
            ),
        ),
    )
    stats = FeatureStats()

    tmodel = ref_fs2.UnsupervisedFastSpeech2(
        n_symbols=len(symbols),
        n_speakers=3,
        n_channels=80,
        config=fs2_cfg.to_dict(),
        stats=stats.to_dict(),
        device=torch.device("cpu"),
    ).eval()
    _anchor_durations(tmodel)

    B, L = 2, 19
    rng = np.random.RandomState(5)
    texts = rng.randint(4, len(symbols), (B, L)).astype(np.int64)
    txt_lens = np.array([19, 12])
    speakers = np.array([2, 0])

    with torch.no_grad():
        (t_mel, t_postnet, t_dur), t_mel_lens = tmodel.inference(
            speaker=torch.from_numpy(speakers),
            texts=torch.from_numpy(texts),
            txt_lens=torch.from_numpy(txt_lens),
            max_txt_len=L,
        )
    t_mel_lens = t_mel_lens.numpy()
    T = int(t_mel_lens.max())

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_acoustic(
        sd, encoder_layers=2, decoder_layers=2, block_type="lstransformer"
    )

    jmodel = FastSpeech2(
        config=fs2_cfg,
        n_symbols=len(symbols),
        n_speakers=3,
        n_mel_channels=80,
        stats=stats,
    )
    out = jmodel.apply(
        variables,
        speakers=jnp.asarray(speakers, jnp.int32),
        texts=jnp.asarray(texts, jnp.int32),
        txt_lens=jnp.asarray(txt_lens, jnp.int32),
        max_mel_len=T,
    )
    np.testing.assert_array_equal(np.asarray(out["mel_lens"]), t_mel_lens)
    assert t_mel_lens.max() > 0
    j_post = np.asarray(out["postnet_mel"])
    for b in range(B):
        n = int(t_mel_lens[b])
        if n == 0:
            continue
        mae = np.abs(j_post[b, :n] - t_postnet.numpy()[b, :n]).mean()
        assert mae < 1e-3, f"item {b}: lstransformer postnet MAE {mae}"


@requires_reference
def test_istft_generator_parity(ref_modules):
    """iSTFTNet generator: converted weights produce the same spec/phase
    and the inverse transform matches torch.istft end to end."""
    _, ref_voc = ref_modules
    import jax.numpy as jnp

    from e2e_tts_tpu.compat.torch_import import convert_hifigan
    from e2e_tts_tpu.config import default_config
    from e2e_tts_tpu.models import build_generator
    from e2e_tts_tpu.models.vocoder import istft_to_audio

    cfg = default_config()
    icfg_d = cfg.models.istft.to_dict()
    icfg_d["resblock"] = "1"  # reference iSTFT compares against the string
    tgen = ref_voc.iSTFT(config=icfg_d).eval()

    rng = np.random.RandomState(5)
    mel = rng.randn(1, 80, 20).astype(np.float32) * 0.5
    with torch.no_grad():
        t_spec, t_phase = tgen(torch.from_numpy(mel))

    sd = {k: v.numpy() for k, v in tgen.state_dict().items()}
    params = convert_hifigan(sd, n_upsamples=2)
    jgen = build_generator(cfg, "istft")
    j_spec, j_phase = jgen.apply(params, jnp.asarray(mel.transpose(0, 2, 1)))

    assert np.abs(np.asarray(j_spec) - t_spec.numpy()).max() < 1e-3
    assert np.abs(np.asarray(j_phase) - t_phase.numpy()).max() < 1e-4

    # full audio path: our inverse STFT on torch's spec/phase vs torch.istft
    j_audio = np.asarray(
        istft_to_audio(jnp.asarray(t_spec.numpy()), jnp.asarray(t_phase.numpy()),
                       cfg.models.istft)
    )
    t_audio = torch.istft(
        t_spec * torch.exp(t_phase * 1j),
        n_fft=cfg.models.istft.gen_istft_n_fft,
        hop_length=cfg.models.istft.gen_istft_hop_size,
        win_length=cfg.models.istft.gen_istft_win_size,
        window=torch.hann_window(cfg.models.istft.gen_istft_win_size),
    ).numpy()
    n = min(j_audio.shape[-1], t_audio.shape[-1])
    assert np.abs(j_audio[..., :n] - t_audio[..., :n]).max() < 1e-4


@requires_reference
def test_hifigan_parity_with_converted_weights(ref_modules):
    _, ref_voc = ref_modules
    import jax.numpy as jnp

    from e2e_tts_tpu.compat import convert_hifigan
    from e2e_tts_tpu.config import default_config
    from e2e_tts_tpu.models import build_generator

    cfg = default_config()
    tgen = ref_voc.HifiGan(config=cfg.models.hifigan.to_dict()).eval()

    rng = np.random.RandomState(1)
    mel = rng.randn(1, 80, 24).astype(np.float32) * 0.5
    with torch.no_grad():
        t_audio = tgen(torch.from_numpy(mel)).squeeze(1).numpy()

    sd = {k: v.numpy() for k, v in tgen.state_dict().items()}
    params = convert_hifigan(sd)
    jgen = build_generator(cfg, "hifigan")
    j_audio = np.asarray(jgen.apply(params, jnp.asarray(mel.transpose(0, 2, 1))))

    assert j_audio.shape == t_audio.shape
    mae = np.abs(j_audio - t_audio).mean()
    assert mae < 1e-5, f"waveform MAE {mae}"


@requires_reference
def test_reformer_lsh_seeded_rotation_parity(ref_modules):
    """VERDICT r4 ask #8: the reformer was the only block family without a
    cross-implementation numeric check (runtime-random LSH rotations make
    weight conversion meaningless).  Injecting IDENTICAL seeded rotations
    into the reference torch LSHAttention (blocks/reformer.py:258) and
    nn/reformer.lsh_attention closes that: same rotations -> same buckets
    -> same sort -> same chunked attention -> same output.

    Config notes: n_hashes=1 because the reference flattens all rounds into
    one sorted sequence whose look-one-back crosses round boundaries, while
    this implementation keeps a round axis and wraps within the round — a
    documented structural deviation (nn/reformer.py module docstring) that
    only shows at multi-round boundaries.  attend_across_buckets=True
    matches the reference default (its binary semantics are exposed on
    lsh_attention for exactly this test)."""
    import types as _types

    if "product_key_memory" not in sys.modules:
        pkm_mod = _types.ModuleType("product_key_memory")
        pkm_mod.PKM = object
        sys.modules["product_key_memory"] = pkm_mod
    from unsupervised_fastspeech2.blocks.reformer import LSHAttention

    import jax
    import jax.numpy as jnp

    from e2e_tts_tpu.nn.reformer import lsh_attention

    B, T, D = 2, 256, 32
    bucket_size, n_hashes = 32, 1
    n_buckets = T // bucket_size

    rng = np.random.RandomState(0)
    qk = rng.randn(B, T, D).astype(np.float32)
    v = rng.randn(B, T, D).astype(np.float32)
    rot = rng.randn(D, n_hashes, n_buckets // 2).astype(np.float32)

    ref = LSHAttention(
        bucket_size=bucket_size, n_hashes=n_hashes, causal=True,
        attend_across_buckets=True, allow_duplicate_attention=True,
    )
    ref.eval()

    orig_randn = torch.randn

    def seeded_randn(shape, *args, **kwargs):
        assert tuple(shape) == (1, D, n_hashes, n_buckets // 2), shape
        return torch.from_numpy(rot)[None]

    torch.randn = seeded_randn
    try:
        with torch.no_grad():
            ref_out, _, ref_buckets = ref(
                torch.from_numpy(qk), torch.from_numpy(v)
            )
    finally:
        torch.randn = orig_randn

    ours = lsh_attention(
        jnp.asarray(qk), jnp.asarray(v),
        jnp.ones((B, T), bool), jax.random.PRNGKey(0),
        n_hashes=n_hashes, bucket_size=bucket_size, causal=True,
        rotations=jnp.asarray(rot), attend_across_buckets=True,
    )

    np.testing.assert_allclose(
        np.asarray(ours), ref_out.numpy(), atol=2e-5, rtol=1e-4
    )
