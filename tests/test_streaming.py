"""Streaming vocoder tests: chunked output matches the full pass, and the
denoiser removes the vocoder bias."""

import jax
import jax.numpy as jnp
import numpy as np

from e2e_tts_tpu.config import default_config
from e2e_tts_tpu.models import build_generator
from e2e_tts_tpu.models.denoiser import Denoiser
from e2e_tts_tpu.serve.streaming import StreamingVocoder, stream_synthesize


def _small_gen():
    cfg = default_config()
    hifi = cfg.models.hifigan.replace(
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3), (1, 3)),
    )
    cfg = cfg.replace(models=cfg.models.replace(hifigan=hifi))
    gen = build_generator(cfg, "hifigan")
    params = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 80)))
    return gen, params


def test_streaming_matches_full_vocoding():
    gen, params = _small_gen()
    rng = np.random.RandomState(0)
    T = 150
    mel = rng.randn(T, 80).astype(np.float32) * 0.3

    full = np.asarray(gen.apply(params, jnp.asarray(mel[None])))[0]
    full_i16 = np.clip(full * 32767.0, -32768, 32767).astype(np.int16)

    streamer = StreamingVocoder(gen, params, 256, chunk_frames=48, halo_frames=16)
    chunks = list(streamer.stream(mel))
    assert len(chunks) >= 3
    streamed = np.concatenate(chunks)
    assert streamed.shape == full_i16.shape
    # identical up to int16 rounding at halo boundaries
    diff = np.abs(streamed.astype(np.int32) - full_i16.astype(np.int32))
    assert diff.max() <= 1, diff.max()


def test_stream_synthesize_end_to_end():
    from e2e_tts_tpu.serve import SynthesisEngine
    from e2e_tts_tpu.config import default_config

    cfg = default_config()
    fs2 = cfg.models.fastspeech2
    small = fs2.replace(
        encoder_layers=1, decoder_layers=1, encoder_hidden=64, decoder_hidden=64,
        building_block=fs2.building_block.replace(
            transformer=fs2.building_block.transformer.replace(conv_filter_size=64)
        ),
        postnet=fs2.postnet.replace(embedding_dim=64, conv_layers=2),
    )
    hifi = cfg.models.hifigan.replace(
        upsample_initial_channel=32, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
    )
    cfg = cfg.replace(models=cfg.models.replace(fastspeech2=small, hifigan=hifi))
    engine = SynthesisEngine.from_random(seed=0, config=cfg)

    chunks = list(stream_synthesize(engine, "xin chào việt nam"))
    assert chunks
    audio = np.concatenate(chunks)
    assert audio.dtype == np.int16 and len(audio) > 0

    # duration control flows into the streamed stages
    slow = np.concatenate(
        list(stream_synthesize(engine, "xin chào việt nam", duration_control=1.4))
    )
    assert len(slow) > len(audio)

    # long text (beyond the largest text bucket) streams via the same
    # chunking as engine.synthesize instead of crashing (review r3 finding)
    long_text = " ".join(["xin chào việt nam hôm nay trời đẹp"] * 12)
    long_chunks = list(stream_synthesize(engine, long_text))
    assert len(np.concatenate(long_chunks)) > len(audio)

    # unknown speakers fail loudly like the engine path
    import pytest as _pytest

    with _pytest.raises(KeyError):
        list(stream_synthesize(engine, "xin chào", speaker_id="nope"))


def test_denoiser_reduces_bias():
    gen, params = _small_gen()
    # fresh init has zero biases -> zero output on zero mel; perturb the
    # biases so the vocoder has a real bias floor to subtract
    k = jax.random.PRNGKey(7)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(k, len(leaves))
    leaves = [
        l + 0.05 * jax.random.normal(kk, l.shape) if l.ndim == 1 else l
        for l, kk in zip(leaves, keys)
    ]
    params = jax.tree_util.tree_unflatten(treedef, leaves)

    def vocode(mel):
        return gen.apply(params, mel)

    den = Denoiser(vocode, n_mel_channels=80, bias_frames=32)
    # the bias signal itself should be strongly attenuated
    bias_audio = vocode(jnp.zeros((1, 32, 80)))
    out = den(bias_audio, strength=1.0)
    n = min(out.shape[-1], bias_audio.shape[-1]) - 512
    before = float(jnp.abs(bias_audio[0, 256 : n]).mean())
    after = float(jnp.abs(out[0, 256 : n]).mean())
    assert after < before * 0.5, (before, after)
