"""Streaming chunked synthesis (BASELINE config[3]).

The reference has no streaming path — it synthesizes whole utterances and
concatenates (src/api/utils.py:119-160).  Here the vocoder runs incrementally
over fixed mel chunks with a receptive-field halo: HiFi-GAN is fully
convolutional, so vocoding mel[c-H : c+C+H] and trimming H*hop samples from
each side yields exactly the same waveform as the full pass, chunk by chunk.
One jit program per chunk shape; first audio arrives after one chunk instead
of the whole utterance.
"""

from __future__ import annotations

from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

# halo of 16 mel frames covers HiFi-GAN's receptive field comfortably
# (conv_pre k7 + 3 resblocks k<=11 dil<=5 per stage => ~8 input frames)
DEFAULT_HALO = 16
DEFAULT_CHUNK = 64


class StreamingVocoder:
    """Incremental mel -> waveform with overlap-halo chunking."""

    def __init__(
        self,
        vocoder,
        vocoder_params,
        hop_length: int = 256,
        chunk_frames: int = DEFAULT_CHUNK,
        halo_frames: int = DEFAULT_HALO,
    ):
        self.vocoder = vocoder
        self.params = vocoder_params
        self.hop = hop_length
        self.chunk = chunk_frames
        self.halo = halo_frames
        self._jitted = {}

    def _program(self, frames: int):
        if frames not in self._jitted:
            def fn(params, mel):
                audio = self.vocoder.apply(params, mel)
                return jnp.clip(audio * 32767.0, -32768, 32767).astype(jnp.int16)

            self._jitted[frames] = jax.jit(fn)
        return self._jitted[frames]

    def stream(self, mel: np.ndarray, mel_len: Optional[int] = None) -> Iterator[np.ndarray]:
        """mel (T, n_mels) -> yields int16 waveform chunks totalling T*hop."""
        T = int(mel_len if mel_len is not None else mel.shape[0])
        C, H = self.chunk, self.halo
        up = None
        for start in range(0, T, C):
            end = min(start + C, T)
            lo = max(0, start - H)
            hi = min(T, end + H)
            # pad to the fixed program shape (H + C + H) so jit caches
            seg = np.zeros((C + 2 * H, mel.shape[1]), mel.dtype)
            seg[: hi - lo] = mel[lo:hi]
            audio = np.asarray(self._program(C + 2 * H)(self.params, seg[None]))[0]
            if up is None:
                up = audio.shape[0] // (C + 2 * H)
            a = (start - lo) * up          # skip left halo
            b = a + (end - start) * up     # keep exactly the chunk
            yield audio[a:b]

    def vocode(self, mel: np.ndarray, mel_len: Optional[int] = None) -> np.ndarray:
        parts = list(self.stream(mel, mel_len))
        if not parts:
            return np.zeros(0, np.int16)
        return np.concatenate(parts)


def stream_synthesize(
    engine,
    text: str,
    speaker_id: Optional[str] = None,
    chunk_frames: int = DEFAULT_CHUNK,
    halo_frames: int = DEFAULT_HALO,
    **controls,
) -> Iterator[np.ndarray]:
    """Full streaming pipeline: acoustic stages produce the mel, then audio
    chunks stream out as the vocoder consumes it.

    Text is chunked exactly like ``engine.synthesize`` (prepare_request:
    arrange_text budget + speaker validation), and a chunk whose predicted
    duration overflows the largest mel bucket is re-split at phoneme
    boundaries the same way the engine path does — long inputs stream
    instead of crashing or truncating.

    engine: serve.engine.SynthesisEngine (hifigan vocoder kind),
    single-host (control scalars feed the programs as plain floats).
    """
    from .engine import MAX_MEL_LEN, TEXT_BUCKETS, _bucket_for, _mel_bucket

    seqs, speaker = engine.prepare_request(text, speaker_id)
    if not seqs:
        return
    p = float(controls.get("pitch_control", 1.0))
    e = float(controls.get("energy_control", 1.0))
    d = float(controls.get("duration_control", 1.0))

    streamer = StreamingVocoder(
        engine.vocoder, engine.vocoder_params, engine.hop_length,
        chunk_frames, halo_frames,
    )
    B = engine.batch_size
    # pending items carry their own duration_control: a degenerate
    # single-phoneme chunk is re-queued k times at d/k (duration split)
    pending = [(np.asarray(s, np.int32), d) for s in seqs]
    while pending:
        seq, d_i = pending.pop(0)
        L = _bucket_for(len(seq), TEXT_BUCKETS)
        texts = np.zeros((B, L), np.int32)
        lens = np.ones((B,), np.int32)
        texts[0, : len(seq)] = seq
        lens[0] = len(seq)
        spk = np.full((B,), speaker, np.int32)

        x, durations = engine._stage1(L)(
            engine.acoustic_params, spk, texts, lens, p, e, d_i
        )
        total = int(np.asarray(durations)[0].sum())
        if total > MAX_MEL_LEN:
            pieces = engine._split_sequence(seq, total)
            if len(pieces) > 1:
                pending = [(piece, d_i) for piece in pieces] + pending
                continue
            # degenerate single-phoneme chunk: split the DURATION across
            # k slower passes instead of truncating (engine.py does the
            # same on the fused path)
            k = max(2, -(-total // MAX_MEL_LEN))
            pending = [(seq, d_i / k)] * k + pending
            continue
        T = _mel_bucket(min(total, MAX_MEL_LEN))

        # mel-only program (acoustic stage 2 without the fused vocoder);
        # shares the engine's program cache under its lock
        key = ("mel_only", L, T)
        with engine._cache_lock:
            if key not in engine._stage2_cache:
                def mel_fn(aparams, xx, dd, pc, ec, _T=T):
                    return engine.acoustic.apply(
                        aparams, xx, dd, max_mel_len=_T,
                        p_control=pc, e_control=ec,
                        method=engine.acoustic.synthesize_stage2,
                    )

                engine._stage2_cache[key] = jax.jit(mel_fn)
                engine.n_programs_compiled += 1
            fn = engine._stage2_cache[key]
        mel, mel_lens = fn(engine.acoustic_params, x, durations, p, e)
        yield from streamer.stream(
            np.asarray(mel[0]), int(np.asarray(mel_lens)[0])
        )
