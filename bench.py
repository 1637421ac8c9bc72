"""Benchmark: batched synthesis real-time factor (RTF) per chip.

Measures the full serving path — g2p, bucketed batching, acoustic stage 1,
mel-bucket dispatch, acoustic stage 2 + HiFi-GAN fused program, device->host
int16 transfer, trim + stitch — on the default-size models (FastSpeech2
~35M + HiFi-GAN ~14M, BASELINE.md), bf16 compute.

Durations: random-init weights predict degenerate (<1 frame/phoneme)
durations, which would inflate the audio-seconds denominator dishonestly in
either direction; the bench therefore injects a production-realistic 6
frames/phoneme (+/- deterministic jitter) through the same compiled
programs — duration values change gather indices only, not FLOPs.

A second measurement times ``engine.synthesize`` VERBATIM — the exact
user-facing path (g2p, duration sync, fused dispatch with overflow fallback,
pipelined drain, host stitch).  So the audio-seconds denominator is
production-realistic rather than the degenerate <1 frame/phoneme a
random-init duration head predicts, the head's final bias is set to log(7)
(duration = round(exp(x) - 1), variance.py) and its kernel scaled to 0.3 —
the engine then *predicts* ~6 +/- 2 frames/phoneme through its own code
path; nothing else is touched.  Reported as ``serve_synthesize_rtf``.

Prints ONE JSON line:
  {"metric": "batched_synthesis_rtf_per_chip", "value": <rtf>,
   "unit": "rtf", "vs_baseline": <0.01 / rtf>,
   "serve_synthesize_rtf": <rtf of engine.synthesize verbatim>}

Baseline: the driver's north-star target RTF 0.01 (BASELINE.json); the
reference publishes no numbers (BASELINE.md).  vs_baseline > 1 means faster
than target.
"""

import json
import time

import numpy as np


SENTENCES = 2 * [
    "hôm nay trời đẹp chúng ta cùng nhau đi dạo quanh hồ gươm nhé",
    "việt nam là một đất nước xinh đẹp với nhiều danh lam thắng cảnh nổi tiếng",
    "công nghệ trí tuệ nhân tạo đang thay đổi cách chúng ta sống và làm việc",
    "buổi sáng tôi thường uống cà phê và đọc báo trước khi đi làm",
    "những cánh đồng lúa chín vàng trải dài đến tận chân trời xa xăm",
    "âm nhạc truyền thống việt nam mang đậm bản sắc văn hóa dân tộc",
    "trẻ em cần được học tập vui chơi và phát triển trong môi trường lành mạnh",
    "mùa thu hà nội với hương hoa sữa nồng nàn khắp các con phố nhỏ",
    "chiếc thuyền nhỏ lướt nhẹ trên mặt hồ phẳng lặng trong buổi chiều tà",
    "các nhà khoa học đang nghiên cứu những phương pháp điều trị mới",
    "đội tuyển bóng đá quốc gia vừa giành chiến thắng ấn tượng tối qua",
    "khu chợ nổi miền tây tấp nập ghe thuyền từ sáng sớm tinh mơ",
    "bữa cơm gia đình luôn là khoảnh khắc ấm áp nhất trong ngày",
    "những cơn mưa rào mùa hạ làm dịu đi cái nóng oi ả của thành phố",
    "cô giáo trẻ tận tụy dạy chữ cho các em nhỏ vùng cao xa xôi",
    "vịnh hạ long được công nhận là di sản thiên nhiên thế giới",
]

FRAMES_PER_PHONEME = 6


_PROGRAMS = {}


def _fused_with_durations(engine, L, T):
    """One dispatch: stage1 + injected durations + stage2 + vocoder
    (the engine's fused serving path, with the duration override for a
    realistic audio-length denominator)."""
    import jax
    import jax.numpy as jnp

    key = (id(engine), L, T)
    if key not in _PROGRAMS:

        def fn(aparams, vparams, speakers, texts, txt_lens, durs):
            x, _pred = engine.acoustic.apply(
                aparams, speakers, texts, txt_lens,
                method=engine.acoustic.synthesize_stage1,
            )
            mel, mel_lens = engine.acoustic.apply(
                aparams, x, durs, max_mel_len=T,
                method=engine.acoustic.synthesize_stage2,
            )
            audio = engine._voc_apply(vparams, mel)
            # engine's wire format (int16 / mu-law uint8), row-compacted at
            # frame granularity into a flat buffer like the production
            # drain (serve/engine.py _fused): bucket padding never rides
            # the D2H link — the dominant serving cost on a tunnel
            codes = engine._encode_transfer(audio)
            B = codes.shape[0]
            hop = engine.hop_length
            frames = codes.reshape(B * T, hop)
            offs = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32),
                 jnp.cumsum(mel_lens.astype(jnp.int32))]
            )
            j = jnp.arange(B * T, dtype=jnp.int32)
            row = jnp.clip(
                jnp.searchsorted(offs, j, side="right") - 1, 0, B - 1
            )
            src = row * T + jnp.clip(j - offs[row], 0, T - 1)
            flat = jnp.where(
                (j < offs[-1])[:, None], frames[src], 0
            ).astype(codes.dtype).reshape(-1)
            return flat, mel_lens

        _PROGRAMS[key] = jax.jit(fn)
    return _PROGRAMS[key]


def _flat_slice(n_total, k):
    import jax

    key = ("slice", n_total, k)
    if key not in _PROGRAMS:
        _PROGRAMS[key] = jax.jit(lambda f: f[:k])
    return _PROGRAMS[key]


def dispatch_batches(engine, seqs, rng):
    """Dispatch one serving pass over pre-tokenized sequences with injected
    realistic durations; returns [(batch_idx, device audio, device lens)]
    without fetching — XLA execution is async, so the caller can overlap the
    next dispatch with this pass's D2H transfers (the tunnel bottleneck),
    exactly like the production engine's pipelined drain (engine.py)."""
    import jax.numpy as jnp

    from e2e_tts_tpu.serve.engine import TEXT_BUCKETS, _bucket_for, _mel_bucket

    B = engine.batch_size
    groups = {}
    for i, s in enumerate(seqs):
        groups.setdefault(_bucket_for(len(s), TEXT_BUCKETS), []).append(i)

    out = []
    for L, idxs in groups.items():
        for off in range(0, len(idxs), B):
            batch_idx = idxs[off : off + B]
            texts = np.zeros((B, L), np.int32)
            lens = np.ones((B,), np.int32)
            for row, i in enumerate(batch_idx):
                texts[row, : len(seqs[i])] = seqs[i]
                lens[row] = len(seqs[i])
            spk = np.zeros((B,), np.int32)

            jitter = rng.randint(-1, 2, size=(B, L))
            durs = np.where(
                np.arange(L)[None, :] < lens[:, None],
                FRAMES_PER_PHONEME + jitter,
                0,
            ).astype(np.int32)
            T = _mel_bucket(int(durs.sum(1).max()))
            flat, mel_lens = _fused_with_durations(engine, L, T)(
                engine.acoustic_params, engine._voc_params,
                spk, texts, lens, jnp.asarray(durs),
            )
            # durations are host-known (injected), so the flat buffer can
            # be sliced EXACTLY (256-frame aligned for slice-program reuse
            # across jittered iterations) with no estimator round trip
            total = int(np.minimum(durs.sum(1), T).sum())
            k = min(
                B * T * engine.hop_length,
                -(-total // 256) * 256 * engine.hop_length,
            )
            flat_cut = _flat_slice(B * T * engine.hop_length, k)(flat)
            out.append((batch_idx, flat_cut, mel_lens))
    return out


def drain_batches(engine, n_seqs, dispatched):
    """Fetch + trim + stitch (host) like production serving: ONE device_get
    per pipelined drain call (audio + lens together)."""
    results = [None] * n_seqs
    total_frames = 0
    import jax

    fetched = jax.device_get([(f, m) for _, f, m in dispatched])
    for (batch_idx, _, _), (flat_np, mel_np) in zip(dispatched, fetched):
        offs = np.concatenate(
            [[0], np.cumsum(mel_np.astype(np.int64))]
        ) * engine.hop_length
        for row, i in enumerate(batch_idx):
            results[i] = engine._decode_transfer(
                flat_np[int(offs[row]) : int(offs[row + 1])]
            )
            total_frames += int(mel_np[row])
    out = np.concatenate([r for r in results if r is not None])
    return out, total_frames


def synth_batch(engine, seqs, rng):
    return drain_batches(engine, len(seqs), dispatch_batches(engine, seqs, rng))


_TRANSIENT = (
    "FAILED_PRECONDITION",
    "UNAVAILABLE",
    "DEADLINE_EXCEEDED",
    "RESOURCE_EXHAUSTED",
    "Unable to initialize backend",
)


def _setup_with_retry(attempts: int = 6, wait_s: float = 30.0):
    """Build the engine and run the compile/warmup pass, retrying on
    transient backend failures (FAILED_PRECONDITION / UNAVAILABLE — e.g. a
    stale process still holding the TPU when the driver starts, or the
    remote-TPU tunnel mid-restart; the round-2 AND round-3 official bench
    records were exactly such crashes).  EVERYTHING that can touch a JAX
    backend — including the package imports — lives inside the retried
    ``try``: a tunnel restart takes minutes, so the backoff grows
    30 -> 60 -> 90s... (total ~7.5 min of patience)."""
    import sys

    last = None
    for attempt in range(attempts):
        try:
            import os

            import jax

            # classify backend availability early: a dead tunnel fails
            # here in seconds rather than mid-compile minutes later
            jax.devices()

            import jax.numpy as jnp

            from e2e_tts_tpu.serve import SynthesisEngine
            from e2e_tts_tpu.text import text_to_sequence

            seqs = [np.asarray(text_to_sequence(s), np.int32) for s in SENTENCES]
            engine = SynthesisEngine.from_random(
                seed=0, dtype=jnp.bfloat16, batch_size=32,
                transfer_codec=os.environ.get("E2E_TTS_TRANSFER_CODEC") or None,
            )
            rng = np.random.RandomState(0)
            synth_batch(engine, seqs, rng)  # warmup / compile
            return engine, seqs, rng
        except Exception as e:  # noqa: BLE001 - classify then re-raise
            msg = repr(e)
            transient = any(s in msg for s in _TRANSIENT)
            if not transient or attempt == attempts - 1:
                raise
            last = e
            delay = wait_s * (attempt + 1)
            print(
                f"bench setup attempt {attempt + 1} failed transiently "
                f"({type(e).__name__}); retrying in {delay:.0f}s",
                file=sys.stderr,
            )
            _PROGRAMS.clear()
            time.sleep(delay)
    raise last  # pragma: no cover


def main():
    import jax.numpy as jnp

    engine, seqs, rng = _setup_with_retry()

    # throughput loop, depth-2 pipeline: iteration k+1's compute overlaps
    # iteration k's device->host transfers (the tunnel is the bottleneck)
    n_iters = 8
    t0 = time.perf_counter()
    total_audio_s = 0.0
    pending = []
    for _ in range(n_iters):
        pending.append(dispatch_batches(engine, seqs, rng))
        if len(pending) > 2:
            _, frames = drain_batches(engine, len(seqs), pending.pop(0))
            total_audio_s += frames * engine.hop_length / engine.sample_rate
    while pending:
        _, frames = drain_batches(engine, len(seqs), pending.pop(0))
        total_audio_s += frames * engine.hop_length / engine.sample_rate
    elapsed = time.perf_counter() - t0

    rtf = elapsed / total_audio_s

    # the user-facing synthesize() path verbatim, with the duration head
    # biased to predict realistic ~6 frames/phoneme (see module docstring)
    params = engine.acoustic_params["params"]
    head = params["variance_adaptor"]["duration_predictor"]["stack"]["linear"]
    head["bias"] = jnp.full_like(head["bias"], float(np.log(7.0)))
    head["kernel"] = head["kernel"] * 0.3
    # two warmup calls: the first compiles the initial fused bucket AND
    # calibrates the engine's frames/phoneme estimator; the second compiles
    # the (smaller) calibrated bucket the timed calls will hit
    engine.synthesize(SENTENCES, silence_distance=0.0)
    engine.synthesize(SENTENCES, silence_distance=0.0)
    t1 = time.perf_counter()
    serve_audio_s = 0.0
    for _ in range(4):
        wav = engine.synthesize(SENTENCES, silence_distance=0.0)
        serve_audio_s += len(wav) / engine.sample_rate
    serve_rtf = (time.perf_counter() - t1) / max(serve_audio_s, 1e-9)

    print(
        json.dumps(
            {
                "metric": "batched_synthesis_rtf_per_chip",
                "value": round(rtf, 6),
                "unit": "rtf",
                "vs_baseline": round(0.01 / rtf, 3),
                "serve_synthesize_rtf": round(serve_rtf, 6),
            }
        )
    )


if __name__ == "__main__":
    main()
