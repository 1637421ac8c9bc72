"""Bucketed-jit synthesis engine — the serving core.

Replaces the reference's ``TTS`` class (reference: e2e_tts/src/api/
utils.py:22-160), whose hot loop runs dynamic-shape torch calls per packed
batch, with a TPU-native design:

- text chunks are padded into **fixed text-length buckets** so every XLA
  program has static shapes (one compile per bucket, then cache hits);
- synthesis is two fixed-shape stages: stage 1 runs at phoneme rate and
  predicts durations; the engine then picks the smallest **mel bucket** that
  fits and runs stage 2 (decoder) + vocoder there — no dynamic shapes, no
  wasted frames beyond bucket rounding;
- audio assembly (trim to mel_len * hop, silence gaps, int16) is host-side,
  matching ``combine_audio`` semantics (utils.py:108-117).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, default_config
from ..models.acoustic import FastSpeech2
from ..models.vocoder import build_generator, istft_to_audio
from ..nn.variance import FeatureStats
from ..text.frontends import get_frontend
from .chunking import arrange_text

TEXT_BUCKETS = (32, 64, 96, 128, 192, 256, 320)
MEL_BUCKET_STEP = 128
# Hard mel-length ceiling per chunk: 2048 frames ~ 23.8s at hop 256 / 22050Hz,
# comfortably above the longest 300-char Vietnamese chunk (~13-19s).  Chunks
# whose *predicted* durations still exceed this are re-split at phoneme
# boundaries and synthesized in pieces — never silently truncated (the
# reference's dynamic-shape serving has no cap at all, utils.py:119-160).
MAX_MEL_LEN = 2048
DEFAULT_BATCH = 8
# fused fast-path duration estimate (frames per phoneme at d_control=1)
FRAMES_PER_PHONEME_EST = 8
# max fused batches in flight (async dispatch ahead of the host drain);
# bounds device memory: each holds its audio bucket + stage-1 activations
PIPELINE_DEPTH = 4


def _split_long_sequence(seq: np.ndarray) -> List[np.ndarray]:
    """Split a phoneme sequence longer than the largest text bucket into
    bucket-fitting pieces, cutting at <SILENT> pauses when one lies near
    the even split point (the seam falls in a pause)."""
    cap = TEXT_BUCKETS[-1]
    if len(seq) <= cap:
        return [seq]
    from ..text import SILENT_ID

    n_parts = -(-len(seq) // cap)  # ceil
    piece_len = -(-len(seq) // n_parts)
    silent_pos = np.flatnonzero(np.asarray(seq) == SILENT_ID)
    pieces, start = [], 0
    while start < len(seq):
        target = min(start + piece_len, len(seq))
        if target < len(seq):
            near = silent_pos[
                (silent_pos > start)
                & (silent_pos < len(seq) - 1)
                & (silent_pos < start + cap)
                & (np.abs(silent_pos - target) <= piece_len // 4)
            ]
            if near.size:
                target = int(near[np.argmin(np.abs(near - target))]) + 1
        pieces.append(seq[start:target])
        start = target
    return [p for p in pieces if len(p) > 0]


def _bucket_for(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def _mel_bucket(n: int) -> int:
    b = ((max(n, 1) + MEL_BUCKET_STEP - 1) // MEL_BUCKET_STEP) * MEL_BUCKET_STEP
    return min(b, MAX_MEL_LEN)


class SynthesisEngine:
    """text -> int16 waveform, compiled per (bucket) shape."""

    def __init__(
        self,
        config: Config,
        acoustic_params,
        vocoder_params,
        speakers: Dict[str, int],
        stats: FeatureStats,
        vocoder_kind: str = "hifigan",
        batch_size: int = DEFAULT_BATCH,
        foreign_dict: Optional[dict] = None,
        dtype=jnp.float32,
        use_folded_vocoder: Optional[bool] = None,
        language: str = "vie",
        serving_devices: Optional[int] = None,
        use_flash: Optional[bool] = None,
        transfer_codec: Optional[str] = None,
        global_mesh: bool = False,
    ):
        from ..utils.compilation_cache import enable_persistent_cache

        enable_persistent_cache()  # serving restarts skip bucket recompiles

        self.config = config
        self.speakers = speakers
        self.stats = stats
        self.vocoder_kind = vocoder_kind
        self.batch_size = batch_size
        # Quality-incident observability: degraded-output events (truncation,
        # overflow re-splits) are appended here and forwarded to ``on_event``
        # when set (the Synthesizer wires this into its ServeLogger), so a
        # deploy can see them per-request instead of only as warnings.
        from collections import deque as _deque

        self.events = _deque(maxlen=256)
        self.on_event: Optional[callable] = None

        # Data-parallel serving (SURVEY §2.10): shard the batch axis of every
        # serving program over a 1-D device mesh; params replicate.  The same
        # bucketed programs serve 1 or N chips — XLA partitions them, no
        # per-device program copies.  serving_devices=None -> single device.
        self.serve_mesh = None
        self._multihost = False
        if global_mesh:
            # Multi-host serving (ROADMAP item 1): the mesh spans every
            # process's devices (a pod slice over ICI/DCN).  Each host runs
            # the same SPMD synthesize() on the same request stream and
            # contributes its local rows of the batch; outputs are
            # replicated IN-PROGRAM (the all-gather a deploy needs anyway to
            # hand audio back to the caller host), so the host-side drain is
            # identical to single-host serving.  jax.distributed must be
            # initialized first (parallel/distributed.py).
            devs = list(jax.devices())
            if serving_devices not in (None, len(devs)):
                # a partial global mesh would hold only process 0's devices
                # (other processes could not address it), and a 1-device
                # "global mesh" would skip the sharding setup entirely
                raise ValueError(
                    f"global_mesh=True requires serving_devices=None or "
                    f"{len(devs)} (all devices); got {serving_devices}"
                )
            serving_devices = len(devs)
            self._multihost = jax.process_count() > 1
        else:
            devs = list(jax.local_devices())
        if serving_devices is not None and serving_devices > 1:
            if serving_devices > len(devs):
                raise ValueError(
                    f"serving_devices={serving_devices} > {len(devs)} "
                    f"{'global' if global_mesh else 'local'}"
                )
            from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

            self.serve_mesh = Mesh(
                np.array(devs[:serving_devices]), ("data",)
            )
            self._shard_rep = NamedSharding(self.serve_mesh, P())
            self._shard_bat = NamedSharding(self.serve_mesh, P("data"))
            # every batch must fill the mesh evenly
            self.batch_size = -(-batch_size // serving_devices) * serving_devices
        self.foreign_dict = foreign_dict or {}
        self.hop_length = config.audio.stft.hop_length
        self.sample_rate = config.audio.signal.sampling_rate
        self.max_len = 300  # reference chunk budget (src/api/utils.py:27)
        self.language = language

        # frontend dispatch: the router serves one engine per language
        # (reference synthesizer.py:12-25 routed eng/mya to external models;
        # here every language is an in-framework frontend, text/frontends.py)
        fe = get_frontend(language)
        n_symbols = len(fe.symbols)
        self._to_sequence = lambda c: fe.to_sequence(c, self.foreign_dict)

        # Pallas flash attention is OFF by default: measured on v5e at the
        # decoder's serving shapes (B=16, 2 heads, D=128), XLA's fused
        # attention beats the hand kernel at every length — 0.89x at T=256
        # down to 0.41x at T=1024 (tools/bench_flash.py).  The kernel stays
        # available for shapes where it wins; pass use_flash=True to opt in.
        if use_flash is None:
            use_flash = False
        self.acoustic = FastSpeech2(
            config=config.models.fastspeech2,
            n_symbols=n_symbols,
            n_speakers=max(len(speakers), 1),
            n_mel_channels=config.audio.mel.channels,
            stats=stats,
            use_flash=use_flash,
            dtype=dtype,
        )
        self.acoustic_params = acoustic_params
        self.vocoder = build_generator(config, vocoder_kind, dtype=dtype)
        self.vocoder_params = vocoder_params

        # vocode dispatch: HiFi-GAN serving uses the time-fold-to-lanes
        # rewrite (kernels/folded_tail.py) — 1.4x on v5e — unless disabled;
        # the fold is algebraically exact, so CPU tests share the path.
        if use_folded_vocoder is None:
            use_folded_vocoder = (
                vocoder_kind == "hifigan"
                and config.models.hifigan.resblock == 1
                and jax.default_backend() == "tpu"
            )
        if use_folded_vocoder and vocoder_kind == "hifigan":
            from ..kernels.folded_tail import FoldedHifiGan

            folded = FoldedHifiGan(config.models.hifigan, vocoder_params)
            self._voc_apply = folded
            self._voc_params = folded.weights
        elif vocoder_kind == "hifigan":
            self._voc_apply = lambda p, mel: self.vocoder.apply(p, mel)
            self._voc_params = vocoder_params
        else:
            def _istft_apply(p, mel):
                spec, phase = self.vocoder.apply(p, mel)
                return istft_to_audio(spec, phase, self.config.models.istft)

            self._voc_apply = _istft_apply
            self._voc_params = vocoder_params
        self.use_folded_vocoder = bool(
            use_folded_vocoder and vocoder_kind == "hifigan"
        )

        if self._multihost:
            # params become global replicated arrays once; per-batch inputs
            # are globalized in _dispatch_all / the overflow path
            self.acoustic_params = self._globalize_tree(self.acoustic_params)
            self._voc_params = self._globalize_tree(self._voc_params)

        # D2H transfer codec: None ships int16; "mulaw8" ships uint8 mu-law
        # (G.711-style companding), halving the dominant serving cost on
        # tunnel-bound deploys (~38 dB SNR — opt in where the link, not the
        # chip, is the bottleneck; see tests/test_serve.py for the quality
        # bound and ROADMAP.md for measured RTF).
        if transfer_codec not in (None, "int16", "mulaw8"):
            raise ValueError(f"unknown transfer_codec {transfer_codec!r}")
        if transfer_codec is None and jax.default_backend() != "cpu":
            # accelerator deploys are D2H-bound (the serving profile in
            # ROADMAP.md): mu-law by default halves the dominant cost;
            # pass transfer_codec="int16" for the lossless wire format
            transfer_codec = "mulaw8"
        self.transfer_codec = None if transfer_codec == "int16" else transfer_codec

        import threading

        self._stage1_cache = {}
        self._stage2_cache = {}
        self._cache_lock = threading.Lock()  # concurrent serving threads
        self.n_programs_compiled = 0
        # online frames-per-phoneme estimate for the fused fast path's mel
        # bucket: starts conservative (FRAMES_PER_PHONEME_EST) and calibrates
        # toward the served voice's observed maximum ratio, so the fused
        # program stops decoding/vocoding frames the trim will discard.
        # Underestimates are safe: the stage-2 overflow path re-renders at
        # the right bucket (stage 1 never reruns).  Benign data race under
        # concurrent serving threads (it is a heuristic scalar).
        #
        # _fpp is the value the dispatcher USES; _fpp_ema tracks observations
        # continuously but only replaces _fpp when it has drifted by a full
        # hysteresis band.  A per-request moving estimate would walk T_est
        # across mel-bucket boundaries call after call, and every crossing
        # costs a fused-program compile (tens of seconds on TPU) — so the
        # estimator jumps once on the first observation of the voice, then
        # stays put unless the voice's statistics genuinely move.
        self._fpp = float(FRAMES_PER_PHONEME_EST)
        self._fpp_ema = float(FRAMES_PER_PHONEME_EST)
        self._fpp_nobs = 0

    _FPP_MIN, _FPP_MAX = 3.0, 16.0
    _FPP_HYSTERESIS = 0.75

    def _observe_fpp(self, obs: float) -> None:
        """Fold one observed batch-max frames/phoneme ratio into the fused
        fast path's mel-bucket estimator (see __init__ for the hysteresis
        rationale)."""
        obs = min(self._FPP_MAX, max(self._FPP_MIN, obs))
        if self._fpp_nobs == 0:
            # first contact with this voice: adopt the observation outright
            # (the static default can be ~2x off, wasting decoder/vocoder
            # work on frames the trim discards)
            self._fpp_ema = self._fpp = obs
        else:
            self._fpp_ema = 0.8 * self._fpp_ema + 0.2 * obs
            if abs(self._fpp_ema - self._fpp) > self._FPP_HYSTERESIS:
                self._fpp = self._fpp_ema
        self._fpp_nobs += 1

    # --- transfer codec -----------------------------------------------------

    _MU = 255.0

    def _encode_transfer(self, audio):
        """On-device: float waveform -> wire dtype (int16 or mu-law uint8)."""
        x = jnp.clip(audio.astype(jnp.float32), -1.0, 1.0)
        if self.transfer_codec == "mulaw8":
            y = jnp.sign(x) * jnp.log1p(self._MU * jnp.abs(x)) / jnp.log1p(self._MU)
            return jnp.round((y + 1.0) * 127.5).astype(jnp.uint8)
        return jnp.clip(x * 32767.0, -32768, 32767).astype(jnp.int16)

    # mu-law decode as a 256-entry lookup (the wire dtype is uint8): a
    # gather per sample instead of a transcendental — the host decode sits
    # on the serving drain's critical path at millions of samples/request
    _MULAW_LUT: Optional[np.ndarray] = None

    @classmethod
    def _mulaw_lut(cls) -> np.ndarray:
        if cls._MULAW_LUT is None:
            y = np.arange(256, dtype=np.float32) / 127.5 - 1.0
            x = np.sign(y) * (np.power(1.0 + cls._MU, np.abs(y)) - 1.0) / cls._MU
            cls._MULAW_LUT = np.clip(x * 32767.0, -32768, 32767).astype(np.int16)
        return cls._MULAW_LUT

    def _decode_transfer(self, arr: np.ndarray) -> np.ndarray:
        """Host-side: wire dtype -> int16 waveform."""
        if self.transfer_codec == "mulaw8":
            return self._mulaw_lut()[arr]
        return arr

    # --- multi-host helpers -------------------------------------------------

    def _put_global(self, arr, batched: bool):
        """Host value -> global jax.Array on the multi-process mesh.
        Batched: this process contributes its local rows (SPMD hosts each
        build the same full batch and slice their share); replicated: every
        process supplies the same full value."""
        arr = np.asarray(arr)
        sh = self._shard_bat if batched else self._shard_rep
        if batched:
            per = arr.shape[0] // jax.process_count()
            lo = jax.process_index() * per
            return jax.make_array_from_process_local_data(
                sh, arr[lo : lo + per], arr.shape
            )
        return jax.make_array_from_process_local_data(sh, arr, arr.shape)

    def _globalize_tree(self, tree):
        return jax.tree.map(lambda a: self._put_global(a, False), tree)

    def _controls(self, *vals):
        """p/e/d control scalars as program inputs (globalized when the mesh
        spans processes; plain floats otherwise)."""
        if not self._multihost:
            return vals
        return tuple(self._put_global(np.float32(v), False) for v in vals)

    # --- program builders -------------------------------------------------

    def _serve_jit(self, fn, in_batched, out_batched):
        """jit with batch-axis sharding over the serving mesh (no-op mesh ->
        plain jit).  ``in_batched``/``out_batched``: bool per arg/output,
        True = shard axis 0 over 'data', False = replicate.  On a
        multi-process mesh outputs are replicated in-program: the trailing
        all-gather is the collective a deploy needs anyway to return audio
        to the caller host, and it keeps the host drain identical."""
        if self.serve_mesh is None:
            return jax.jit(fn)
        ins = tuple(
            self._shard_bat if b else self._shard_rep for b in in_batched
        )
        outs = tuple(
            self._shard_bat if (b and not self._multihost) else self._shard_rep
            for b in out_batched
        )
        if len(outs) == 1:
            outs = outs[0]
        return jax.jit(fn, in_shardings=ins, out_shardings=outs)

    def _stage1(self, L: int):
        with self._cache_lock:
            return self._stage1_locked(L)

    def _stage1_locked(self, L: int):
        if L not in self._stage1_cache:
            def fn(params, speakers, texts, txt_lens, p, e, d):
                return self.acoustic.apply(
                    params,
                    speakers,
                    texts,
                    txt_lens,
                    p_control=p,
                    e_control=e,
                    d_control=d,
                    method=self.acoustic.synthesize_stage1,
                )

            self._stage1_cache[L] = self._serve_jit(
                fn,
                in_batched=(False, True, True, True, False, False, False),
                out_batched=(True, True),
            )
            self.n_programs_compiled += 1
        return self._stage1_cache[L]

    def _stage2(self, L: int, T: int):
        with self._cache_lock:
            return self._stage2_locked(L, T)

    def _stage2_locked(self, L: int, T: int):
        key = (L, T)
        if key not in self._stage2_cache:
            def fn(aparams, vparams, x, durations, p, e):
                mel, mel_lens = self.acoustic.apply(
                    aparams,
                    x,
                    durations,
                    max_mel_len=T,
                    p_control=p,
                    e_control=e,
                    method=self.acoustic.synthesize_stage2,
                )
                audio = self._voc_apply(vparams, mel)
                # quantize on device: 4x (int16) or 8x (mu-law) less host
                # transfer (the tunnel D2H path is the serving bottleneck)
                return self._encode_transfer(audio), mel_lens

            self._stage2_cache[key] = self._serve_jit(
                fn,
                in_batched=(False, False, True, True, False, False),
                out_batched=(True, True),
            )
            self.n_programs_compiled += 1
        return self._stage2_cache[key]

    def _fused(self, L: int, T: int):
        """One program: stage1 + stage2 + vocoder.  Avoids the duration
        device->host sync and one dispatch per batch.  Also returns the
        stage-1 activations and durations (device arrays, never fetched on
        the fast path) so an overflow can finish via ``_stage2`` alone
        without re-running the encoder."""
        key = ("fused", L, T)
        with self._cache_lock:
            return self._fused_locked(key, L, T)

    def _fused_locked(self, key, L: int, T: int):
        if key not in self._stage2_cache:
            def fn(aparams, vparams, speakers, texts, txt_lens, p, e, d):
                x, durations = self.acoustic.apply(
                    aparams, speakers, texts, txt_lens,
                    p_control=p, e_control=e, d_control=d,
                    method=self.acoustic.synthesize_stage1,
                )
                mel, mel_lens = self.acoustic.apply(
                    aparams, x, durations, max_mel_len=T,
                    p_control=p, e_control=e,
                    method=self.acoustic.synthesize_stage2,
                )
                audio = self._voc_apply(vparams, mel)
                total_dur = jnp.sum(durations, axis=-1)
                return self._encode_transfer(audio), mel_lens, total_dur, x, durations

            self._stage2_cache[key] = self._serve_jit(
                fn,
                in_batched=(
                    False, False, True, True, True, False, False, False,
                ),
                out_batched=(True, True, True, True, True),
            )
            self.n_programs_compiled += 1
        return self._stage2_cache[key]

    # --- public API --------------------------------------------------------

    def _emit_event(self, kind: str, **fields) -> None:
        """Record a quality-incident event (kept in ``self.events`` and
        forwarded to ``self.on_event`` when a logger subscribes)."""
        rec = {"event": kind, **fields}
        self.events.append(rec)
        if self.on_event is not None:
            self.on_event(rec)

    def synthesize(
        self,
        text,
        speaker_id: Optional[str] = None,
        pitch_control: float = 1.0,
        energy_control: float = 1.0,
        duration_control: float = 1.0,
        silence_distance: float = 0.5,
    ) -> np.ndarray:
        """Full text -> int16 waveform (chunking + batching + stitching)."""
        seqs, spk = self.prepare_request(text, speaker_id)
        if not seqs:
            return np.zeros(0, np.int16)
        audios = self._synthesize_sequences(
            seqs, spk, pitch_control, energy_control, duration_control
        )
        return self._combine(audios, int(silence_distance * self.sample_rate))

    def prepare_request(self, text, speaker_id: Optional[str] = None):
        """(text, speaker_id) -> (chunk sequences, speaker index).  Host-side
        chunking + phonemization, shared by ``synthesize`` and the batching
        queue (serve/queue.py)."""
        texts = [text] if isinstance(text, str) else list(text)
        chunks = arrange_text(texts, self.max_len)
        seqs = [np.asarray(self._to_sequence(c), np.int32) for c in chunks]
        # the char-budget chunker does not bound PHONEME counts (scripts
        # like Burmese emit 2-3 phonemes per character, and spaceless text
        # cannot be split by arrange_text at all): hard-split anything
        # beyond the largest text bucket at <SILENT> seams when possible
        seqs = [p for s in seqs for p in _split_long_sequence(s)]
        seqs = [s for s in seqs if len(s) > 0]
        if speaker_id is None or not self.speakers:
            spk = 0
        elif speaker_id in self.speakers:
            spk = self.speakers[speaker_id]
        else:
            raise KeyError(
                f"unknown speaker_id {speaker_id!r}; "
                f"known: {sorted(self.speakers)}"
            )
        return seqs, spk

    def _synthesize_sequences(
        self, seqs, speaker, p: float, e: float, d: float
    ) -> List[np.ndarray]:
        """Bucket, batch, run both stages, return trimmed float waveforms.

        ``speaker``: one id for all sequences, or a per-sequence list (the
        batching queue packs requests from different speakers together)."""
        if np.ndim(speaker) == 0:
            spk_of = np.full(len(seqs), int(speaker), np.int32)
        else:
            spk_of = np.asarray(speaker, np.int32)
            assert len(spk_of) == len(seqs)
        order = sorted(range(len(seqs)), key=lambda i: len(seqs[i]))
        results: List[Optional[np.ndarray]] = [None] * len(seqs)

        # group into fixed-size batches per text bucket
        groups: Dict[int, List[int]] = {}
        for i in order:
            b = _bucket_for(len(seqs[i]), TEXT_BUCKETS)
            groups.setdefault(b, []).append(i)

        # Pipelined dispatch/drain: up to PIPELINE_DEPTH fused batches are in
        # flight at once (XLA execution is async, so batch k+1 computes while
        # batch k's results cross the host link); the drain fetches only the
        # (B,) duration totals eagerly, and audio is sliced ON DEVICE to the
        # longest real row before the D2H copy, so padded bucket tail never
        # rides the tunnel (the serving bottleneck is D2H, not compute).
        # The depth bound caps in-flight device memory for book-length input.
        from collections import deque

        # controls are constant per request — globalize them once, not per
        # dispatched/drained batch (each _put_global is a host->device put)
        pc, ec, dc = self._controls(p, e, d)

        def _dispatch_all():
            for L, idxs in groups.items():
                for s in range(0, len(idxs), self.batch_size):
                    batch_idx = idxs[s : s + self.batch_size]
                    B = self.batch_size
                    texts = np.zeros((B, L), np.int32)
                    lens = np.ones((B,), np.int32)  # dummy rows: length 1
                    speakers = np.zeros((B,), np.int32)
                    for row, i in enumerate(batch_idx):
                        texts[row, : len(seqs[i])] = seqs[i]
                        lens[row] = len(seqs[i])
                        speakers[row] = spk_of[i]

                    # fast path: one fused dispatch at an estimated mel
                    # bucket — the calibrated frames/phoneme ratio times the
                    # batch's REAL max text length (not the padded bucket L),
                    # scaled by d_control, with 20% headroom.  Only the (B,)
                    # duration totals are fetched to validate the estimate;
                    # the stage-1 activations stay on device so an overflow
                    # finishes via stage 2 alone — stage 1 never runs twice.
                    Lmax = int(lens.max())
                    T_est = _mel_bucket(
                        int(self._fpp * 1.2 * Lmax * max(d, 1.0))
                    )
                    if self._multihost:
                        speakers, texts, lens = (
                            self._put_global(a, True)
                            for a in (speakers, texts, lens)
                        )
                    outs = self._fused(L, T_est)(
                        self.acoustic_params, self._voc_params,
                        speakers, texts, lens, pc, ec, dc,
                    )
                    yield (batch_idx, L, Lmax, T_est, outs)

        pending = deque()
        producer = _dispatch_all()
        exhausted = False
        # duration totals are fetched for EVERY in-flight batch in one RPC
        # (each separate fetch pays the tunnel's fixed ~30ms RTT); keyed by
        # the dispatch tuple's identity
        lens_cache: Dict[int, np.ndarray] = {}
        while not exhausted or pending:
            while not exhausted and len(pending) < PIPELINE_DEPTH:
                try:
                    pending.append(next(producer))
                except StopIteration:
                    exhausted = True
            batch_idx, L, Lmax, T_est, outs = pending.popleft()
            audio, mel_lens, total_dur, x, durations = outs
            if id(outs) not in lens_cache:
                # piggyback only batches whose fused program already
                # finished (is_ready) — waiting on still-running ones
                # would serialize the pipeline
                group = [(id(outs), total_dur)] + [
                    (id(o), o[4][2])
                    for o in pending
                    if getattr(o[4][2], "is_ready", lambda: False)()
                ]
                for (k, _), v in zip(
                    group, jax.device_get([td for _, td in group])
                ):
                    lens_cache[k] = v
            total_np = lens_cache.pop(id(outs))[: len(batch_idx)]
            max_total = int(total_np.max())
            # calibrate the fused-path mel-bucket estimator on what this
            # voice actually predicts (batch-max ratio)
            self._observe_fpp(max_total / max(Lmax * max(d, 1.0), 1.0))
            # device-side slices are rounded UP to 64-frame steps before the
            # fetch: the per-shape sliced-fetch executables then cache across
            # requests (an exact max_total slice is a fresh shape — and a
            # fresh compile — nearly every call), for at most 64*hop extra
            # wire samples per row; rows are trimmed exactly on the host.
            if max_total <= T_est:
                keep = min(-(-max_total // 64) * 64, T_est)
                n_keep = keep * self.hop_length
                # one RPC for both arrays: each fetch pays the tunnel's
                # fixed ~30ms RTT, so audio + lens ride together
                audio_np, mel_lens_np = jax.device_get(
                    (audio[:, :n_keep], mel_lens)
                )
            elif max_total <= MAX_MEL_LEN:
                T = _mel_bucket(max_total)
                audio, mel_lens = self._stage2(L, T)(
                    self.acoustic_params, self._voc_params, x, durations, pc, ec
                )
                keep = min(-(-max_total // 64) * 64, T)
                audio_np, mel_lens_np = jax.device_get(
                    (audio[:, : keep * self.hop_length], mel_lens)
                )
            else:
                # Some chunk predicts more frames than any bucket holds:
                # re-split the offending sequences at phoneme boundaries
                # (preferring <SILENT> pauses) and synthesize the pieces
                # recursively; fitting rows still finish via stage 2.
                T = _mel_bucket(min(max_total, MAX_MEL_LEN))
                fit_audio, fit_lens = self._stage2(L, T)(
                    self.acoustic_params, self._voc_params, x, durations, pc, ec
                )
                fit_audio_np = np.asarray(fit_audio)
                fit_lens_np = np.asarray(fit_lens)
                for row, i in enumerate(batch_idx):
                    if int(total_np[row]) <= MAX_MEL_LEN:
                        n = int(fit_lens_np[row]) * self.hop_length
                        results[i] = self._decode_transfer(fit_audio_np[row, :n])
                    else:
                        pieces = self._split_sequence(
                            seqs[i], int(total_np[row])
                        )
                        if len(pieces) <= 1:
                            # cannot split further (degenerate input,
                            # e.g. one phoneme predicting >MAX_MEL_LEN
                            # frames): truncate with a warning rather
                            # than recurse forever
                            import warnings

                            warnings.warn(
                                f"chunk predicts {int(total_np[row])} mel "
                                f"frames but cannot be split; truncating "
                                f"to {MAX_MEL_LEN}"
                            )
                            self._emit_event(
                                "truncation",
                                predicted_frames=int(total_np[row]),
                                kept_frames=MAX_MEL_LEN,
                                seq_len=int(len(seqs[i])),
                            )
                            n = int(fit_lens_np[row]) * self.hop_length
                            results[i] = self._decode_transfer(
                                fit_audio_np[row, :n]
                            )
                        else:
                            self._emit_event(
                                "overflow_resplit",
                                predicted_frames=int(total_np[row]),
                                pieces=len(pieces),
                                seq_len=int(len(seqs[i])),
                            )
                            parts = self._synthesize_sequences(
                                pieces, int(spk_of[i]), p, e, d
                            )
                            results[i] = np.concatenate(parts)
                continue

            for row, i in enumerate(batch_idx):
                n = int(mel_lens_np[row]) * self.hop_length
                results[i] = self._decode_transfer(audio_np[row, :n])
        return results

    def _split_sequence(self, seq: np.ndarray, total_frames: int) -> List[np.ndarray]:
        """Split a phoneme sequence into pieces whose predicted mel lengths
        fit MAX_MEL_LEN, cutting at <SILENT> pauses when one lies near the
        even split point (audio there is a pause, so the seam is inaudible)."""
        from ..text import SILENT_ID

        n_parts = max(2, -(-total_frames // MAX_MEL_LEN))  # ceil
        piece_len = -(-len(seq) // n_parts)
        silent_pos = np.flatnonzero(np.asarray(seq) == SILENT_ID)
        pieces, start = [], 0
        while start < len(seq):
            target = min(start + piece_len, len(seq))
            if target < len(seq):
                near = silent_pos[
                    (silent_pos > start)
                    & (silent_pos < len(seq) - 1)
                    & (np.abs(silent_pos - target) <= piece_len // 4)
                ]
                if near.size:
                    target = int(near[np.argmin(np.abs(near - target))]) + 1
            pieces.append(seq[start:target])
            start = target
        return [piece for piece in pieces if len(piece) > 0]

    def _combine(self, audios: List[np.ndarray], gap: int) -> np.ndarray:
        """Stitch int16 chunk waveforms with silence gaps
        (reference combine_audio, utils.py:108-117)."""
        pieces = []
        sil = np.zeros(gap, np.int16)
        for a in audios:
            pieces.extend([a, sil])
        return np.concatenate(pieces) if pieces else np.zeros(0, np.int16)

    def warmup(self, text_buckets=(64,), speaker_id: Optional[str] = None):
        """Pre-compile the common bucket programs."""
        for L in text_buckets:
            dummy = "la " * max(1, L // 3)
            self.synthesize(dummy, speaker_id=speaker_id)

    def vocode_mel(self, mel: np.ndarray) -> np.ndarray:
        """Vocode a log-mel (T, n_mels) -> float32 waveform in [-1, 1].

        Public mel->audio entry for voice conversion / external mels; pads T
        to the serving mel buckets so programs are reused, trims after."""
        T = int(mel.shape[0])
        if T == 0:
            return np.zeros(0, np.float32)
        Tb = _mel_bucket(T)
        pad = np.zeros((Tb, mel.shape[1]), np.float32)
        pad[:T] = mel
        with self._cache_lock:
            key = ("vocode", Tb)
            if key not in self._stage2_cache:
                self._stage2_cache[key] = jax.jit(
                    lambda p, m: self._voc_apply(p, m)
                )
                self.n_programs_compiled += 1
            fn = self._stage2_cache[key]
        audio = np.asarray(
            fn(self._voc_params, pad[None])[0], np.float32
        )
        return audio[: T * self.hop_length]

    def mel_content_features(self, mel: np.ndarray, speaker: int = 0) -> np.ndarray:
        """Phoneme posteriorgram of a log-mel (T, n_mels) -> (T, n_symbols)
        from the trained aligner (models/acoustic.py content_features).
        Content-only features for kNN voice conversion; pads T to the
        serving mel buckets so programs are reused."""
        T = int(mel.shape[0])
        if T == 0:
            return np.zeros((0, self.acoustic.n_symbols), np.float32)
        Tb = _mel_bucket(T)
        pad = np.zeros((Tb, mel.shape[1]), np.float32)
        pad[:T] = mel
        with self._cache_lock:
            key = ("ppg", Tb)
            if key not in self._stage2_cache:
                self._stage2_cache[key] = jax.jit(
                    lambda p, m, s: self.acoustic.apply(
                        p, m, s, method=self.acoustic.content_features
                    )
                )
                self.n_programs_compiled += 1
            fn = self._stage2_cache[key]
        spk = jnp.full((1,), speaker, jnp.int32)
        ppg = np.asarray(fn(self.acoustic_params, pad[None], spk)[0], np.float32)
        return ppg[:T]

    def make_denoiser(self, mode: str = "zeros"):
        """Bias denoiser for this engine's vocoder (models/denoiser.py);
        apply to float audio via ``denoiser(audio, strength)``."""
        from ..models.denoiser import Denoiser

        def vocode_fn(mel):
            return self._voc_apply(self._voc_params, mel)

        return Denoiser(
            vocode_fn,
            n_mel_channels=self.config.audio.mel.channels,
            n_fft=self.config.audio.stft.filter_length,
            hop_length=self.hop_length,
            win_length=self.config.audio.stft.win_length,
            mode=mode,
        )

    def synthesize_denoised(
        self, text, denoiser=None, strength: float = 0.05, **kw
    ) -> np.ndarray:
        """Synthesize then spectral-subtract the vocoder bias floor."""
        if denoiser is None:
            denoiser = self.make_denoiser()
        audio = self.synthesize(text, **kw)
        if len(audio) == 0:
            return audio
        f32 = audio.astype(np.float32) / 32768.0
        den = np.asarray(denoiser(f32[None], strength)[0])
        n = min(len(den), len(audio))
        return np.clip(den[:n] * 32768.0, -32768, 32767).astype(np.int16)

    # --- constructors ------------------------------------------------------

    @classmethod
    def from_random(
        cls,
        seed: int = 0,
        config: Optional[Config] = None,
        n_speakers: int = 4,
        vocoder_kind: str = "hifigan",
        dtype=jnp.float32,
        language: str = "vie",
        **kw,
    ) -> "SynthesisEngine":
        """Random-weight engine for shape/flow/benchmark runs."""
        config = config or default_config()
        stats = FeatureStats()
        speakers = {f"speaker_{i}": i for i in range(n_speakers)}
        n_symbols = len(get_frontend(language).symbols)
        acoustic = FastSpeech2(
            config=config.models.fastspeech2,
            n_symbols=n_symbols,
            n_speakers=n_speakers,
            n_mel_channels=config.audio.mel.channels,
            stats=stats,
            dtype=dtype,
        )
        from ..models.acoustic import cpu_rng_keys, init_acoustic_variables

        # keys born on the host CPU backend: key creation must not be this
        # process's first accelerator op (BENCH_r02 FAILED_PRECONDITION)
        k1, k2 = cpu_rng_keys(seed, 2)
        aparams = init_acoustic_variables(acoustic, k1)
        from ..models.vocoder import init_generator_params

        voc = build_generator(config, vocoder_kind, dtype=dtype)
        vparams = init_generator_params(voc, k2, config.audio.mel.channels)
        return cls(
            config, aparams, vparams, speakers, stats,
            vocoder_kind=vocoder_kind, dtype=dtype, language=language, **kw,
        )

    @classmethod
    def from_checkpoint(cls, bundle_dir: str, dtype=jnp.float32, **kw) -> "SynthesisEngine":
        """Load a deploy bundle: config.yaml + speakers.json + stats.json +
        acoustic.msgpack + vocoder.msgpack (the reference bundle layout,
        src/api/utils.py:34-36, plus serialized params)."""
        from .bundle import load_bundle

        (
            config, aparams, vparams, speakers, stats, vocoder_kind,
            foreign_dict, language,
        ) = load_bundle(bundle_dir)
        kw.setdefault("foreign_dict", foreign_dict)
        kw.setdefault("language", language)
        return cls(
            config, aparams, vparams, speakers, stats,
            vocoder_kind=vocoder_kind, dtype=dtype, **kw,
        )

    def save_checkpoint(self, bundle_dir: str):
        from .bundle import save_bundle

        save_bundle(
            bundle_dir,
            self.config,
            self.acoustic_params,
            self.vocoder_params,
            self.speakers,
            self.stats,
            self.vocoder_kind,
            foreign_dict=self.foreign_dict,
            language=self.language,
        )
