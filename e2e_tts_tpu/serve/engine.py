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
        # occupancy row buckets: a partially-filled batch dispatches at the
        # smallest bucket that holds its real rows (compute and D2H payload
        # scale with occupancy instead of always paying the full batch_size
        # rectangle).  Coarse powers-of-two bound the per-bucket compiles;
        # on a serving mesh every bucket must still fill the mesh evenly.
        def _mesh_round(n: int) -> int:
            if self.serve_mesh is None:
                return n
            d = self.serve_mesh.shape["data"]
            return -(-n // d) * d

        self._row_buckets = sorted(
            {
                _mesh_round(max(1, self.batch_size // 4)),
                _mesh_round(max(1, self.batch_size // 2)),
                self.batch_size,
            }
        )
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

        # Pallas flash attention is OFF by default and EXPERIMENTAL: measured
        # on v5e at decoder serving shapes (B=16, 2 heads, D=128), XLA's
        # fused attention beats the hand kernel at every length incl. T=2048
        # (0.37-0.67x — assets/bench/flash_attention_v5e.json).  The backward
        # kernels were retired in round 5; the forward stays opt-in
        # (inference only) for hardware where the balance may flip.
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
        # companion estimator for the compact-fetch slice: MEAN frames per
        # phoneme over the whole batch (sum ratio).  The max-ratio _fpp
        # would overshoot the flat buffer's realized fill by the max/mean
        # spread and forfeit most of the compaction payload win.
        self._fpp_sum = float(FRAMES_PER_PHONEME_EST)
        self._fpp_sum_ema = float(FRAMES_PER_PHONEME_EST)
        self._fpp_sum_nobs = 0

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

    def _observe_fpp_sum(self, obs: float) -> None:
        """Fold one observed batch-MEAN frames/phoneme ratio into the
        compact-fetch slice estimator (same first-jump + hysteresis scheme
        as ``_observe_fpp``; a drifting estimate would mint a fresh slice
        executable per call)."""
        obs = min(self._FPP_MAX, max(1.0, obs))
        if self._fpp_sum_nobs == 0:
            self._fpp_sum_ema = self._fpp_sum = obs
        else:
            self._fpp_sum_ema = 0.8 * self._fpp_sum_ema + 0.2 * obs
            if abs(self._fpp_sum_ema - self._fpp_sum) > self._FPP_HYSTERESIS:
                self._fpp_sum = self._fpp_sum_ema
        self._fpp_sum_nobs += 1

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

    def _row_bucket(self, n_rows: int) -> int:
        for b in self._row_buckets:
            if n_rows <= b:
                return b
        return self.batch_size

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
                codes = self._encode_transfer(audio)
                # row-compact the wire codes: concatenate every row's valid
                # samples into one flat buffer.  The drain then fetches
                # flat[:k] at a host-estimated total length — the bucket's
                # per-row padding (up to ~40% of the rectangle) never rides
                # the wire, and no device round trip is needed to learn the
                # realized lengths first.  One gather over the bucket; the
                # tail beyond the realized total is zeros.
                # Compaction runs at FRAME granularity: rows trim on frame
                # boundaries, so a (B*T, hop) row-gather moves hop-wide
                # contiguous blocks per index — a per-SAMPLE gather here
                # measured ~30 ms on v5e at B=32/T=256 (scalar gathers
                # crawl on TPU); the frame-wise form is bandwidth-bound.
                B = codes.shape[0]
                frames = codes.reshape(B * T, self.hop_length)
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
                return flat, mel_lens, total_dur, x, durations

            self._stage2_cache[key] = self._serve_jit(
                fn,
                in_batched=(
                    False, False, True, True, True, False, False, False,
                ),
                # flat mixes rows, so it replicates on a serving mesh (the
                # in-program all-gather is ICI-cheap next to the D2H link)
                out_batched=(False, True, True, True, True),
            )
            self.n_programs_compiled += 1
        return self._stage2_cache[key]

    # compact-fetch slice executables: k is aligned to 1/8 of the flat
    # buffer so at most 8 variants exist per fused bucket (each distinct k
    # is a fresh — if trivial — XLA program; unaligned k would mint one per
    # request).  The tail variant covers an estimator undershoot.
    def _flat_slice(self, n_total: int, k: int):
        key = ("slice", n_total, k)
        with self._cache_lock:
            if key not in self._stage2_cache:
                self._stage2_cache[key] = jax.jit(lambda f: f[:k])
            return self._stage2_cache[key]

    def _flat_slice_tail(self, n_total: int, k0: int, k1: int):
        key = ("slice", n_total, k0, k1)
        with self._cache_lock:
            if key not in self._stage2_cache:
                self._stage2_cache[key] = jax.jit(lambda f: f[k0:k1])
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
        # batch k's results cross the host link), and each in-flight window
        # drains with ONE device_get carrying audio + mel lens + duration
        # totals for every batch in it.  On a tunneled deploy each RPC pays
        # a fixed round trip (measured ~40 ms here vs ~3 ms co-located), so
        # the drain minimizes ROUND TRIPS first: the audio is fetched
        # speculatively at the full estimated bucket rather than re-sliced
        # to the realized max duration — with the calibrated frames/phoneme
        # estimator the bucket headroom costs less wire time than the extra
        # round trip + slice-program dispatch it replaces.
        # The depth bound caps in-flight device memory for book-length input.
        from collections import deque

        # controls are constant per request — globalize them once, not per
        # dispatched/drained batch (each _put_global is a host->device put)
        pc, ec, dc = self._controls(p, e, d)

        def _dispatch_all():
            for L, idxs in groups.items():
                for s in range(0, len(idxs), self.batch_size):
                    batch_idx = idxs[s : s + self.batch_size]
                    # occupancy row bucket: a batch with few real rows
                    # computes and ships a few-row program instead of
                    # padding to the full batch_size rectangle (compute
                    # AND payload scale with occupancy; jit compiles per
                    # row bucket, so buckets are coarse powers of two)
                    B = self._row_bucket(len(batch_idx))
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
                    sum_lens = int(lens.sum())
                    if self._multihost:
                        speakers, texts, lens = (
                            self._put_global(a, True)
                            for a in (speakers, texts, lens)
                        )
                    outs = self._fused(L, T_est)(
                        self.acoustic_params, self._voc_params,
                        speakers, texts, lens, pc, ec, dc,
                    )
                    # compact fetch: slice the flat code buffer at the
                    # host-estimated realized total (mean frames/phoneme x
                    # total phonemes, 15% headroom) — no device sync needed
                    # to pick k, and an undershoot fetches only the missing
                    # tail in a second (small) round trip
                    capacity = B * T_est * self.hop_length
                    step = max(capacity // 8, self.hop_length)
                    est = int(
                        self._fpp_sum * 1.15 * sum_lens * max(d, 1.0)
                    ) * self.hop_length
                    k = min(capacity, -(-max(est, 1) // step) * step)
                    flat_cut = self._flat_slice(capacity, k)(outs[0])
                    yield (
                        batch_idx, L, Lmax, T_est, outs,
                        flat_cut, k, capacity, step, sum_lens,
                    )

        pending = deque()
        producer = _dispatch_all()
        exhausted = False
        while not exhausted or pending:
            while not exhausted and len(pending) < PIPELINE_DEPTH:
                try:
                    pending.append(next(producer))
                except StopIteration:
                    exhausted = True
            # ONE round trip drains the whole in-flight window: audio,
            # mel lens, and duration totals ride together.  device_get
            # walks the leaves in order, so batch k+1's compute overlaps
            # batch k's wire copy; the next window dispatches before any
            # host-side decode below, keeping the device busy.
            window = list(pending)
            pending.clear()
            fetched = jax.device_get(
                [(o[5], o[4][1], o[4][2]) for o in window]
            )
            while not exhausted and len(pending) < PIPELINE_DEPTH:
                try:
                    pending.append(next(producer))
                except StopIteration:
                    exhausted = True
            for (
                batch_idx, L, Lmax, T_est, outs,
                _flat, k, capacity, step, sum_lens,
            ), (
                flat_np,
                mel_lens_np,
                total_np,
            ) in zip(window, fetched):
                _, _, _, x, durations = outs
                # per-row sample offsets into the flat buffer (all rows,
                # dummies included — mirrors the device-side compaction)
                offs = np.concatenate(
                    [[0], np.cumsum(mel_lens_np.astype(np.int64))]
                ) * self.hop_length
                true_total = int(offs[-1])
                if true_total > k:
                    # estimator undershoot: fetch only the missing tail
                    k1 = min(capacity, -(-true_total // step) * step)
                    tail_np = jax.device_get(
                        self._flat_slice_tail(capacity, k, k1)(outs[0])
                    )
                    flat_np = np.concatenate([flat_np, tail_np])
                total_np = total_np[: len(batch_idx)]
                max_total = int(total_np.max())
                # calibrate the fused-path mel-bucket estimator on what this
                # voice actually predicts (batch-max ratio), and the
                # compact-fetch slice estimator on the batch-mean ratio
                self._observe_fpp(max_total / max(Lmax * max(d, 1.0), 1.0))
                self._observe_fpp_sum(
                    float(mel_lens_np.sum())
                    / max(sum_lens * max(d, 1.0), 1.0)
                )
                over = [
                    row
                    for row in range(len(batch_idx))
                    if int(total_np[row]) > T_est
                ]
                if over:
                    # rows the estimated bucket could not hold re-render via
                    # stage 2 at the right bucket, capped at MAX_MEL_LEN so
                    # a degenerate unsplittable row still truncates to the
                    # largest bucket (stage 1 never reruns); rows that DID
                    # fit keep the already-fetched audio
                    T = _mel_bucket(
                        min(
                            max(int(total_np[r]) for r in over),
                            MAX_MEL_LEN,
                        )
                    )
                    fit_audio, fit_lens = self._stage2(L, T)(
                        self.acoustic_params,
                        self._voc_params,
                        x,
                        durations,
                        pc,
                        ec,
                    )
                    re_audio_np, re_lens_np = jax.device_get(
                        (fit_audio, fit_lens)
                    )
                else:
                    re_audio_np = re_lens_np = None
                for row, i in enumerate(batch_idx):
                    total_row = int(total_np[row])
                    if total_row <= T_est:
                        lo, hi = int(offs[row]), int(offs[row + 1])
                        results[i] = self._decode_transfer(flat_np[lo:hi])
                    elif total_row <= MAX_MEL_LEN:
                        n = int(re_lens_np[row]) * self.hop_length
                        results[i] = self._decode_transfer(
                            re_audio_np[row, :n]
                        )
                    else:
                        # Some chunk predicts more frames than any bucket
                        # holds: re-split the offending sequence at phoneme
                        # boundaries (preferring <SILENT> pauses) and
                        # synthesize the pieces recursively.
                        pieces = self._split_sequence(seqs[i], total_row)
                        if len(pieces) <= 1:
                            # cannot split at phoneme boundaries (degenerate
                            # input: ONE phoneme predicting >MAX_MEL_LEN
                            # frames).  Split the DURATION instead (VERDICT
                            # r4 item 9): render the same sequence k times
                            # at duration_control d/k each — the k segments
                            # concatenate to the full predicted length, so
                            # no audio is ever dropped.  Recursion
                            # terminates because d shrinks geometrically.
                            k = max(2, -(-total_row // MAX_MEL_LEN))
                            self._emit_event(
                                "duration_split",
                                predicted_frames=total_row,
                                passes=k,
                                seq_len=int(len(seqs[i])),
                            )
                            parts = self._synthesize_sequences(
                                [seqs[i]] * k, int(spk_of[i]), p, e, d / k
                            )
                            results[i] = np.concatenate(parts)
                        else:
                            self._emit_event(
                                "overflow_resplit",
                                predicted_frames=total_row,
                                pieces=len(pieces),
                                seq_len=int(len(seqs[i])),
                            )
                            parts = self._synthesize_sequences(
                                pieces, int(spk_of[i]), p, e, d
                            )
                            results[i] = np.concatenate(parts)
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
