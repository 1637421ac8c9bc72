"""Cross-request batching queue for multi-tenant serving.

The reference serves one request at a time (reference: e2e_tts/src/api/
utils.py:119-160 — a single TTS object, dynamic shapes, no batching across
callers).  Here concurrent requests are packed into the engine's fixed-shape
bucketed batches: a collector thread drains the queue for up to
``max_wait_ms``, groups requests by their (pitch, energy, duration) control
scalars (those are baked into the program as replicated scalars — different
controls cannot share a dispatch), flattens every request's chunk sequences
into one sequence list with per-row speaker ids, and runs the engine's
batched two-stage pipeline once per group.  Requests resolve through
``concurrent.futures.Future``; a failed request fails only its own future.

Combined with ``serving_devices=N`` (batch axis sharded over the device
mesh, engine.py), this is the scale-out serving path: many callers, one
program, N chips.
"""

from __future__ import annotations

import queue as _queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np


@dataclass
class _Request:
    seqs: List[np.ndarray]
    speaker: int
    controls: Tuple[float, float, float]
    gap: int
    future: Future = field(default_factory=Future)


class BatchingServer:
    """Wraps a SynthesisEngine with a submit()/Future request interface."""

    def __init__(
        self,
        engine,
        max_wait_ms: float = 5.0,
        max_batch: Optional[int] = None,
    ):
        self.engine = engine
        self.max_wait = max_wait_ms / 1000.0
        # cap the sequences collected per cycle; default 4 full batches
        self.max_batch = max_batch or 4 * engine.batch_size
        self._q: "_queue.Queue[Optional[_Request]]" = _queue.Queue()
        self._closed = False
        self.n_cycles = 0  # dispatch cycles run (observability)
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    # --- client API ---------------------------------------------------------

    def submit(
        self,
        text,
        speaker_id: Optional[str] = None,
        pitch_control: float = 1.0,
        energy_control: float = 1.0,
        duration_control: float = 1.0,
        silence_distance: float = 0.5,
    ) -> Future:
        """Enqueue a request; resolves to the int16 waveform."""
        if self._closed:
            raise RuntimeError("BatchingServer is closed")
        req = _Request(
            seqs=[], speaker=0,
            controls=(
                float(pitch_control), float(energy_control),
                float(duration_control),
            ),
            gap=int(silence_distance * self.engine.sample_rate),
        )
        try:
            # host-side text work happens on the caller's thread, so the
            # collector thread only does batching + device dispatch
            req.seqs, req.speaker = self.engine.prepare_request(
                text, speaker_id
            )
        except Exception as exc:  # unknown speaker, bad text
            req.future.set_exception(exc)
            return req.future
        if not req.seqs:
            req.future.set_result(np.zeros(0, np.int16))
            return req.future
        self._q.put(req)
        return req.future

    def synthesize(self, text, **kw) -> np.ndarray:
        """Blocking convenience: submit + wait."""
        return self.submit(text, **kw).result()

    def close(self):
        if not self._closed:
            self._closed = True
            self._q.put(None)
            self._thread.join()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # --- collector ----------------------------------------------------------

    def _collect(self) -> List[_Request]:
        """Block for the first request, then drain for up to max_wait."""
        first = self._q.get()
        if first is None:
            return []
        batch, n_seqs = [first], len(first.seqs)
        deadline = time.monotonic() + self.max_wait
        while n_seqs < self.max_batch:
            timeout = deadline - time.monotonic()
            if timeout <= 0:
                break
            try:
                req = self._q.get(timeout=timeout)
            except _queue.Empty:
                break
            if req is None:
                self._q.put(None)  # keep the shutdown token
                break
            batch.append(req)
            n_seqs += len(req.seqs)
        return batch

    def _worker(self):
        while True:
            batch = self._collect()
            if not batch:
                return
            self.n_cycles += 1
            # group by control scalars (replicated jit scalars: one dispatch
            # group per distinct (p, e, d))
            groups = {}
            for req in batch:
                groups.setdefault(req.controls, []).append(req)
            for (p, e, d), reqs in groups.items():
                seqs, speakers, owners = [], [], []
                for ri, req in enumerate(reqs):
                    seqs.extend(req.seqs)
                    speakers.extend([req.speaker] * len(req.seqs))
                    owners.extend([ri] * len(req.seqs))
                try:
                    audios = self.engine._synthesize_sequences(
                        seqs, speakers, p, e, d
                    )
                except Exception as exc:
                    for req in reqs:
                        if not req.future.done():
                            req.future.set_exception(exc)
                    continue
                per_req: List[List[np.ndarray]] = [[] for _ in reqs]
                for audio, ri in zip(audios, owners):
                    per_req[ri].append(audio)
                for req, parts in zip(reqs, per_req):
                    try:
                        req.future.set_result(
                            self.engine._combine(parts, req.gap)
                        )
                    except Exception as exc:
                        if not req.future.done():
                            req.future.set_exception(exc)
