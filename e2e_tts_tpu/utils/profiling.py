"""Profiling / tracing harness.

The reference's only observability is wall-clock prints (SURVEY.md §5);
here: a jax.profiler trace context for TensorBoard-viewable device traces,
an RTF measurement harness with block_until_ready semantics, and per-bucket
compile-cache statistics from the serving engine.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List

import jax
import numpy as np


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler trace viewable in TensorBoard's profile tab."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class RtfReport:
    wall_s: float
    audio_s: float
    rtf: float
    runs: int
    per_run_s: List[float] = field(default_factory=list)


def measure_rtf(
    synthesize: Callable[[], np.ndarray],
    sample_rate: int = 22050,
    warmup: int = 1,
    runs: int = 5,
) -> RtfReport:
    """RTF = wall time / seconds of audio produced.  ``synthesize`` must
    return the final host-side waveform (so device work is complete)."""
    for _ in range(warmup):
        synthesize()
    per_run, audio_s = [], 0.0
    t_total = time.perf_counter()
    for _ in range(runs):
        t0 = time.perf_counter()
        audio = synthesize()
        per_run.append(time.perf_counter() - t0)
        audio_s += len(audio) / sample_rate
    wall = time.perf_counter() - t_total
    return RtfReport(
        wall_s=wall,
        audio_s=audio_s,
        rtf=wall / max(audio_s, 1e-9),
        runs=runs,
        per_run_s=per_run,
    )


def engine_cache_stats(engine) -> Dict[str, int]:
    """Compile-cache statistics for a serving engine."""
    return {
        "stage1_programs": len(engine._stage1_cache),
        "stage2_programs": len(engine._stage2_cache),
        "total_compiled": engine.n_programs_compiled,
    }
