"""Training/serving observability.

TensorBoard loggers with the same scalar surface as the reference
(reference: e2e_tts/log/logger.py:18-79 — the 14-scalar joint e2e logger,
the per-loss-dict acoustic logger) plus wav/mel artifact dumps.  Backed by
tensorboardX when available, with a JSONL fallback writer so headless
environments still record history.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np


class ScalarWriter:
    """SummaryWriter facade: tensorboardX if importable, JSONL otherwise."""

    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        self.logdir = logdir
        self._jsonl = open(os.path.join(logdir, "scalars.jsonl"), "a")
        try:
            from tensorboardX import SummaryWriter

            self._tb = SummaryWriter(logdir)
        except Exception:
            self._tb = None

    def scalar(self, tag: str, value: float, step: int):
        value = float(value)
        self._jsonl.write(
            json.dumps({"tag": tag, "value": value, "step": int(step), "ts": time.time()})
            + "\n"
        )
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def audio(self, tag: str, audio: np.ndarray, step: int, sample_rate: int = 22050):
        if self._tb is not None:
            self._tb.add_audio(tag, audio[None, :], step, sample_rate=sample_rate)

    def histogram(self, tag: str, values: np.ndarray, step: int):
        """Parameter histogram (reference logger.py:70-76 logs per-param
        histograms each acoustic step); JSONL fallback records summary
        stats instead of the full TB histogram proto."""
        values = np.asarray(values).reshape(-1)
        if self._tb is not None:
            self._tb.add_histogram(tag, values, step)
        else:
            self._jsonl.write(
                json.dumps({
                    "tag": tag, "step": int(step), "kind": "histogram",
                    "mean": float(values.mean()), "std": float(values.std()),
                    "min": float(values.min()), "max": float(values.max()),
                    "n": int(values.size), "ts": time.time(),
                }) + "\n"
            )

    def figure_mel(self, tag: str, mel: np.ndarray, step: int):
        """Mel heatmap dump (reference log/utils.py:8-25 plot_mel)."""
        if self._tb is None:
            return
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, ax = plt.subplots(figsize=(10, 3))
            ax.imshow(mel.T, aspect="auto", origin="lower", interpolation="none")
            ax.set_xlabel("frames")
            ax.set_ylabel("mel bins")
            self._tb.add_figure(tag, fig, step)
            plt.close(fig)
        except Exception:
            pass

    def flush(self):
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


class AcousticLogger:
    """Per-step loss-dict scalars + LR (reference logger.py:59-79)."""

    def __init__(self, logdir: str):
        self.writer = ScalarWriter(logdir)

    def log(self, step: int, losses: Dict[str, float], lr: Optional[float] = None):
        for k, v in losses.items():
            self.writer.scalar(f"acoustic/{k}", v, step)
        if lr is not None:
            self.writer.scalar("acoustic/lr", lr, step)

    def log_audio(self, step: int, tag: str, audio, sample_rate: int = 22050):
        self.writer.audio(f"acoustic/{tag}", np.asarray(audio), step, sample_rate)

    def log_params(self, step: int, params):
        """Per-parameter histograms (reference logger.py:70-76); call on
        checkpoint steps — per-step histograms are a reference excess."""
        import jax

        flat = jax.tree_util.tree_leaves_with_path(params)
        for path, leaf in flat:
            name = "/".join(
                getattr(p, "key", getattr(p, "name", str(p))) for p in path
            )
            self.writer.histogram(f"acoustic/params/{name}", np.asarray(leaf), step)


class E2ELogger:
    """Joint acoustic+GAN fine-tune logger: the reference's 14-scalar shape
    (total, gen/disc/var, per-discriminator, fm, mel, duration/pitch/energy)
    plus GT/generated audio (reference logger.py:18-56)."""

    SCALARS = (
        "total", "generator", "discriminator", "variance",
        "mpd", "msd", "fm", "mel",
        "duration", "pitch", "energy", "ctc", "bin", "postnet",
    )

    def __init__(self, logdir: str):
        self.writer = ScalarWriter(logdir)

    def log(self, step: int, metrics: Dict[str, float]):
        for k in self.SCALARS:
            if k in metrics:
                self.writer.scalar(f"e2e/{k}", metrics[k], step)
        for k, v in metrics.items():
            if k not in self.SCALARS:
                self.writer.scalar(f"e2e/extra/{k}", v, step)

    def log_audio(self, step: int, real, generated, sample_rate: int = 22050):
        self.writer.audio("e2e/audio_real", np.asarray(real), step, sample_rate)
        self.writer.audio("e2e/audio_generated", np.asarray(generated), step, sample_rate)


class ServeLogger:
    """Structured JSONL request logs for the serving path."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._f = open(path, "a")

    def log_request(self, **fields):
        fields["ts"] = time.time()
        self._f.write(json.dumps(fields, ensure_ascii=False) + "\n")
        self._f.flush()
