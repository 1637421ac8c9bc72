"""Public synthesis API (reference: e2e_tts/src/api/inference.py:12-50).

``Synthesizer`` normalizes text (in-process by default; optional HTTP
endpoint with fallback, matching the reference's behavior when the external
normalizer is down), synthesizes, writes a wav, and optionally post-processes
speed.
"""

from __future__ import annotations

import datetime
import os
from typing import Callable, Optional

import numpy as np

from ..audio.wav import write_wav
from ..text.normalizer import HttpNormalizer
from .audio_post import audio_speed_change
from .engine import SynthesisEngine


class Synthesizer:
    def __init__(
        self,
        engine: Optional[SynthesisEngine] = None,
        bundle_dir: Optional[str] = None,
        output_dir: str = "outputs",
        normalizer: Optional[Callable[[str], str]] = None,
        normalize_url: Optional[str] = None,
        log_path: Optional[str] = None,
    ) -> None:
        if engine is None:
            if bundle_dir is None:
                raise ValueError("need engine or bundle_dir")
            engine = SynthesisEngine.from_checkpoint(bundle_dir)
        self.engine = engine
        # every served language normalizes through its own frontend
        # (vie: normalizer.py, eng: english_normalizer.py, mya: burmese
        # number reading) — digits/currency/dates never reach the G2P raw
        from ..text.frontends import get_frontend

        lang_normalize = get_frontend(
            getattr(engine, "language", "vie")
        ).normalize
        if normalizer is not None:
            self.normalize = normalizer
        elif normalize_url:
            # when the endpoint is down, fall back to the in-process
            # normalizer for the engine's own language
            self.normalize = HttpNormalizer(normalize_url, fallback=lang_normalize)
        else:
            self.normalize = lang_normalize
        os.makedirs(output_dir, exist_ok=True)
        self.output_dir = output_dir
        # Structured request logging: one JSONL record per synthesis call,
        # including the engine's quality-incident events (truncation,
        # overflow re-splits) so degraded outputs are observable in a
        # deploy, not just warnings on some worker's stderr.
        self.logger = None
        if log_path is not None:
            from ..utils.logging import ServeLogger

            self.logger = ServeLogger(log_path)

    def tts_to_file(self, text: str, file_path: str, speed: float = 1.0):
        return self.synthesis(text, file_path, speed)

    def synthesis(
        self,
        text: str,
        save_filepath: Optional[str] = None,
        speed: float = 1.0,
        speaker_id: Optional[str] = None,
        sr: Optional[int] = None,
        pitch_control: float = 1.0,
        energy_control: float = 1.0,
        duration_control: float = 1.0,
        silence_distance: float = 0.5,
    ) -> str:
        assert len(text) > 0
        text = self.normalize(text)

        if not save_filepath:
            stamp = datetime.datetime.now().strftime("%m_%d_%Y_%H_%M_%S")
            save_filepath = os.path.join(self.output_dir, f"{stamp}.wav")
            n = 1
            while os.path.exists(save_filepath):
                # second-resolution stamps collide for back-to-back calls;
                # never silently overwrite an earlier synthesis
                save_filepath = os.path.join(
                    self.output_dir, f"{stamp}_{n}.wav"
                )
                n += 1

        import time as _time

        events: list = []
        prev_sink = self.engine.on_event
        if self.logger is not None:
            # collect engine quality events for this request (chain any
            # existing subscriber rather than displacing it)
            self.engine.on_event = (
                events.append
                if prev_sink is None
                else lambda rec: (events.append(rec), prev_sink(rec))
            )
        t0 = _time.perf_counter()
        try:
            audio = self.engine.synthesize(
                text,
                speaker_id=speaker_id,
                pitch_control=pitch_control,
                energy_control=energy_control,
                duration_control=duration_control,
                silence_distance=silence_distance,
            )
        finally:
            if self.logger is not None:
                self.engine.on_event = prev_sink
        if self.logger is not None:
            self.logger.log_request(
                text_chars=len(text),
                speaker_id=speaker_id,
                speed=speed,
                audio_s=round(len(audio) / self.engine.sample_rate, 3),
                wall_s=round(_time.perf_counter() - t0, 4),
                events=events,
                path=save_filepath,
            )
        if sr and sr != self.engine.sample_rate:
            # actually resample — writing engine-rate samples under a
            # different header would silently change playback speed/pitch
            n_out = int(round(len(audio) * sr / self.engine.sample_rate))
            x = audio.astype(np.float32)
            audio = np.interp(
                np.arange(n_out) * (len(x) - 1) / max(n_out - 1, 1),
                np.arange(len(x)),
                x,
            ).astype(np.int16)
        write_wav(save_filepath, audio, sr or self.engine.sample_rate)
        if speed != 1.0:
            save_filepath = audio_speed_change(save_filepath, speed_rate=speed)
        return save_filepath

    def synthesize_array(self, text: str, **kw) -> np.ndarray:
        """text -> int16 numpy waveform (no file I/O)."""
        return self.engine.synthesize(self.normalize(text), **kw)
