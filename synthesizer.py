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
from e2e_tts_tpu.serve.voice_conversion import (
    KnnVoiceConverter,
)


def discover_bundles(root: Optional[str] = None) -> Dict[str, str]:
    """Scan ``assets/bundles/*/meta.json`` for deployable voices, keyed by
    their language tag.  Trained tiny voices checked into the repo register
    automatically, so the router serves >1 language out of the box."""
    import glob
    import json

    root = root or os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "assets", "bundles")
    found: Dict[str, str] = {}
    for meta in sorted(glob.glob(os.path.join(root, "*", "meta.json"))):
        try:
            with open(meta) as f:
                lang = json.load(f).get("language", "vie")
        except (OSError, ValueError):
            continue
        found.setdefault(lang, os.path.dirname(meta))
    return found


class Synthesizer:
    def __init__(
        self,
        vie_bundle: Optional[str] = None,
        engine: Optional[SynthesisEngine] = None,
        extra_models: Optional[Dict[str, object]] = None,
        bundles: Optional[Dict[str, str]] = None,
        auto_discover: bool = True,
        output_dir: str = "outputs",
        vc_prosody_weight: float = 0.0,
    ) -> None:
        bundles = dict(bundles or {})
        if auto_discover:
            for lang, path in discover_bundles().items():
                bundles.setdefault(lang, path)
        if vie_bundle:
            bundles["vie"] = vie_bundle

        self.model_dict: Dict[str, object] = {}
        for lang, path in bundles.items():
            eng = SynthesisEngine.from_checkpoint(path)
            self.model_dict[lang] = _VNSynthesizer(
                engine=eng, output_dir=output_dir
            )
        if engine is not None or "vie" not in self.model_dict:
            engine = engine or SynthesisEngine.from_random(seed=0)
            self.model_dict["vie"] = _VNSynthesizer(
                engine=engine, output_dir=output_dir
            )
        if extra_models:
            self.model_dict.update(extra_models)
        # kNN-VC rendered by the vie engine's trained vocoder when present;
        # spectral-envelope DSP fallback otherwise (voice_conversion.py)
        vn = self.model_dict.get("vie")
        # vc_prosody_weight > 0 transfers the tts output's intonation
        # contour onto the converted voice (voice_conversion.py)
        self.voice_converter = KnnVoiceConverter(
            engine=getattr(vn, "engine", None),
            prosody_weight=vc_prosody_weight,
        )
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
        model = self.model_dict[language]
        # collision-free timestamped name from the serve layer — a fixed
        # tts_output.wav let concurrent requests overwrite each other
        path = model.synthesis(text, save_filepath=None, speed=speed)
        vc_path = None
        if target_filepath:
            vc_path = self.voice_conversion(path, target_filepath)
        return path, vc_path

    def voice_conversion(self, source_filepath: str, target_filepath: str) -> str:
        import time as _time

        out = os.path.join(
            self.output_dir, f"vc_{_time.time_ns()}.wav"
        )
        return self.voice_converter.convert(source_filepath, target_filepath, out)
