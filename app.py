"""Gradio demo UI (reference surface: app.py:127-148).

Same interface contract: text + language + optional target-speaker audio in,
(tts wav, voice-converted wav) out.  Gradio is optional in this image; the
module degrades to a CLI when it is absent.
"""

from __future__ import annotations

import sys

from synthesizer import Synthesizer

# the reference exposes a large language dropdown backed by external Coqui
# models (app.py:4-113); only languages with registered backends are served —
# the dropdown is built from the router's live language list at launch
LANGUAGE_LABELS = {"vie": "Vietnamese (vie)", "eng": "English (eng)"}

TTS_EXAMPLES = [
    ["xin chào việt nam", "Vietnamese (vie)"],
    ["hôm nay trời đẹp quá", "Vietnamese (vie)"],
    ["công nghệ trí tuệ nhân tạo đang thay đổi thế giới", "Vietnamese (vie)"],
    ["hello world we sing the sun and moon", "English (eng)"],
]


def language_choices(synthesizer: Synthesizer):
    """label -> tag for every language the router actually serves."""
    return {
        LANGUAGE_LABELS.get(lang, lang): lang
        for lang in synthesizer.languages
    }


def build_interface(synthesizer: Synthesizer):
    import gradio as gr

    choices = language_choices(synthesizer)

    def run(text, language_label, target_audio):
        lang = choices.get(language_label, "vie")
        tts_path, vc_path = synthesizer.synthesis(
            text, language=lang, target_filepath=target_audio
        )
        return tts_path, vc_path

    return gr.Interface(
        fn=run,
        inputs=[
            gr.Textbox(label="Text"),
            gr.Dropdown(sorted(choices), value="Vietnamese (vie)", label="Language"),
            gr.Audio(type="filepath", label="Target speaker (optional, voice conversion)"),
        ],
        outputs=[
            gr.Audio(type="filepath", label="Synthesized"),
            gr.Audio(type="filepath", label="Voice converted"),
        ],
        examples=[[t, l, None] for t, l in TTS_EXAMPLES if l in choices],
        title="e2e-tts-tpu",
        description="TPU-native Vietnamese text-to-speech",
    )


def parse_args(args):
    """(remaining_args, bundle, vc_prosody_weight) from a CLI arg list.

    ``--vc-prosody-weight W`` turns on voice-conversion prosody transfer
    (voice_conversion.py: the TTS output's intonation contour joins the
    kNN matching features at weight W)."""
    import os

    vc_prosody_weight = 0.0
    rest = []
    it = iter(args)
    for a in it:
        if a == "--vc-prosody-weight":
            vc_prosody_weight = float(next(it, "0"))
        elif a.startswith("--vc-prosody-weight="):
            vc_prosody_weight = float(a.split("=", 1)[1])
        else:
            rest.append(a)
    bundle = None
    if rest and os.path.isdir(rest[0]):
        bundle = rest.pop(0)
    return rest, bundle, vc_prosody_weight


def main():
    args, bundle, vc_prosody_weight = parse_args(sys.argv[1:])
    synthesizer = Synthesizer(
        vie_bundle=bundle, vc_prosody_weight=vc_prosody_weight
    )
    try:
        import gradio  # noqa: F401
    except ImportError:
        # CLI fallback: synthesize each argument / stdin line
        print("[app] gradio not installed; CLI mode")
        texts = args or ["xin chào việt nam"]
        for t in texts:
            path, _ = synthesizer.synthesis(t)
            print(f"{t!r} -> {path}")
        return
    build_interface(synthesizer).launch()


if __name__ == "__main__":
    main()
