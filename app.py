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


def main():
    import os

    args = sys.argv[1:]
    bundle = None
    if args and os.path.isdir(args[0]):
        bundle = args.pop(0)
    elif args and not os.path.exists(args[0]):
        # first arg is text, not a bundle dir: use auto-discovered voices
        pass
    synthesizer = Synthesizer(vie_bundle=bundle)
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
