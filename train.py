"""Training entry point: prepare / acoustic / vocoder / export.

(The reference ships no train driver — SURVEY.md §0; this completes it.)
"""

from e2e_tts_tpu.train.cli import main

if __name__ == "__main__":
    main()
