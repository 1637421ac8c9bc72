"""English frontend + multi-language router tests.

The reference serves English through an external Coqui VITS checkpoint
(reference synthesizer.py:12-25); here English is a first-class in-framework
frontend (text/english.py) so the router path is exercised by a second real
backend, not just the "vie" entry.
"""

import sys

import numpy as np
import pytest

from e2e_tts_tpu.text.english import (
    ENGLISH_SYMBOL_TO_ID,
    ENGLISH_SYMBOLS,
    english_phonemize,
    english_to_sequence,
    letter_to_sound,
    word_to_phonemes,
)
from e2e_tts_tpu.text.symbols import SYMBOL_TO_ID, symbols


def test_extended_table_preserves_vn_ids():
    # CMU block appends after the VN inventory: VN ids identical in both.
    assert ENGLISH_SYMBOLS[: len(symbols)] == symbols
    for s, i in SYMBOL_TO_ID.items():
        assert ENGLISH_SYMBOL_TO_ID[s] == i
    assert len(ENGLISH_SYMBOLS) > len(symbols)


def test_lexicon_words_use_cmu_block():
    phones = word_to_phonemes("hello")
    assert phones == ["@HH", "@AH0", "@L", "@OW1"]


def test_letter_to_sound_fallback():
    # OOV word gets a deterministic, non-empty, in-table pronunciation
    p1 = letter_to_sound("zorbish")
    p2 = letter_to_sound("zorbish")
    assert p1 == p2 and len(p1) >= 4
    ids = english_to_sequence("zorbish")
    assert all(0 <= i < len(ENGLISH_SYMBOLS) for i in ids)


def test_letter_to_sound_digraphs():
    assert "CH" in letter_to_sound("church")
    assert "SH" in letter_to_sound("shine")
    assert "NG" in letter_to_sound("ring")


def test_english_phonemize_sentence():
    phonemes, boundaries = english_phonemize("hello world")
    # trailing period appended -> </S>, per-word boundary counts line up
    assert phonemes[-1] == "</S>"
    assert len(boundaries) == 3
    assert sum(boundaries) == len(phonemes)
    assert phonemes[0] == "@HH"


def test_english_phonemize_mid_punctuation():
    phonemes, _ = english_phonemize("hello , world .")
    assert "<SILENT>" in phonemes
    assert phonemes.count("</S>") == 1


def test_english_to_sequence_ids_valid():
    seq = english_to_sequence("the sun and the moon")
    assert len(seq) > 0
    assert all(0 <= i < len(ENGLISH_SYMBOLS) for i in seq)
    # lexicon-covered words must not degrade to <SILENT>
    silent = ENGLISH_SYMBOL_TO_ID["<SILENT>"]
    assert seq.count(silent) == 0


@pytest.fixture(scope="module")
def eng_engine():
    from e2e_tts_tpu.config import default_config
    from e2e_tts_tpu.serve import SynthesisEngine

    cfg = default_config()
    fs2 = cfg.models.fastspeech2
    small = fs2.replace(
        encoder_layers=1, decoder_layers=1, encoder_hidden=64, decoder_hidden=64,
        building_block=fs2.building_block.replace(
            transformer=fs2.building_block.transformer.replace(conv_filter_size=64)
        ),
        postnet=fs2.postnet.replace(embedding_dim=64, conv_layers=2),
    )
    hifi = cfg.models.hifigan.replace(
        upsample_initial_channel=32, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
    )
    cfg = cfg.replace(models=cfg.models.replace(fastspeech2=small, hifigan=hifi))
    return SynthesisEngine.from_random(seed=0, config=cfg, language="eng")


def test_english_engine_synthesizes(eng_engine):
    audio = eng_engine.synthesize("hello world we sing", speaker_id="speaker_0")
    assert audio.dtype == np.int16
    assert len(audio) > 1000


def _small_vie_engine():
    from e2e_tts_tpu.serve import SynthesisEngine

    from e2e_tts_tpu.config import default_config

    cfg = default_config()
    fs2 = cfg.models.fastspeech2
    small = fs2.replace(
        encoder_layers=1, decoder_layers=1, encoder_hidden=64, decoder_hidden=64,
        building_block=fs2.building_block.replace(
            transformer=fs2.building_block.transformer.replace(conv_filter_size=64)
        ),
        postnet=fs2.postnet.replace(embedding_dim=64, conv_layers=2),
    )
    hifi = cfg.models.hifigan.replace(
        upsample_initial_channel=32, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
    )
    cfg = cfg.replace(models=cfg.models.replace(fastspeech2=small, hifigan=hifi))
    return SynthesisEngine.from_random(seed=0, config=cfg)


def test_router_serves_two_languages(tmp_path, eng_engine):
    sys.path.insert(0, "/root/repo")
    from e2e_tts_tpu.serve import Synthesizer as _VNSynthesizer
    from synthesizer import Synthesizer

    eng_backend = _VNSynthesizer(engine=eng_engine, output_dir=str(tmp_path))
    router = Synthesizer(
        engine=_small_vie_engine(),
        extra_models={"eng": eng_backend},
        auto_discover=False,
        output_dir=str(tmp_path),
    )
    assert set(router.languages) >= {"vie", "eng"}
    for lang, text in [("vie", "xin chào"), ("eng", "hello world")]:
        path, vc = router.synthesis(text, language=lang)
        assert vc is None
        wav = np.fromfile(path, dtype=np.int16)
        assert len(wav) > 500


def test_router_unknown_language_raises(tmp_path):
    sys.path.insert(0, "/root/repo")
    from synthesizer import Synthesizer

    router = Synthesizer(
        engine=_small_vie_engine(), auto_discover=False, output_dir=str(tmp_path)
    )
    with pytest.raises(ValueError):
        router.synthesis("hello", language="xyz")
