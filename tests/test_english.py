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


def _strip(ps):
    return [p.rstrip("012") for p in ps]


def test_lexicon_scale_and_integrity():
    from e2e_tts_tpu.text.english import _LEXICON

    # dictionary-scale pronunciation: >=1,500 lemmas, every phone in-table
    assert len(_LEXICON) >= 1500
    valid = {s[1:] for s in ENGLISH_SYMBOLS if s.startswith("@")}
    for word, phones in _LEXICON.items():
        for p in _strip(phones.split()):
            assert p in valid, f"{word}: {p} not in symbol table"


def test_morphology_derives_inflections():
    from e2e_tts_tpu.text.english import _inflected_phones

    cases = {
        # voicing-conditioned plural: S after voiceless, Z after voiced,
        # IH0 Z after sibilants
        "cats": ["K", "AE1", "T", "S"],
        "dogs": ["D", "AO1", "G", "Z"],
        "boxes": ["B", "AA1", "K", "S", "IH0", "Z"],
        "cities": ["S", "IH1", "T", "IY0", "Z"],
        # past tense: T / D / IH0 D
        "walked": ["W", "AO1", "K", "T"],
        "loved": ["L", "AH1", "V", "D"],
        "planned": ["P", "L", "AE1", "N", "D"],
        "needed": ["N", "IY1", "D", "IH0", "D"],
        # -ing with silent-e and doubled-consonant stems
        "making": ["M", "EY1", "K", "IH0", "NG"],
        "running": ["R", "AH1", "N", "IH0", "NG"],
        # derivational suffixes
        "happiness": ["HH", "AE1", "P", "IY0", "N", "AH0", "S"],
        "colorful": ["K", "AH1", "L", "ER0", "F", "AH0", "L"],
        "teacher's": ["T", "IY1", "CH", "ER0", "Z"],
    }
    for word, want in cases.items():
        assert _inflected_phones(word) == want, word


def test_lts_heldout_accuracy():
    """Documented LTS quality number (VERDICT r2 item 3): the rules never
    see the lexicon, so the full lexicon is a held-out set — and a hard one
    (it includes the irregular core vocabulary).  Measured 2026-08-17
    after the round-3 rule expansion (schwa suffixes/prefixes, -Vse$
    voicing, soft-ce silent e, r-colored contexts): word-exact 55.3%,
    phoneme error rate 17.1% over 1,583 words (was 46.4% / 21.4%)."""
    import difflib

    from e2e_tts_tpu.text.english import _LEXICON

    n = word_ok = phone_err = phone_tot = 0
    for w, ph in _LEXICON.items():
        if not w.isalpha():
            continue
        gold, pred = _strip(ph.split()), _strip(letter_to_sound(w))
        n += 1
        word_ok += gold == pred
        sm = difflib.SequenceMatcher(a=gold, b=pred)
        phone_err += sum(
            max(i2 - i1, j2 - j1)
            for tag, i1, i2, j1, j2 in sm.get_opcodes()
            if tag != "equal"
        )
        phone_tot += len(gold)
    assert n >= 1500
    assert word_ok / n >= 0.50, f"LTS word accuracy regressed: {word_ok / n:.3f}"
    assert phone_err / phone_tot <= 0.20, (
        f"LTS phoneme error rate regressed: {phone_err / phone_tot:.3f}"
    )


def test_running_text_lexicon_coverage():
    """Arbitrary everyday text resolves through lexicon+morphology (not LTS)
    for >=90% of tokens — the 'English as a first-class language' bar."""
    from e2e_tts_tpu.text.english import _LEXICON, _inflected_phones

    text = (
        "the quick brown fox jumps over the lazy dog and then runs away "
        "into the forest where many animals lived happily together during "
        "the long cold winter months while children played games near the "
        "river and their parents watched carefully from the warm houses "
        "every morning before work they walked along the streets of the "
        "city talking about music books movies and the latest news stories"
    )
    toks = text.split()
    hits = sum(1 for t in toks if t in _LEXICON or _inflected_phones(t))
    assert hits / len(toks) >= 0.90, f"coverage {hits / len(toks):.2f}"


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


def test_plural_possessive_adds_no_extra_suffix():
    """dogs' is pronounced exactly like dogs — the apostrophe is silent
    (regression: the s' branch used to append a second /z/)."""
    from e2e_tts_tpu.text.english import word_to_phonemes

    assert word_to_phonemes("dogs'") == word_to_phonemes("dogs")
    assert word_to_phonemes("cats'") == word_to_phonemes("cats")
    # singular possessive still voices the clitic
    assert word_to_phonemes("dog's") == word_to_phonemes("dogs")
