"""Burmese frontend + N-ary router tests.

The reference routes "mya" to an external fairseq VITS (reference
synthesizer.py:17-24); here Burmese is the third in-framework frontend
(text/burmese.py), proving the language surface is N-ary, not hard-coded
to two languages.
"""

import sys

import numpy as np
import pytest

from e2e_tts_tpu.text.burmese import (
    BURMESE_VOCAB,
    MYA_SYMBOL_TO_ID,
    MYA_SYMBOLS,
    burmese_phonemize,
    burmese_to_sequence,
    burmese_word_to_phonemes,
)
from e2e_tts_tpu.text.frontends import available_languages, get_frontend
from e2e_tts_tpu.text.symbols import SYMBOL_TO_ID, symbols


def test_mya_table_preserves_vn_ids():
    assert MYA_SYMBOLS[: len(symbols)] == symbols
    for s, i in SYMBOL_TO_ID.items():
        assert MYA_SYMBOL_TO_ID[s] == i
    assert len(MYA_SYMBOLS) > len(symbols)


def test_burmese_g2p_golden():
    # linguistically-checked syllable parses (simplified phonology)
    cases = {
        "နေ": ["~N", "~E_1"],                       # nei
        "ကောင်း": ["~K", "~AW_2", "~NF"],           # kaung (high tone)
        "လက်": ["~L", "~A_4", "~QF"],               # leʔ (checked)
        "အိမ်": ["~Q", "~I_1", "~NF"],              # ein (nasal final)
        "မြေ": ["~M", "~Y", "~E_1"],                # myei (r-medial -> /j/)
        "ခွေး": ["~KH", "~W", "~E_2"],              # khwei (w-medial)
        "နေ့": ["~N", "~E_3"],                      # nei. (creaky)
        "မိုး": ["~M", "~O_2"],                     # mo (i+u combo -> o)
    }
    for word, want in cases.items():
        assert burmese_word_to_phonemes(word) == want, word


def test_burmese_vocab_fully_mapped():
    for w in BURMESE_VOCAB:
        phones = burmese_word_to_phonemes(w)
        assert phones, w
        for p in phones:
            assert p.upper() in MYA_SYMBOL_TO_ID, (w, p)


def test_burmese_phonemize_sentence():
    phonemes, boundaries = burmese_phonemize("နေ ကောင်း လား")
    assert phonemes[-1] == "</S>"
    assert sum(boundaries) == len(phonemes)
    seq = burmese_to_sequence("ရေ မိုး တောင်")
    assert len(seq) > 0
    assert all(0 <= i < len(MYA_SYMBOLS) for i in seq)
    silent = MYA_SYMBOL_TO_ID["<SILENT>"]
    assert seq.count(silent) == 0


def test_burmese_digits_read():
    phones = burmese_word_to_phonemes("၁၂")  # 1 2
    assert phones[0] == "~T" and "~N" in phones[len(phones) // 2 :]


def test_frontend_registry():
    assert set(available_languages()) >= {"vie", "eng", "mya"}
    fe = get_frontend("mya")
    assert fe.name == "mya"
    ids = fe.to_sequence("နေ ကောင်း", None)
    assert ids == burmese_to_sequence("နေ ကောင်း")
    with pytest.raises(ValueError):
        get_frontend("xyz")


def _small_cfg():
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
    return cfg.replace(models=cfg.models.replace(fastspeech2=small, hifigan=hifi))


def test_mya_engine_synthesizes():
    from e2e_tts_tpu.serve import SynthesisEngine

    eng = SynthesisEngine.from_random(
        seed=0, config=_small_cfg(), language="mya", batch_size=2
    )
    audio = eng.synthesize("နေ ကောင်း လမ်း", silence_distance=0.0)
    assert audio.dtype == np.int16
    assert len(audio) > 1000


def test_router_serves_three_languages(tmp_path):
    sys.path.insert(0, "/root/repo")
    from e2e_tts_tpu.serve import SynthesisEngine, Synthesizer as _Backend
    from synthesizer import Synthesizer

    def backend(lang):
        return _Backend(
            engine=SynthesisEngine.from_random(
                seed=0, config=_small_cfg(), language=lang, batch_size=2
            ),
            output_dir=str(tmp_path),
        )

    router = Synthesizer(
        engine=SynthesisEngine.from_random(
            seed=0, config=_small_cfg(), batch_size=2
        ),
        extra_models={"eng": backend("eng"), "mya": backend("mya")},
        auto_discover=False,
        output_dir=str(tmp_path),
    )
    assert set(router.languages) >= {"vie", "eng", "mya"}
    for lang, text in [
        ("vie", "xin chào"),
        ("eng", "hello world"),
        ("mya", "နေ ကောင်း"),
    ]:
        path, vc = router.synthesis(text, language=lang)
        assert vc is None
        wav = np.fromfile(path, dtype=np.int16)
        assert len(wav) > 500, lang


def test_burmese_number_to_words():
    from e2e_tts_tpu.text.burmese import burmese_number_to_words as n2w

    assert n2w(0) == "သုည"
    assert n2w(5) == "၅"
    assert n2w(25) == "၂ ဆယ် ၅"
    assert n2w(100) == "၁ ရာ"
    assert n2w(2500) == "၂ ထောင် ၅ ရာ"
    assert n2w(30700) == "၃ သောင်း ၇ ရာ"
    assert n2w(1000000) == "၁ သန်း"


def test_normalize_burmese_expands_digits():
    from e2e_tts_tpu.text.burmese import (
        burmese_phonemize,
        normalize_burmese,
    )

    # ASCII and Burmese digits both expand to place-value words
    assert normalize_burmese("အခန်း 25") == "အခန်း ၂ ဆယ် ၅"
    assert normalize_burmese("အခန်း ၂၅") == "အခန်း ၂ ဆယ် ၅"
    # the expansion phonemizes (no silent drops)
    phs, _ = burmese_phonemize(normalize_burmese("25"))
    assert len(phs) >= 6  # hniʔ + hse + nga syllables + </s>


def test_mya_frontend_has_normalizer():
    from e2e_tts_tpu.text.frontends import get_frontend

    fe = get_frontend("mya")
    assert fe.normalize("25 နေ") == "၂ ဆယ် ၅ နေ"
