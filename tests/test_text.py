"""Text frontend tests: G2P, symbols, sequence codec, normalizer.

The heavyweight check imports the reference's rule-based g2p (with its
missing third-party deps stubbed) and compares phoneme output over the full
17,977-syllable lexicon — our implementation must be behaviorally identical.
"""

import importlib.util
import os
import sys
import types

import pytest

from e2e_tts_tpu.text import (
    is_valid_syllable,
    normalize_text,
    number_to_words,
    phonemize,
    phonemes_to_sequence,
    symbols,
    syllable_to_phonemes,
    text_to_sequence,
)
from e2e_tts_tpu.text.phonology import fold_str
from e2e_tts_tpu.text.symbols import SYMBOL_TO_ID

from conftest import REFERENCE_ROOT, requires_reference

pytestmark = pytest.mark.smoke


# ---------------------------------------------------------------------------
# hand-derived golden cases covering every rule branch
# ---------------------------------------------------------------------------

GOLDEN = {
    # plain CV / CVC
    "ba": ["b", "a_0"],
    "bàn": ["b", "a_2", "nz"],
    "tiếng": ["t", "ie_1", "ngz"],
    "nghiêng": ["ng", "ie_0", "ngz"],
    # gi- onset
    "gì": ["d", "i_2"],
    "gia": ["d", "a_0"],
    "giếng": ["d", "ie_1", "ngz"],
    "giữ": ["d", "uw_4"],
    # qu- onset
    "quả": ["kw", "a_3"],
    "quê": ["kw", "ee_0"],
    "quyết": ["kw", "ie_1", "tz"],
    "qua": ["kw", "a_0"],
    # off-glide to coda
    "màu": ["m", "a_2", "uz"],
    "cứu": ["k", "uw_1", "uz"],
    "tây": ["t", "aa_0", "yz"],
    "nói": ["n", "o_1", "iz"],  # o + i coda -> closed "o"
    # medial glide
    "hoa": ["h", "wo", "a_0"],
    "xuân": ["x", "wu", "aa_0", "nz"],
    "ngoài": ["ng", "wo", "a_2", "iz"],
    "tuyết": ["t", "wu", "ie_1", "tz"],
    # special "o"
    "con": ["k", "o_0", "nz"],
    "cót": ["k", "o_1", "tz"],
    "cong": ["k", "oa_0", "ngz"],
    "cò": ["k", "oa_2"],
    "coong": ["k", "o_0", "ngz"],
    # diphthongs
    "mua": ["m", "uo_0"],
    "mưa": ["m", "wa_0"],
    "mía": ["m", "ie_1"],
    "người": ["ng", "wa_2", "iz"],
    # vowel-initial
    "ăn": ["aw_0", "nz"],
    "uống": ["uo_1", "ngz"],
    "yêu": ["ie_0", "uz"],
    # bare consonant letter
    "b": ["b"],
}


def test_golden_syllables():
    for word, want in GOLDEN.items():
        assert syllable_to_phonemes(word) == want, word


def test_symbol_inventory_matches_reference_shape():
    assert len(symbols) == 131
    assert symbols[0] == "<PAD>"
    assert symbols[1] == "<SILENT>"
    assert symbols[2] == "<S>"
    assert symbols[3] == "</S>"
    # every toned vowel present
    for v in ("A", "IE", "WA", "UO", "OO"):
        for t in range(6):
            assert f"{v}_{t}" in SYMBOL_TO_ID


def test_phonemize_sentence():
    ph, bounds = phonemize("xin chào", is_training=True)
    # trailing "." appended -> "</S>"
    assert ph[-1] == "</S>"
    assert ph[:2] == ["X", "I_0"] and "CH" in ph
    assert sum(bounds) == len(ph)


def test_phonemize_punctuation_and_hyphen():
    ph, bounds = phonemize("ka-ra-ô-kê , xong .", is_training=True)
    assert "<SILENT>" in ph and ph[-1] == "</S>"
    assert sum(bounds) == len(ph)


def test_text_to_sequence_roundtrip():
    seq = text_to_sequence("xin chào việt nam")
    assert all(isinstance(i, int) and 0 <= i < len(symbols) for i in seq)
    assert len(seq) > 4


def test_foreign_dict_expansion():
    fd = {"covid": {"phonemes": "K OW1 V IH0 D", "subtitle": None}}
    ph, _ = phonemize("covid .", foreign_dict=fd)
    # stress digits are stripped at phonemize time (reference g2p.py:147-149)
    assert ph[:5] == ["@K", "@OW", "@V", "@IH", "@D"]
    fd2 = {"video": {"phonemes": None, "subtitle": "vi-đê-ô"}}
    ph2, bounds2 = phonemize("video .", foreign_dict=fd2, is_training=True)
    assert ph2[:4] == ["V", "I_0", "DD", "EE_0"]
    assert bounds2[:3] == [2, 2, 1]


def test_number_to_words():
    assert number_to_words(0) == "không"
    assert number_to_words(5) == "năm"
    assert number_to_words(15) == "mười lăm"
    assert number_to_words(21) == "hai mươi mốt"
    assert number_to_words(24) == "hai mươi tư"
    assert number_to_words(105) == "một trăm linh năm"
    assert number_to_words(1000) == "một nghìn"
    assert number_to_words(1234) == "một nghìn hai trăm ba mươi tư"
    assert number_to_words(2005) == "hai nghìn không trăm linh năm"


def test_normalize_text():
    out = normalize_text("Hôm nay 15/8/2026, nhiệt độ 35 độ.")
    assert "mười lăm" in out and "tháng tám" in out
    assert "ba mươi lăm" in out
    out2 = normalize_text("giá 25%")
    assert "phần trăm" in out2


def test_normalize_dotted_abbreviations():
    # dotted keys must be expanded before '.' is split into its own token
    out = normalize_text("TP. Hồ Chí Minh có GS. Nam và TS. Hoa")
    assert "thành phố hồ chí minh" in out.lower()
    assert "giáo sư" in out and "tiến sĩ" in out
    assert "tp" not in out.lower().split()


def test_normalize_ordinals():
    out = normalize_text("ngày thứ 2, giải thứ 1, hạng thứ 4, lần thứ 21")
    assert "thứ hai" in out
    assert "thứ nhất" in out
    assert "thứ tư" in out
    assert "thứ hai mươi mốt" in out


def test_normalize_acronyms():
    out = normalize_text("đài TTXVN đưa tin về HCM")
    assert "tê tê ích vê nờ" in out
    assert "hát xê mờ" in out
    # shouted valid Vietnamese words are NOT spelled out
    out2 = normalize_text("XIN CHÀO")
    assert "ích" not in out2


def test_normalize_roman_numerals():
    out = normalize_text("thế kỷ XXI và chương IV của Đại hội XIII")
    assert "thế kỷ hai mươi mốt" in out
    assert "chương bốn" in out
    assert "hội mười ba" in out
    # "thứ" + roman reads as an ordinal
    assert "thứ tư" in normalize_text("lần thứ IV")
    # standalone I/V/X-only romans read without a trigger word
    assert "ba" in normalize_text("phần III").split()
    # a roman-shaped acronym with L/C/D/M chars needs a trigger word
    out2 = normalize_text("đài MC đưa tin")
    assert "một nghìn" not in out2


def test_normalize_currency_amounts():
    out = normalize_text("giá 1.500.000đ và 25 USD")
    assert "một triệu năm trăm nghìn đồng" in out
    assert "hai mươi lăm đô la" in out
    out2 = normalize_text("khoảng $5 thôi")
    assert "năm đô la" in out2
    out3 = normalize_text("mức 2,5tr mỗi tháng và 500k tiền điện")
    assert "hai phẩy năm triệu" in out3
    assert "năm trăm nghìn" in out3


def test_normalize_date_ranges():
    out = normalize_text("diễn ra từ 3-5/7/2026 tại Hà Nội")
    assert "từ ngày ba đến ngày năm tháng bảy năm hai nghìn" in out
    out2 = normalize_text("nghỉ lễ 28/12-3/1")
    assert "từ ngày hai mươi tám tháng mười hai đến ngày ba tháng một" in out2
    out3 = normalize_text("mở cửa 8h-17h30 hằng ngày")
    assert "từ tám giờ đến mười bảy giờ ba mươi phút" in out3
    # en dash folds to the same reading
    assert normalize_text("3–5/7") == normalize_text("3-5/7")
    # plain numeric ranges still read as before
    assert "năm đến bảy" in normalize_text("khoảng 5-7 ngày")


def test_is_valid_syllable():
    for w in ("xin", "chào", "nghiêng", "quyết", "người"):
        assert is_valid_syllable(w), w
    for w in ("xyz", "123", "hello", "ngf", "q"):
        assert not is_valid_syllable(w), w


# ---------------------------------------------------------------------------
# full-lexicon oracle comparison against the reference implementation
# ---------------------------------------------------------------------------


def _load_reference_g2p():
    """Import the reference g2p module with its unavailable deps stubbed."""
    # stub g2p_en (only used for English paths we never exercise)
    g2p_en = types.ModuleType("g2p_en")
    g2p_en.G2p = lambda: (lambda text: [])
    sys.modules.setdefault("g2p_en", g2p_en)
    # stub unidecode with our Vietnamese folding (identical on VN alphabet)
    unidecode = types.ModuleType("unidecode")
    unidecode.unidecode = fold_str
    sys.modules.setdefault("unidecode", unidecode)

    path = os.path.join(REFERENCE_ROOT, "e2e_tts/models/g2p/g2p.py")
    spec = importlib.util.spec_from_file_location("ref_g2p", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@requires_reference
def test_g2p_matches_reference_on_full_lexicon():
    ref = _load_reference_g2p()
    lex_path = os.path.join(
        REFERENCE_ROOT, "e2e_tts/models/g2p/dict/fix_words.txt"
    )
    with open(lex_path, encoding="utf8") as f:
        words = [w for w in f.read().split("\n") if w]
    assert len(words) > 17000

    mismatches = []
    for w in words:
        ours = syllable_to_phonemes(w)
        theirs = ref.vi_convert(w)
        if ours != theirs:
            mismatches.append((w, ours, theirs))
    assert not mismatches, f"{len(mismatches)} mismatches, first 10: {mismatches[:10]}"


@requires_reference
def test_valid_syllable_covers_reference_lexicon():
    lex_path = os.path.join(
        REFERENCE_ROOT, "e2e_tts/models/g2p/dict/fix_words.txt"
    )
    with open(lex_path, encoding="utf8") as f:
        words = [w for w in f.read().split("\n") if w]
    bad = [w for w in words if not is_valid_syllable(w)]
    # The algorithmic validator must accept (nearly) every known-valid syllable.
    assert len(bad) / len(words) < 0.01, f"{len(bad)} rejected, e.g. {bad[:20]}"


@requires_reference
def test_symbols_match_reference():
    path = os.path.join(REFERENCE_ROOT, "e2e_tts/models/g2p/symbols.py")
    spec = importlib.util.spec_from_file_location("ref_symbols", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert list(symbols) == list(mod.symbols)


@requires_reference
def test_all_lexicon_phonemes_encodable():
    lex_path = os.path.join(
        REFERENCE_ROOT, "e2e_tts/models/g2p/dict/fix_words.txt"
    )
    with open(lex_path, encoding="utf8") as f:
        words = [w for w in f.read().split("\n") if w]
    for w in words[::7]:
        ph = [p.upper() for p in syllable_to_phonemes(w)]
        ids = phonemes_to_sequence(ph)
        assert all(0 <= i < len(symbols) for i in ids)


def test_dollar_decimal_amounts():
    """US-style point-decimals in dollar amounts read as decimals, not as
    a (invalid) thousands grouping: $2.5 is 'hai phẩy năm', not 25."""
    assert normalize_text("giá 2.5$") == "giá hai phẩy năm đô la"
    assert normalize_text("$2.5") == "hai phẩy năm đô la"
    # genuine VN thousands groups keep their meaning
    assert normalize_text("1.500$") == "một nghìn năm trăm đô la"
    assert "phẩy" not in normalize_text("1.500.000đ")


def test_strict_g2p_rejects_non_vietnamese():
    """strict=True must raise on unparseable tokens instead of silently
    emitting a wrong single-vowel reading (review r3: 'blockchain' used to
    become ['OA_0'])."""
    from e2e_tts_tpu.text.g2p import G2PError, phonemize, syllable_to_phonemes

    for bad in ("blockchain", "xyz", "strength"):
        with pytest.raises(G2PError):
            syllable_to_phonemes(bad)
    with pytest.raises(G2PError):
        phonemize("blockchain", strict=True)
    # robust serving mode still flows (skips / falls back)
    ph, _ = phonemize("xin blockchain chào", strict=False)
    assert "</S>" in ph


def test_trailing_multichar_punctuation_no_extra_pause():
    """'...' already ends the sentence; a spurious extra '.' used to append
    a second silence (burmese.py handled this correctly, g2p.py did not)."""
    from e2e_tts_tpu.text.g2p import phonemize

    ph_ellipsis, _ = phonemize("xin chào ...")
    ph_dot, _ = phonemize("xin chào .")
    assert ph_ellipsis == ph_dot
    assert ph_ellipsis.count("<SILENT>") == 0
