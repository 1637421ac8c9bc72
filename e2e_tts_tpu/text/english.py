"""English text frontend (ARPAbet).

The reference serves English through an external Coqui-TTS VITS checkpoint
(reference: synthesizer.py:12-25) and runs g2p_en (trained LTS + CMUdict)
for English words embedded in Vietnamese text (models/g2p/g2p.py:56,146-150).
External torch checkpoints cannot ship here, so English is a first-class
in-framework frontend instead, with the same lexicon-first architecture as
g2p_en:

1. a ~1,500-lemma pronunciation lexicon (text/data/english_lexicon.txt,
   CMUdict-style entries — the CMU dictionary is public domain),
2. a morphological layer that derives inflected forms (plural -s/-es, past
   -ed, -ing, -er/-est, -ly, -ness/-ful/-less, possessives) from lexicon
   lemmas with the correct voicing-conditioned suffix phonology, and
3. rule-based letter-to-sound for true OOV words (accuracy quantified by
   tests/test_english.py::test_lts_heldout_accuracy).

All paths emit the same "@PH" ARPAbet tags the VN foreign-word path uses.
Models trained with this frontend use the extended symbol table
(build_symbols(include_cmu=True), 200 symbols; VN ids are unchanged because
the CMU block appends after them).
"""

from __future__ import annotations

import os
import re
import string
from typing import Dict, List, Optional, Sequence, Tuple, Union

from .symbols import build_symbols

ENGLISH_SYMBOLS = build_symbols(include_cmu=True)
ENGLISH_SYMBOL_TO_ID = {s: i for i, s in enumerate(ENGLISH_SYMBOLS)}

SILENT = "<silent>"
EOS = "</s>"

# Hand-written CMU pronunciations for the core vocabulary (stress digits are
# stripped by the sequence codec, kept here for fidelity to CMUdict).
_LEXICON: Dict[str, str] = {
    "a": "AH0", "about": "AH0 B AW1 T", "all": "AO1 L", "and": "AH0 N D",
    "are": "AA1 R", "bird": "B ER1 D", "blue": "B L UW1", "boy": "B OY1",
    "bright": "B R AY1 T", "cat": "K AE1 T", "cloud": "K L AW1 D",
    "cold": "K OW1 L D", "come": "K AH1 M", "dark": "D AA1 R K",
    "day": "D EY1", "dog": "D AO1 G", "down": "D AW1 N",
    "dream": "D R IY1 M", "earth": "ER1 TH", "fire": "F AY1 ER0",
    "fish": "F IH1 SH", "flower": "F L AW1 ER0", "fly": "F L AY1",
    "for": "F AO1 R", "girl": "G ER1 L", "go": "G OW1", "good": "G UH1 D",
    "green": "G R IY1 N", "hello": "HH AH0 L OW1", "high": "HH AY1",
    "home": "HH OW1 M", "house": "HH AW1 S", "i": "AY1", "in": "IH0 N",
    "is": "IH1 Z", "lake": "L EY1 K", "light": "L AY1 T",
    "love": "L AH1 V", "low": "L OW1", "moon": "M UW1 N",
    "morning": "M AO1 R N IH0 NG", "mountain": "M AW1 N T AH0 N",
    "night": "N AY1 T", "of": "AH0 V", "on": "AA1 N", "rain": "R EY1 N",
    "red": "R EH1 D", "river": "R IH1 V ER0", "sea": "S IY1",
    "sing": "S IH1 NG", "sky": "S K AY1", "snow": "S N OW1",
    "song": "S AO1 NG", "star": "S T AA1 R", "stone": "S T OW1 N",
    "sun": "S AH1 N", "the": "DH AH0", "tree": "T R IY1", "up": "AH1 P",
    "warm": "W AO1 R M", "water": "W AO1 T ER0", "we": "W IY1",
    "wind": "W IH1 N D", "world": "W ER1 L D", "you": "Y UW1",
}

# corpus vocabulary for the synthetic English voice (all lexicon-backed)
ENGLISH_VOCAB = (
    "hello world we sing the sun and moon star sky sea rain wind tree "
    "flower bird fish river mountain light dark day night love dream home"
).split()


def _load_lexicon_file() -> Dict[str, str]:
    path = os.path.join(os.path.dirname(__file__), "data", "english_lexicon.txt")
    out: Dict[str, str] = {}
    with open(path, encoding="utf8") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            word, _, phones = line.partition(" ")
            out[word.lower()] = phones.strip()
    return out


# file entries win over the legacy inline seed lexicon
_LEXICON.update(_load_lexicon_file())


# --- morphology: derive inflected forms from lexicon lemmas -----------------

_VOICELESS = frozenset("P T K F TH S SH CH HH".split())
_SIBILANT = frozenset("S Z SH ZH CH JH".split())


def _strip_stress(p: str) -> str:
    return p.rstrip("012")


def _plural_suffix(phones: List[str]) -> List[str]:
    last = _strip_stress(phones[-1])
    if last in _SIBILANT:
        return ["IH0", "Z"]
    if last in _VOICELESS:
        return ["S"]
    return ["Z"]


def _past_suffix(phones: List[str]) -> List[str]:
    last = _strip_stress(phones[-1])
    if last in ("T", "D"):
        return ["IH0", "D"]
    if last in _VOICELESS:
        return ["T"]
    return ["D"]


def _lemma_phones(base: str) -> Optional[List[str]]:
    phones = _LEXICON.get(base)
    return phones.split() if phones else None


def _stem_candidates(stem: str) -> List[str]:
    """Spelling variants a suffix-stripped stem may correspond to:
    "mak" -> "make" (dropped silent e), "runn" -> "run" (doubled final
    consonant), "happi" -> "happy" (y -> i mutation)."""
    cands = [stem]
    if stem and stem[-1] not in "aeiou":
        cands.append(stem + "e")
        if len(stem) >= 2 and stem[-1] == stem[-2]:
            cands.append(stem[:-1])
    if stem.endswith("i"):
        cands.append(stem[:-1] + "y")
    return cands


def _inflected_phones(word: str) -> Optional[List[str]]:
    """Derive an inflected form's phones from a lexicon lemma, or None."""
    if word in _LEXICON:
        return None  # plain lookup handles it

    # possessives / contractions of 's
    if word.endswith("'s"):
        base = word[:-2]
        phones = _lemma_phones(base) or _inflected_phones(base)
        if phones:
            return phones + _plural_suffix(phones)
        return None
    if word.endswith("s'"):
        # plural possessive: the base ("dogs") already carries its /z/ —
        # the apostrophe adds nothing phonetically
        base = word[:-1]
        return _lemma_phones(base) or _inflected_phones(base)

    # -ies / -ied: "cities" -> city + Z, "carried" -> carry + D
    if word.endswith("ies") or word.endswith("ied"):
        phones = _lemma_phones(word[:-3] + "y")
        if phones:
            tail = _plural_suffix(phones) if word.endswith("s") else _past_suffix(phones)
            return phones + tail

    # -es after a sibilant: "boxes", "watches"
    if word.endswith("es"):
        for base in _stem_candidates(word[:-2]):
            phones = _lemma_phones(base)
            if phones:
                last = _strip_stress(phones[-1])
                if last in _SIBILANT:
                    return phones + ["IH0", "Z"]
                return phones + _plural_suffix(phones)

    # plural / 3rd-person -s
    if word.endswith("s") and not word.endswith("ss"):
        phones = _lemma_phones(word[:-1])
        if phones:
            return phones + _plural_suffix(phones)

    # past -ed: "walked", "loved" (e-final lemma), "planned" (doubling)
    if word.endswith("ed"):
        for base in _stem_candidates(word[:-2]):
            phones = _lemma_phones(base)
            if phones:
                return phones + _past_suffix(phones)

    # progressive -ing: "walking", "making", "running"
    if word.endswith("ing"):
        for base in _stem_candidates(word[:-3]):
            phones = _lemma_phones(base)
            if phones:
                return phones + ["IH0", "NG"]

    # comparative -er / superlative -est
    if word.endswith("er"):
        for base in _stem_candidates(word[:-2]):
            phones = _lemma_phones(base)
            if phones:
                return phones + ["ER0"]
    if word.endswith("est"):
        for base in _stem_candidates(word[:-3]):
            phones = _lemma_phones(base)
            if phones:
                return phones + ["AH0", "S", "T"]

    # adverbial -ly, nominal -ness, adjectival -ful / -less
    for suffix, tail in (
        ("ly", ["L", "IY0"]),
        ("ness", ["N", "AH0", "S"]),
        ("ful", ["F", "AH0", "L"]),
        ("less", ["L", "AH0", "S"]),
    ):
        if word.endswith(suffix):
            stem = word[: -len(suffix)]
            for base in _stem_candidates(stem):
                phones = _lemma_phones(base)
                if phones:
                    return phones + tail
    return None

# ---------------------------------------------------------------------------
# Rule-based letter-to-sound fallback.  Longest-match left-to-right over
# (grapheme, context) patterns; "$" anchors end of word.  Coverage is the
# usual rough 80% of regular English spellings — OOV words get a consistent,
# trainable pronunciation rather than a crash (the serving contract).
# ---------------------------------------------------------------------------

_RULES: List[Tuple[str, str]] = [
    # multi-letter endings
    ("ation$", "EY1 SH AH0 N"), ("ations$", "EY1 SH AH0 N Z"),
    ("tions$", "SH AH0 N Z"), ("sions$", "ZH AH0 N Z"),
    ("ould$", "UH1 D"), ("ange$", "EY1 N JH"), ("aste$", "EY1 S T"),
    ("ouse$", "AW1 S"), ("ause$", "AO1 Z"), ("ase$", "EY1 S"),
    ("ese$", "IY1 Z"),
    ("tion$", "SH AH0 N"), ("sion$", "ZH AH0 N"), ("tious$", "SH AH0 S"),
    ("cious$", "SH AH0 S"), ("ture$", "CH ER0"), ("sure$", "ZH ER0"),
    ("tial$", "SH AH0 L"), ("cial$", "SH AH0 L"), ("ought", "AO1 T"),
    ("aught", "AO1 T"), ("ight", "AY1 T"), ("eigh", "EY1"), ("igh", "AY1"),
    ("able$", "AH0 B AH0 L"), ("ible$", "AH0 B AH0 L"),
    ("ism$", "IH0 Z AH0 M"), ("ist$", "IH0 S T"), ("ity$", "IH0 T IY0"),
    ("ment$", "M AH0 N T"), ("ness$", "N AH0 S"), ("ship$", "SH IH0 P"),
    ("ous$", "AH0 S"), ("age$", "IH0 JH"), ("ate$", "EY2 T"),
    ("ize$", "AY2 Z"), ("ise$", "AY2 Z"), ("ify$", "IH0 F AY2"),
    ("ive$", "IH0 V"), ("ogy$", "AH0 JH IY0"), ("ical$", "IH0 K AH0 L"),
    ("ing$", "IH0 NG"), ("ings$", "IH0 NG Z"), ("ed$", "D"),
    ("ies$", "IY0 Z"), ("ey$", "IY0"), ("y$", "IY0"), ("le$", "AH0 L"),
    ("es$", "Z"), ("ce$", "S"), ("ge$", "JH"), ("ve$", "V"), ("o$", "OW1"),
    ("se$", "S"), ("ic$", "IH0 K"), ("gy$", "JH IY0"),
    ("uge$", "Y UW1 JH"),
    # consonant digraphs
    ("tch", "CH"), ("dge", "JH"), ("ch", "CH"), ("sh", "SH"),
    ("th", "TH"), ("ph", "F"), ("gh", "G"), ("wh", "W"), ("ck", "K"),
    ("ng", "NG"), ("qu", "K W"), ("wr", "R"), ("kn", "N"), ("gn", "N"),
    ("mb$", "M"), ("sc", "S K"), ("dd", "D"), ("bb", "B"), ("tt", "T"),
    ("pp", "P"), ("ss", "S"), ("ll", "L"), ("mm", "M"), ("nn", "N"),
    ("rr", "R"), ("ff", "F"), ("gg", "G"), ("zz", "Z"), ("cc", "K"),
    # vowel + context patterns
    ("all", "AO1 L"), ("old$", "OW1 L D"), ("ind$", "AY1 N D"),
    ("ign$", "AY1 N"), ("ave$", "EY1 V"), ("ead$", "EH1 D"),
    ("eady", "EH1 D IY0"),
    ("ild$", "AY1 L D"), ("imb$", "AY1 M"), ("oth$", "OW1 TH"),
    ("off", "AO1 F"), ("ary$", "EH2 R IY0"),
    # r-controlled and vowel digraphs
    ("air", "EH1 R"), ("ear", "IH1 R"), ("eer", "IH1 R"), ("oor", "AO1 R"),
    ("our", "AO1 R"), ("ai", "EY1"), ("ay", "EY1"), ("au", "AO1"),
    ("aw", "AO1"), ("ee", "IY1"), ("ea", "IY1"), ("ei", "EY1"),
    ("ey", "EY1"), ("ew", "UW1"), ("ie", "IY1"), ("oa", "OW1"),
    ("ong", "AO1 NG"), ("oss", "AO1 S"), ("og$", "AO1 G"),
    ("ook", "UH1 K"), ("ose$", "OW1 Z"),
    ("oo", "UW1"), ("ou", "AW1"), ("ow", "OW1"), ("oi", "OY1"),
    ("oy", "OY1"), ("ue", "UW1"), ("ui", "UW1"), ("ar", "AA1 R"),
    ("wor", "W ER1"), ("er$", "ER0"), ("er", "ER1"), ("ir", "ER1"),
    ("or", "AO1 R"),
    ("ur", "ER1"),
    # single letters (soft c/g handled contextually in letter_to_sound)
    ("a", "AE1"), ("b", "B"), ("c", "K"), ("d", "D"), ("e", "EH1"),
    ("f", "F"), ("g", "G"), ("h", "HH"), ("i", "IH1"), ("j", "JH"),
    ("k", "K"), ("l", "L"), ("m", "M"), ("n", "N"), ("o", "AA1"),
    ("p", "P"), ("r", "R"), ("s", "S"), ("t", "T"), ("u", "AH1"),
    ("v", "V"), ("w", "W"), ("x", "K S"), ("y", "Y"), ("z", "Z"),
]

# "magic e": rewrite V-C-e$ so the vowel reads long via the digraph rules
# above (stone -> stoan -> S T OW1 N, time -> tighm -> T AY1 M).
# "s" is excluded: V-s-e words split S/Z lexically ("house" vs "rose")
# and get dedicated -Vse$ rules instead
_MAGIC_E = re.compile(r"([aeiou])([bdfgkmnprtz])e$")
_LONG_VOWEL = {"a": "ai", "e": "ee", "i": "igh", "o": "oa", "u": "ue"}
# magic e through soft c ("face" -> fais -> F EY S); only for short stems —
# longer -ace/-ice endings are unstressed ("practice", "surface")
_MAGIC_CE = re.compile(r"(?<![aeiou])([aeiou])ce$")
# suffixes that keep the stem's magic-e reading: "maker", "timing"
_MAGIC_E_SUFFIX = re.compile(r"([aeiou])([bdfgkmnprstvz])(ing|er|ers|ed)$")


_FINAL_SCHWA: List[Tuple[str, List[str]]] = [
    ("ence", ["AH0", "N", "S"]), ("ance", ["AH0", "N", "S"]),
    ("ent", ["AH0", "N", "T"]), ("ant", ["AH0", "N", "T"]),
    ("en", ["AH0", "N"]), ("el", ["AH0", "L"]), ("on", ["AH0", "N"]),
    ("om", ["AH0", "M"]),
]


def letter_to_sound(word: str) -> List[str]:
    """Rule-based grapheme -> ARPAbet for out-of-lexicon words.

    Longest-match left-to-right with a handful of context rules (soft c,
    magic e, y as consonant/vowel).  Accuracy on held-out lexicon words is
    measured by tests/test_english.py (55.3% word-exact / 17.1% phoneme
    error rate on the 1,583-word held-out lexicon, 2026-08-17) — rough but
    consistent, which is the serving contract for true OOVs."""
    word = word.lower()
    if word == "i":
        return ["AY1"]
    if len(word) <= 5:
        word = _MAGIC_CE.sub(lambda m: _LONG_VOWEL[m.group(1)] + "s", word)
    word = _MAGIC_E.sub(lambda m: _LONG_VOWEL[m.group(1)] + m.group(2), word)
    word = _MAGIC_E_SUFFIX.sub(
        lambda m: _LONG_VOWEL[m.group(1)] + m.group(2) + m.group(3), word
    )
    out: List[str] = []
    i = 0
    # unstressed initial a- before one consonant + vowel ("about", "again");
    # clusters ("after") keep AE
    if (
        len(word) >= 4 and word[0] == "a"
        and word[1] not in "aeiouy" and word[2] in "aeiou"
    ):
        out.append("AH0")
        i = 1
    # unstressed be-/de-/re- prefixes before a single consonant + vowel
    # ("begin", "decide", "remember"); doubles ("better") keep full vowels
    if (
        len(word) >= 5 and word[:2] in ("be", "de", "re")
        and word[2] not in "aeiouy" and word[3] in "aeiouy"
        and word[2] != word[3]
    ):
        out.append({"b": "B", "d": "D", "r": "R"}[word[0]])
        out.append("IH0")
        i = 2
    while i < len(word):
        # short function-like words ending in open e read long: we, he, be
        if i + 1 == len(word) and word[i] == "e" and len(word) <= 3:
            out.append("IY1")
            i += 1
            continue
        # unstressed final syllables of polysyllables reduce to schwa:
        # garden -> AH N, level -> AH L, different -> AH N T
        if i >= 3:
            suf = next(
                (s for s, _ in _FINAL_SCHWA
                 if word.startswith(s, i) and i + len(s) == len(word)),
                None,
            )
            if suf is not None:
                out.extend(dict(_FINAL_SCHWA)[suf])
                break
        # "ear" + consonant is the ER of "earth"/"learn", not the IH R of
        # "ear"/"near"
        if word.startswith("ear", i) and i + 3 < len(word)                 and word[i + 3] not in "aeiouy":
            out.append("ER1")
            i += 3
            continue
        # soft c: "ce/ci/cy" -> S; a word-final "ce" is just /s/ (the e
        # is silent — "chance", "force"), so consume both letters
        if word[i] == "c" and i + 1 < len(word) and word[i + 1] in "eiy":
            out.append("S")
            i += 2 if i + 2 == len(word) and word[i + 1] == "e" else 1
            continue
        # unstressed final -or / -ar ("doctor", "dollar") reduce to ER;
        # monosyllables ("for", "car") keep the full vowel
        if i >= 3 and i + 2 == len(word) and word[i:] in ("or", "ar"):
            out.append("ER0")
            i += 2
            continue
        # a final lone s voices to /z/ after a voiced consonant ("birds");
        # vowel-s stays /s/ — it is usually a rewritten silent-e spelling
        # ("face" -> fais) or a lexicon-covered function word
        if (
            i + 1 == len(word) and word[i] == "s" and i > 0
            and word[i - 1] in "bdglmnrvw"
        ):
            out.append("Z")
            i += 1
            continue
        # y: consonant at word/syllable start, vowel elsewhere
        if word[i] == "y":
            if i == 0:
                out.append("Y")
            elif i == len(word) - 1:
                out.append("AY1" if len(word) <= 3 else "IY0")
            else:
                out.append("IH0")
            i += 1
            continue
        for pat, phones in _RULES:
            anchored = pat.endswith("$")
            p = pat[:-1] if anchored else pat
            if word.startswith(p, i) and (not anchored or i + len(p) == len(word)):
                out.extend(phones.split())
                i += len(p)
                break
        else:
            i += 1  # unknown character: skip
    return out


def word_to_phonemes(word: str) -> List[str]:
    """Lexicon -> morphology -> letter-to-sound, first hit wins."""
    low = word.lower()
    phones = _LEXICON.get(low)
    if phones is not None:
        return [f"@{p}" for p in phones.split()]
    derived = _inflected_phones(low)
    if derived is not None:
        return [f"@{p}" for p in derived]
    return [f"@{p}" for p in letter_to_sound(word)]


_PUNCT = frozenset(string.punctuation)


def english_phonemize(
    text: Union[str, Sequence[str]],
    is_training: bool = True,
) -> Tuple[List[str], List[int]]:
    """English text -> (@PH phoneme list, per-word boundary counts).

    Mirrors the VN ``phonemize`` conventions (g2p.py:188-251): trailing
    period appended, punctuation -> <SILENT> / sentence-final </S>,
    uppercased output."""
    words = list(text.split()) if isinstance(text, str) else list(text)
    if not words:
        words = ["."]
    if words[-1] not in _PUNCT:
        words.append(".")
    phonemes: List[str] = []
    boundaries: List[int] = []
    last = len(words) - 1
    for i, word in enumerate(words):
        if all(ch in _PUNCT for ch in word):
            seq = [EOS] if i == last else [SILENT]
        else:
            seq = word_to_phonemes(word.strip(string.punctuation) or word)
            if not seq:
                seq = [SILENT]
        phonemes.extend(seq)
        boundaries.append(len(seq))
    return [p.upper() for p in phonemes], boundaries


def english_to_sequence(text: str, return_boundary: bool = False):
    """English text -> ids in the extended (VN+CMU) symbol table."""
    from .sequence import phonemes_to_sequence

    phonemes, boundaries = english_phonemize(text.lower())
    seq = phonemes_to_sequence(phonemes, table=ENGLISH_SYMBOL_TO_ID, strict=False)
    if return_boundary:
        return seq, boundaries
    return seq
