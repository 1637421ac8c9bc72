"""English text frontend (ARPAbet).

The reference serves English through an external Coqui-TTS VITS checkpoint
(reference: synthesizer.py:12-25) and keeps a CMU ARPAbet symbol block for
foreign words (models/g2p/symbols.py:10-19, the "@PH" tags consumed by
text_to_sequence).  External torch checkpoints cannot ship here, so English
is a first-class in-framework frontend instead: a built-in lexicon of common
words plus rule-based letter-to-sound for everything else, emitting the same
"@PH" ARPAbet tags the VN foreign-word path uses.  Models trained with this
frontend use the extended symbol table (build_symbols(include_cmu=True), 200
symbols; VN ids are unchanged because the CMU block appends after them).
"""

from __future__ import annotations

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

# ---------------------------------------------------------------------------
# Rule-based letter-to-sound fallback.  Longest-match left-to-right over
# (grapheme, context) patterns; "$" anchors end of word.  Coverage is the
# usual rough 80% of regular English spellings — OOV words get a consistent,
# trainable pronunciation rather than a crash (the serving contract).
# ---------------------------------------------------------------------------

_RULES: List[Tuple[str, str]] = [
    ("tion$", "SH AH0 N"), ("sion$", "ZH AH0 N"), ("ought", "AO1 T"),
    ("augh", "AO1"), ("eigh", "EY1"), ("igh", "AY1"), ("tch", "CH"),
    ("dge", "JH"), ("ing$", "IH0 NG"), ("ed$", "D"),
    ("air", "EH1 R"), ("ear", "IH1 R"), ("oor", "AO1 R"),
    ("ch", "CH"), ("sh", "SH"), ("th", "TH"), ("ph", "F"), ("wh", "W"),
    ("ck", "K"), ("ng", "NG"), ("qu", "K W"), ("wr", "R"), ("kn", "N"),
    ("ai", "EY1"), ("ay", "EY1"), ("au", "AO1"), ("aw", "AO1"),
    ("ee", "IY1"), ("ea", "IY1"), ("ey", "EY1"), ("ew", "UW1"),
    ("ie", "IY1"), ("oa", "OW1"), ("oo", "UW1"), ("ou", "AW1"),
    ("ow", "OW1"), ("oi", "OY1"), ("oy", "OY1"), ("ue", "UW1"),
    ("ui", "UW1"), ("ar", "AA1 R"), ("er", "ER0"), ("ir", "ER1"),
    ("or", "AO1 R"), ("ur", "ER1"),
    ("a", "AE1"), ("b", "B"), ("c", "K"), ("d", "D"), ("e", "EH1"),
    ("f", "F"), ("g", "G"), ("h", "HH"), ("i", "IH1"), ("j", "JH"),
    ("k", "K"), ("l", "L"), ("m", "M"), ("n", "N"), ("o", "AA1"),
    ("p", "P"), ("r", "R"), ("s", "S"), ("t", "T"), ("u", "AH1"),
    ("v", "V"), ("w", "W"), ("x", "K S"), ("y", "IY0"), ("z", "Z"),
]


def letter_to_sound(word: str) -> List[str]:
    """Rule-based grapheme -> ARPAbet for out-of-lexicon words."""
    word = word.lower()
    # silent final e after consonant ("stone" -> ston) with long prior vowel
    # handled approximately: drop it, rules above carry the vowels
    if (
        len(word) > 2
        and word.endswith("e")
        and word[-2] not in "aeiou"
        and word[-3] in "aeiou"
    ):
        word = word[:-1]
    out: List[str] = []
    i = 0
    while i < len(word):
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
    phones = _LEXICON.get(word.lower())
    if phones is None:
        return [f"@{p}" for p in letter_to_sound(word)]
    return [f"@{p}" for p in phones.split()]


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
