"""Model input symbol inventory.

Must match the reference vocabulary exactly (reference:
e2e_tts/models/g2p/symbols.py:21-50): 4 specials + 23 consonants + 2 medials
+ 15 vowels x 6 tones + 12 codas = 131 symbols, all uppercase.  The CMU
ARPAbet set is available for foreign-word support but excluded from the
default inventory, as in the serving copy (src/api/g2p/symbols.py:37).
"""

from .phonology import CODAS, DIPHTHONGS, MEDIALS, MONOPHTHONGS, ONSETS, TONES

PAD = "<PAD>"
SILENT = "<SILENT>"
BOS = "<S>"
EOS = "</S>"

SPECIALS = (PAD, SILENT, BOS, EOS)

CONSONANTS = tuple(sorted(set(ONSETS.values())))
MEDIAL_SYMBOLS = tuple(sorted(set(MEDIALS.values())))
# Monophthongs sorted, then the three diphthongs — matching the reference's
# ordering ["a","aa","aw","e","ee","i","o","oa","oo","ow","u","uw"] + ["ie","uo","wa"].
VOWELS = tuple(sorted(set(MONOPHTHONGS.values()))) + tuple(sorted(set(DIPHTHONGS.values())))
CODA_SYMBOLS = tuple(sorted(set(CODAS.values())))

TONED_VOWELS = tuple(f"{v}_{t}" for v in VOWELS for t in TONES)

CMU = tuple(
    f"@{ph}"
    for ph in (
        "AA0 AA1 AA2 AE0 AE1 AE2 AH0 AH1 AH2 AO0 AO1 AO2 AW0 AW1 AW2 "
        "AY0 AY1 AY2 B CH D DH EH0 EH1 EH2 ER0 ER1 ER2 EY0 EY1 EY2 F G HH "
        "IH0 IH1 IH2 IY0 IY1 IY2 JH K L M N NG OW0 OW1 OW2 OY0 OY1 OY2 "
        "P R S SH T TH UH0 UH1 UH2 UW UW0 UW1 UW2 V W Y Z ZH"
    ).split()
)


def build_symbols(include_cmu: bool = False) -> tuple:
    base = SPECIALS + CONSONANTS + MEDIAL_SYMBOLS + TONED_VOWELS + CODA_SYMBOLS
    if include_cmu:
        base = base + CMU
    return tuple(s.upper() for s in base)


symbols = build_symbols()

SYMBOL_TO_ID = {s: i for i, s in enumerate(symbols)}
ID_TO_SYMBOL = {i: s for i, s in enumerate(symbols)}

PAD_ID = SYMBOL_TO_ID[PAD]
SILENT_ID = SYMBOL_TO_ID[SILENT.upper()]
EOS_ID = SYMBOL_TO_ID[EOS]
