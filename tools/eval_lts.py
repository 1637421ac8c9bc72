"""Evaluate the English letter-to-sound rules against the lexicon.

The lexicon is a genuine held-out set for the hand-written rules (the rules
never consult it — tests/test_english.py::test_lts_heldout_accuracy).  This
tool prints word accuracy / phoneme error rate and the most common error
patterns so rule batches can be error-driven.

Usage:
  python tools/eval_lts.py [--errors N] [--suffix SUF] [--contains STR]
"""

from __future__ import annotations

import argparse
import difflib
import os
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from e2e_tts_tpu.text.english import _LEXICON, letter_to_sound  # noqa: E402


def _strip(ps):
    return [p.rstrip("012") for p in ps]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--errors", type=int, default=0,
                    help="print the first N failing words with gold/pred")
    ap.add_argument("--suffix", default=None,
                    help="restrict the error listing to words ending in SUF")
    ap.add_argument("--contains", default=None,
                    help="restrict the error listing to words containing STR")
    args = ap.parse_args(argv)

    n = word_ok = phone_err = phone_tot = 0
    fails = []
    op_counter = Counter()
    for w, ph in sorted(_LEXICON.items()):
        if not w.isalpha():
            continue
        gold, pred = _strip(ph.split()), _strip(letter_to_sound(w))
        n += 1
        if gold == pred:
            word_ok += 1
        else:
            fails.append((w, gold, pred))
        sm = difflib.SequenceMatcher(a=gold, b=pred)
        for tag, i1, i2, j1, j2 in sm.get_opcodes():
            if tag == "equal":
                continue
            phone_err += max(i2 - i1, j2 - j1)
            op_counter[(" ".join(gold[i1:i2]), " ".join(pred[j1:j2]))] += 1
        phone_tot += len(gold)

    print(f"words={n} word_acc={word_ok / n:.4f} "
          f"per={phone_err / phone_tot:.4f} fails={len(fails)}")
    print("top substitution patterns (gold -> pred):")
    for (g, p), c in op_counter.most_common(30):
        print(f"  {c:4d}  {g or '∅'} -> {p or '∅'}")
    if args.errors:
        shown = 0
        for w, gold, pred in fails:
            if args.suffix and not w.endswith(args.suffix):
                continue
            if args.contains and args.contains not in w:
                continue
            print(f"  {w}: gold={' '.join(gold)} | pred={' '.join(pred)}")
            shown += 1
            if shown >= args.errors:
                break


if __name__ == "__main__":
    main()
