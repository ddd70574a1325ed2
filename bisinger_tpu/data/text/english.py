"""English text frontend: word -> CMU phones, syllabification, and
syllable<->phone alignment.

The reference uses a CMU lexicon file + spacy_syllables
(`inference/m4singer/bisinger/a-m4-detect.py:30-136`). Neither the
lexicon nor spacy ships in this environment, so this module provides:

  - a built-in mini CMU lexicon for common words, extendable from a
    user-supplied `lexicon.txt` ("WORD PH PH ..." lines, stress digits
    stripped);
  - a rule-based grapheme-to-phoneme fallback for OOV words;
  - a rule-based syllable splitter (vowel-group nuclei with onset
    maximization) replacing spacy_syllables;
  - `map_syllables_to_phones`: greedy consonant-boundary alignment with
    the same intent as the reference's `get_syllable_cmuph_mapping`
    (`a-m4-detect.py:85-136`) but robust to arbitrary words (the
    reference hardcodes fixups for specific lyrics).
"""

from __future__ import annotations

import os
import re
from typing import Dict, List, Optional

CMU_VOWELS = {
    "AA", "AE", "AH", "AO", "AW", "AY", "EH", "ER", "EY",
    "IH", "IY", "OW", "OY", "UH", "UW",
}

# Small built-in lexicon (common singing-lyric words); extend via file.
_BUILTIN_LEXICON = {
    "a": "AH", "i": "AY", "you": "Y UW", "me": "M IY", "my": "M AY",
    "the": "DH AH", "of": "AH V", "to": "T UW", "in": "IH N",
    "it": "IH T", "it's": "IH T S", "is": "IH Z", "and": "AE N D",
    "love": "L AH V", "baby": "B EY B IY", "heart": "HH AA R T",
    "life": "L AY F", "time": "T AY M", "night": "N AY T",
    "day": "D EY", "world": "W ER L D", "circle": "S ER K AH L",
    "hello": "HH AH L OW", "forever": "F ER EH V ER",
    "never": "N EH V ER", "always": "AO L W EY Z",
    "with": "W IH DH", "for": "F AO R", "on": "AA N", "oh": "OW",
    "oooh": "UW", "la": "L AA", "yeah": "Y AE", "be": "B IY",
    "so": "S OW", "we": "W IY", "all": "AO L", "one": "W AH N",
    "superstar": "S UW P ER S T AA R", "enough": "IH N AH F",
    "lovers": "L AH V ER Z", "dream": "D R IY M", "sing": "S IH NG",
    "song": "S AO NG", "like": "L AY K", "know": "N OW",
    "want": "W AA N T", "when": "W EH N", "where": "W EH R",
    "will": "W IH L", "can": "K AE N", "say": "S EY", "see": "S IY",
}

_G2P_DIGRAPHS = [
    ("tch", ["CH"]), ("sch", ["SH"]), ("ough", ["AO"]), ("igh", ["AY"]),
    ("tion", ["SH", "AH", "N"]), ("sion", ["ZH", "AH", "N"]),
    ("ch", ["CH"]), ("sh", ["SH"]), ("th", ["TH"]), ("ph", ["F"]),
    ("wh", ["W"]), ("ck", ["K"]), ("ng", ["NG"]), ("qu", ["K", "W"]),
    ("ee", ["IY"]), ("ea", ["IY"]), ("oo", ["UW"]), ("ou", ["AW"]),
    ("ow", ["OW"]), ("ai", ["EY"]), ("ay", ["EY"]), ("oy", ["OY"]),
    ("oi", ["OY"]), ("au", ["AO"]), ("aw", ["AO"]), ("ar", ["AA", "R"]),
    ("er", ["ER"]), ("ir", ["ER"]), ("ur", ["ER"]), ("or", ["AO", "R"]),
]
_G2P_SINGLE = {
    "a": ["AE"], "b": ["B"], "c": ["K"], "d": ["D"], "e": ["EH"],
    "f": ["F"], "g": ["G"], "h": ["HH"], "i": ["IH"], "j": ["JH"],
    "k": ["K"], "l": ["L"], "m": ["M"], "n": ["N"], "o": ["AA"],
    "p": ["P"], "q": ["K"], "r": ["R"], "s": ["S"], "t": ["T"],
    "u": ["AH"], "v": ["V"], "w": ["W"], "x": ["K", "S"], "y": ["Y"],
    "z": ["Z"],
}


class EnglishLexicon:
    def __init__(self, lexicon_path: Optional[str] = None):
        self.dict: Dict[str, List[str]] = {
            w: p.split() for w, p in _BUILTIN_LEXICON.items()
        }
        if lexicon_path and os.path.exists(lexicon_path):
            with open(lexicon_path) as f:
                for line in f:
                    parts = line.split()
                    if len(parts) >= 2:
                        word = parts[0].lower()
                        phones = [re.sub(r"\d", "", p) for p in parts[1:]]
                        self.dict.setdefault(word, phones)

    def lookup(self, word: str) -> List[str]:
        word = word.lower().strip()
        if word in self.dict:
            return list(self.dict[word])
        return g2p_fallback(word)


def g2p_fallback(word: str) -> List[str]:
    """Rule-based letter-to-sound for OOV words; final silent 'e' dropped."""
    w = re.sub(r"[^a-z']", "", word.lower()).replace("'", "")
    if len(w) > 2 and w.endswith("e") and w[-2] not in "aeiou":
        w = w[:-1]
    phones: List[str] = []
    i = 0
    while i < len(w):
        for pat, ph in _G2P_DIGRAPHS:
            if w.startswith(pat, i):
                phones += ph
                i += len(pat)
                break
        else:
            phones += _G2P_SINGLE.get(w[i], [])
            i += 1
    # collapse doubled consonants: 'll' -> L L -> L
    out: List[str] = []
    for p in phones:
        if out and out[-1] == p and p not in CMU_VOWELS:
            continue
        out.append(p)
    return out or ["AH"]


_VOWEL_RE = re.compile(r"[aeiouy]+")

# legal English two-letter onset clusters (kept intact at syllable starts)
_LEGAL_ONSETS = {
    "bl", "br", "ch", "cl", "cr", "dr", "fl", "fr", "gl", "gr", "kl", "kr",
    "ph", "pl", "pr", "sc", "sh", "sk", "sl", "sm", "sn", "sp", "st", "sw",
    "th", "tr", "tw", "wh", "wr",
}


def syllabify(word: str) -> List[str]:
    """Rule-based orthographic syllable split: one syllable per vowel
    group, intervocalic consonants split before the last one (onset
    maximization for singletons)."""
    w = word.lower()
    groups = list(_VOWEL_RE.finditer(w))
    if len(groups) <= 1:
        return [w]
    # drop final silent-e nucleus: 'circle' -> cir-cle not cir-cl-e
    if len(groups) >= 2 and groups[-1].group() == "e" and groups[-1].end() == len(w):
        groups = groups[:-1]
        if len(groups) == 1:
            return [w]
    bounds = [0]
    for g1, g2 in zip(groups[:-1], groups[1:]):
        cons_start, cons_end = g1.end(), g2.start()
        n_cons = cons_end - cons_start
        if n_cons <= 1:
            bounds.append(cons_start)  # V.CV
        elif w[cons_end - 2 : cons_end] in _LEGAL_ONSETS:
            bounds.append(cons_end - 2)  # VC.CCV (legal onset cluster)
        else:
            bounds.append(cons_end - 1)  # VC.CV
    bounds.append(len(w))
    return [w[a:b] for a, b in zip(bounds[:-1], bounds[1:]) if w[a:b]]


def map_syllables_to_phones(
    syllables: List[str], phones: List[str]
) -> List[List[str]]:
    """Distribute CMU phones across syllables: each syllable owns one
    vowel nucleus plus surrounding consonants (onset goes with the
    following syllable). Falls back to an even split when nuclei don't
    line up."""
    n = len(syllables)
    if n <= 1:
        return [list(phones)]
    vowel_idx = [i for i, p in enumerate(phones) if p in CMU_VOWELS]
    if len(vowel_idx) < n:
        # not enough nuclei: chunk evenly
        per = max(1, len(phones) // n)
        out = [phones[i * per : (i + 1) * per] for i in range(n - 1)]
        out.append(phones[(n - 1) * per :])
        return [c or [phones[-1]] for c in out]
    # if there are extra nuclei, merge the tail ones into the last syllable
    nuclei = vowel_idx[: n - 1] + [vowel_idx[n - 1]]
    out = []
    start = 0
    for k in range(n - 1):
        # boundary: right before the consonant that onsets the next nucleus
        next_nucleus = nuclei[k + 1]
        boundary = next_nucleus
        # give a single intervocalic consonant to the next syllable
        while boundary - 1 > nuclei[k] and phones[boundary - 1] not in CMU_VOWELS:
            boundary -= 1
        # keep at least the nucleus in this syllable
        boundary = max(boundary, nuclei[k] + 1)
        # coda: if more than one consonant, keep all but one here
        n_cons = next_nucleus - boundary
        if n_cons > 1:
            boundary = next_nucleus - 1
        out.append(phones[start:boundary])
        start = boundary
    out.append(phones[start:])
    return out
