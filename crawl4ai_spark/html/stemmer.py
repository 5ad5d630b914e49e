"""English Snowball ("porter2") stemmer, from scratch off the published
algorithm (snowballstem.org/algorithms/english/stemmer.html — public spec;
the reference consumes it through the PyStemmer package).

Used by the BM25 content filter when ``use_stemming=True``. Pure Python.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDING = frozenset("cdeghkmnrt")

_EXCEPTIONS = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
_EXCEPTIONS_1A = frozenset(
    {"inning", "outing", "canning", "herring", "earring", "proceed",
     "exceed", "succeed"}
)


def _is_vowel(w: str, i: int) -> bool:
    return w[i] in _VOWELS


def _regions(w: str) -> tuple[int, int]:
    """(r1, r2) start offsets."""
    r1 = len(w)
    for prefix in ("gener", "commun", "arsen"):
        if w.startswith(prefix):
            r1 = len(prefix)
            break
    else:
        for i in range(1, len(w)):
            if not _is_vowel(w, i) and _is_vowel(w, i - 1):
                r1 = i + 1
                break
    r2 = len(w)
    for i in range(r1 + 1, len(w)):
        if not _is_vowel(w, i) and _is_vowel(w, i - 1):
            r2 = i + 1
            break
    return r1, r2


def _ends_short_syllable(w: str) -> bool:
    """(a) non-vowel + vowel + non-vowel(≠wxY) at end, or (b) word is
    vowel + non-vowel."""
    if len(w) == 2:
        return _is_vowel(w, 0) and not _is_vowel(w, 1)
    if len(w) >= 3:
        a, b, c = w[-3], w[-2], w[-1]
        return (
            a not in _VOWELS
            and b in _VOWELS
            and c not in _VOWELS
            and c not in "wxY"
        )
    return False


def porter2_stem(word: str) -> str:
    w = word.lower()
    if len(w) <= 2:
        return w
    if w.startswith("'"):
        w = w[1:]
    if w in _EXCEPTIONS:
        return _EXCEPTIONS[w]
    # mark consonant-y
    if w.startswith("y"):
        w = "Y" + w[1:]
    w = "".join(
        "Y" if c == "y" and i > 0 and w[i - 1] in _VOWELS else c
        for i, c in enumerate(w)
    )
    r1, r2 = _regions(w)

    # step 0: apostrophe suffixes
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith(("ied", "ies")):
        w = w[:-3] + ("i" if len(w) - 3 > 1 else "ie")
    elif w.endswith(("us", "ss")):
        pass
    elif w.endswith("s"):
        if any(c in _VOWELS for c in w[:-2]):
            w = w[:-1]

    if w in _EXCEPTIONS_1A:
        return w.replace("Y", "y")

    # step 1b
    if w.endswith(("eed", "eedly")):
        suf = "eedly" if w.endswith("eedly") else "eed"
        if len(w) - len(suf) >= r1:
            w = w[: -len(suf)] + "ee"
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if w.endswith(suf):
                stem = w[: -len(suf)]
                if any(c in _VOWELS for c in stem):
                    w = stem
                    if w.endswith(("at", "bl", "iz")):
                        w += "e"
                    elif w.endswith(_DOUBLES):
                        w = w[:-1]
                    elif len(w) <= r1 and _ends_short_syllable(w):
                        w += "e"
                break

    # step 1c: y→i after a non-vowel that isn't the first letter
    if (
        len(w) > 2
        and w[-1] in "yY"
        and w[-2] not in _VOWELS
    ):
        w = w[:-1] + "i"

    def in_r1(suf: str) -> bool:
        return len(w) - len(suf) >= r1

    def in_r2(suf: str) -> bool:
        return len(w) - len(suf) >= r2

    # step 2 (longest suffix, act only when it lies in R1)
    step2 = (
        ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
        ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
        ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
        ("ation", "ate"), ("alism", "al"), ("aliti", "al"), ("ousli", "ous"),
        ("iviti", "ive"), ("fulli", "ful"), ("enci", "ence"),
        ("anci", "ance"), ("abli", "able"), ("izer", "ize"), ("ator", "ate"),
        ("alli", "al"), ("bli", "ble"), ("ogi", "og"), ("li", ""),
    )
    for suf, rep in step2:
        if w.endswith(suf):
            if in_r1(suf):
                if suf == "ogi":
                    if w[-4:-3] == "l":
                        w = w[:-3] + rep
                elif suf == "li":
                    if len(w) >= 3 and w[-3] in _LI_ENDING:
                        w = w[:-2]
                else:
                    w = w[: -len(suf)] + rep
            break

    # step 3
    step3 = (
        ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
        ("icate", "ic"), ("iciti", "ic"), ("ical", "ic"), ("ative", ""),
        ("ness", ""), ("ful", ""),
    )
    for suf, rep in step3:
        if w.endswith(suf):
            if in_r1(suf):
                if suf == "ative":
                    if in_r2(suf):
                        w = w[:-5]
                else:
                    w = w[: -len(suf)] + rep
            break

    # step 4 (delete in R2)
    step4 = (
        "ement", "ance", "ence", "able", "ible", "ment", "ant", "ent",
        "ism", "ate", "iti", "ous", "ive", "ize", "ion", "al", "er", "ic",
    )
    for suf in step4:
        if w.endswith(suf):
            if in_r2(suf):
                if suf == "ion":
                    if len(w) >= 4 and w[-4] in "st":
                        w = w[:-3]
                else:
                    w = w[: -len(suf)]
            break

    # step 5
    if w.endswith("e"):
        if len(w) - 1 >= r2 or (
            len(w) - 1 >= r1 and not _ends_short_syllable(w[:-1])
        ):
            w = w[:-1]
    elif w.endswith("l") and len(w) - 1 >= r2 and len(w) >= 2 and w[-2] == "l":
        w = w[:-1]

    return w.replace("Y", "y")
