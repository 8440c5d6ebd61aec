"""Porter stemmer — classic algorithm, pure Python.

Re-implements Martin Porter's original 1980 suffix-stripping algorithm
("An algorithm for suffix stripping", Program 14(3):130-137), following the
author's canonical public-domain Java implementation (tartarus.org), which is
the lineage of the OpenNLP ``PorterStemmer`` the reference calls per token
(`Indexer/Service/PreIndexer.java:165-178`, opennlp-tools 1.9.3 via
`/root/reference/searchengine/pom.xml:93-94`).

Semantics notes for parity:
- Words of length <= 2 are returned unchanged (the classic ``k <= 1`` guard).
- Non-alphabetic characters are treated as consonants (the classic ``cons()``
  default branch), so tokens like ``numpy.array`` or ``3.14`` pass through the
  same state machine the Java implementation applies to them.
- Input is assumed already lowercased (the reference lowercases in
  ``tokenize``, `PreIndexer.java:94`).
"""

from __future__ import annotations

__all__ = ["porter_stem"]

_VOWELS = frozenset("aeiou")


def _is_cons(b: str, i: int) -> bool:
    c = b[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return True if i == 0 else not _is_cons(b, i - 1)
    return True


def _measure(b: str, j: int) -> int:
    """Number of consonant-vowel sequences in b[0..j]."""
    n = 0
    i = 0
    while True:
        if i > j:
            return n
        if not _is_cons(b, i):
            break
        i += 1
    i += 1
    while True:
        while True:
            if i > j:
                return n
            if _is_cons(b, i):
                break
            i += 1
        i += 1
        n += 1
        while True:
            if i > j:
                return n
            if not _is_cons(b, i):
                break
            i += 1
        i += 1


def _vowel_in_stem(b: str, j: int) -> bool:
    return any(not _is_cons(b, i) for i in range(j + 1))


def _double_cons(b: str, j: int) -> bool:
    if j < 1:
        return False
    return b[j] == b[j - 1] and _is_cons(b, j)


def _cvc(b: str, i: int) -> bool:
    """cvc at i, where the last c is not w, x or y (e.g. hop- -> hope)."""
    if i < 2 or not _is_cons(b, i) or _is_cons(b, i - 1) or not _is_cons(b, i - 2):
        return False
    return b[i] not in ("w", "x", "y")


class _Stem:
    __slots__ = ("b", "k", "j")

    def __init__(self, word: str):
        self.b = list(word)
        self.k = len(word) - 1
        self.j = 0

    def ends(self, s: str) -> bool:
        l = len(s)
        o = self.k - l + 1
        if o < 0:
            return False
        if self.b[o : o + l] != list(s):
            return False
        self.j = self.k - l
        return True

    def setto(self, s: str) -> None:
        o = self.j + 1
        self.b[o : o + len(s)] = list(s)
        self.k = self.j + len(s)

    def r(self, s: str) -> None:
        if _measure(self.b, self.j) > 0:
            self.setto(s)

    # Step 1: plurals and -ed / -ing
    def step1(self) -> None:
        if self.b[self.k] == "s":
            if self.ends("sses"):
                self.k -= 2
            elif self.ends("ies"):
                self.setto("i")
            elif self.b[self.k - 1] != "s":
                self.k -= 1
        if self.ends("eed"):
            if _measure(self.b, self.j) > 0:
                self.k -= 1
        elif (self.ends("ed") or self.ends("ing")) and _vowel_in_stem(self.b, self.j):
            self.k = self.j
            if self.ends("at"):
                self.setto("ate")
            elif self.ends("bl"):
                self.setto("ble")
            elif self.ends("iz"):
                self.setto("ize")
            elif _double_cons(self.b, self.k):
                self.k -= 1
                if self.b[self.k] in ("l", "s", "z"):
                    self.k += 1
            elif _measure(self.b, self.k) == 1 and _cvc(self.b, self.k):
                # here j == k (set by the successful ends("ed"/"ing") then k = j),
                # so setto appends a single 'e' after the stem
                self.setto("e")

    # Step 2: turn terminal y to i when there is another vowel in the stem
    def step2(self) -> None:
        if self.ends("y") and _vowel_in_stem(self.b, self.j):
            self.b[self.k] = "i"

    # Step 3: map double suffices to single ones
    def step3(self) -> None:
        if self.k == 0:
            return
        c = self.b[self.k - 1]
        if c == "a":
            if self.ends("ational"):
                self.r("ate")
            elif self.ends("tional"):
                self.r("tion")
        elif c == "c":
            if self.ends("enci"):
                self.r("ence")
            elif self.ends("anci"):
                self.r("ance")
        elif c == "e":
            if self.ends("izer"):
                self.r("ize")
        elif c == "l":
            if self.ends("bli"):
                self.r("ble")
            elif self.ends("alli"):
                self.r("al")
            elif self.ends("entli"):
                self.r("ent")
            elif self.ends("eli"):
                self.r("e")
            elif self.ends("ousli"):
                self.r("ous")
        elif c == "o":
            if self.ends("ization"):
                self.r("ize")
            elif self.ends("ation"):
                self.r("ate")
            elif self.ends("ator"):
                self.r("ate")
        elif c == "s":
            if self.ends("alism"):
                self.r("al")
            elif self.ends("iveness"):
                self.r("ive")
            elif self.ends("fulness"):
                self.r("ful")
            elif self.ends("ousness"):
                self.r("ous")
        elif c == "t":
            if self.ends("aliti"):
                self.r("al")
            elif self.ends("iviti"):
                self.r("ive")
            elif self.ends("biliti"):
                self.r("ble")
        elif c == "g":
            if self.ends("logi"):
                self.r("log")

    # Step 4: -ic-, -full, -ness etc.
    def step4(self) -> None:
        c = self.b[self.k]
        if c == "e":
            if self.ends("icate"):
                self.r("ic")
            elif self.ends("ative"):
                self.r("")
            elif self.ends("alize"):
                self.r("al")
        elif c == "i":
            if self.ends("iciti"):
                self.r("ic")
        elif c == "l":
            if self.ends("ical"):
                self.r("ic")
            elif self.ends("ful"):
                self.r("")
        elif c == "s":
            if self.ends("ness"):
                self.r("")

    # Step 5: -ant, -ence etc. in context <c>vcvc<v>
    def step5(self) -> None:
        if self.k == 0:
            return
        c = self.b[self.k - 1]
        if c == "a":
            if not self.ends("al"):
                return
        elif c == "c":
            if not self.ends("ance") and not self.ends("ence"):
                return
        elif c == "e":
            if not self.ends("er"):
                return
        elif c == "i":
            if not self.ends("ic"):
                return
        elif c == "l":
            if not self.ends("able") and not self.ends("ible"):
                return
        elif c == "n":
            if self.ends("ant"):
                pass
            elif self.ends("ement"):
                pass
            elif self.ends("ment"):
                pass
            elif self.ends("ent"):
                pass
            else:
                return
        elif c == "o":
            if self.ends("ion") and self.j >= 0 and self.b[self.j] in ("s", "t"):
                pass
            elif self.ends("ou"):
                pass
            else:
                return
        elif c == "s":
            if not self.ends("ism"):
                return
        elif c == "t":
            if not self.ends("ate") and not self.ends("iti"):
                return
        elif c == "u":
            if not self.ends("ous"):
                return
        elif c == "v":
            if not self.ends("ive"):
                return
        elif c == "z":
            if not self.ends("ize"):
                return
        else:
            return
        if _measure(self.b, self.j) > 1:
            self.k = self.j

    # Step 6: remove a final -e and reduce -ll
    def step6(self) -> None:
        self.j = self.k
        if self.b[self.k] == "e":
            a = _measure(self.b, self.k)
            if a > 1 or (a == 1 and not _cvc(self.b, self.k - 1)):
                self.k -= 1
        if self.b[self.k] == "l" and _double_cons(self.b, self.k) and _measure(self.b, self.k) > 1:
            self.k -= 1


def porter_stem(word: str) -> str:
    """Stem one (already lowercased) token; length <= 2 returned unchanged."""
    if len(word) <= 2:
        return word
    s = _Stem(word)
    s.step1()
    s.step2()
    s.step3()
    s.step4()
    s.step5()
    s.step6()
    return "".join(s.b[: s.k + 1])
