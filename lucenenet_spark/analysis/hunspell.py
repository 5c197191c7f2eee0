"""Hunspell dictionary stemming (contrib Analyzers/Hunspell).

Re-creates the reference's dictionary-based stemmer
(src/contrib/Analyzers/Hunspell/{HunspellDictionary,HunspellAffix,
HunspellStemmer,HunspellStemFilter}.cs) over the standard public
Hunspell .aff/.dic text formats:

- Dictionary: `.dic` lines are `word[/flags]`; `.aff` carries `PFX`/
  `SFX` rule groups `PFX <flag> <crossproduct Y|N> <count>` followed by
  `PFX <flag> <strip> <append[/appendflags]> <condition>`; `0` means
  empty strip; conditions are anchored regexes (`^cond` for prefixes,
  `cond$` for suffixes — HunspellDictionary.cs:38-39) checked against
  the STRIPPED word (ApplyAffix, HunspellStemmer.cs:158-162); `AF`
  alias lines substitute numbered flag sets.
- Stemmer (HunspellStemmer.cs:95-151): every suffix substring and
  prefix substring of the word is looked up among rule appends; a rule
  applies when its flag cross-checks the previous level's append flags
  (null = all), the stripped word passes the condition AND exists in
  the dictionary carrying the rule's flag.  Cross-product rules recurse
  (RECURSION_CAP = 2) with the rule's append flags as the next level's
  cross-check set; a recursion that finds deeper stems REPLACES the
  intermediate stem (drinkables -> drink, never drinkable).
- Filter semantics (HunspellStemFilter.cs:54-85): each token is
  replaced by its unique stems (original word first when it is itself
  a dictionary word), ALL stems stacked at the token's position;
  a word the dictionary does not know passes through unchanged.

The stemmer is a driver-constructed object captured by the analyzer
closure — dictionaries are megabytes, corpora are terabytes, so the
dictionary rides to executors as task-closure data (the broadcast-dim
pattern), and stemming runs inside the invert kernel's analyzer seam
with zero extra shuffles.
"""

from __future__ import annotations

import re
from collections import defaultdict
from dataclasses import dataclass

from .tokenizers import tokenize_standard

RECURSION_CAP = 2  # HunspellStemmer.cs:31


@dataclass
class Affix:
    flag: str
    strip: str
    append: str
    append_flags: tuple[str, ...] | None  # None = no /flags -> allow all
    condition: re.Pattern
    cross_product: bool


class HunspellDictionary:
    """Parsed .aff + .dic (text, already decoded)."""

    def __init__(self, aff_text: str, dic_text: str,
                 ignore_case: bool = False):
        self.ignore_case = ignore_case
        self._prefixes: dict[str, list[Affix]] = defaultdict(list)
        self._suffixes: dict[str, list[Affix]] = defaultdict(list)
        self._words: dict[str, list[frozenset[str]]] = defaultdict(list)
        self._aliases: list[str] = []
        self._parse_aff(aff_text)
        self._parse_dic(dic_text)

    # ---- parsing ----

    def _parse_aff(self, text: str) -> None:
        lines = iter(text.splitlines())
        for line in lines:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "AF" and len(parts) == 2 and not parts[1].isdigit():
                self._aliases.append(parts[1])
            elif parts[0] in ("PFX", "SFX"):
                self._parse_affix_group(parts, lines, parts[0] == "PFX")

    def _parse_affix_group(self, header: list[str], lines, is_prefix: bool):
        cross = header[2] == "Y"
        for _ in range(int(header[3])):
            parts = next(lines).split()
            flag = parts[1]
            strip = "" if parts[2] == "0" else parts[2]
            append_arg = parts[3]
            append_flags: tuple[str, ...] | None = None
            if "/" in append_arg:
                append_arg, cflags = append_arg.rsplit("/", 1)
                if self._aliases and cflags.isdigit():
                    cflags = self._aliases[int(cflags) - 1]
                append_flags = tuple(sorted(cflags))
            cond = parts[4] if len(parts) > 4 else "."
            pat = re.compile(f"^{cond}" if is_prefix else f"{cond}$")
            affix = Affix(flag, strip, append_arg, append_flags, pat, cross)
            (self._prefixes if is_prefix else self._suffixes)[
                append_arg].append(affix)

    def _parse_dic(self, text: str) -> None:
        lines = text.splitlines()
        for line in lines[1:]:  # first line = entry count
            line = line.split("\t")[0].strip()
            if not line:
                continue
            if "/" in line:
                word, flags = line.split("/", 1)
                if self._aliases and flags.isdigit():
                    flags = self._aliases[int(flags) - 1]
                fset = frozenset(flags)
            else:
                word, fset = line, frozenset()
            if self.ignore_case:
                word = word.lower()
            self._words[word].append(fset)

    # ---- lookups (HunspellDictionary.LookupWord/Prefix/Suffix) ----

    def lookup_word(self, word: str) -> list[frozenset[str]] | None:
        if self.ignore_case:
            word = word.lower()
        return self._words.get(word)

    def lookup_suffix(self, append: str) -> list[Affix]:
        return self._suffixes.get(append, [])

    def lookup_prefix(self, append: str) -> list[Affix]:
        return self._prefixes.get(append, [])


class HunspellStemmer:
    """HunspellStemmer.cs: recursive affix stripping against the
    dictionary."""

    def __init__(self, dictionary: HunspellDictionary):
        self.dic = dictionary

    def stem(self, word: str) -> list[str]:
        stems: list[str] = []
        if self.dic.lookup_word(word) is not None:
            stems.append(word)
        stems.extend(self._stem(word, None, 0))
        return stems

    def unique_stems(self, word: str) -> list[str]:
        out, seen = [], set()
        for s in self.stem(word):
            if s not in seen:
                seen.add(s)
                out.append(s)
        return out

    def _stem(self, word: str, flags: tuple[str, ...] | None,
              depth: int) -> list[str]:
        stems: list[str] = []
        n = len(word)
        for i in range(n):  # suffix appends: word[i:]
            for affix in self.dic.lookup_suffix(word[i:]):
                if self._cross_checked(affix.flag, flags):
                    stripped = word[:n - len(affix.append)] + affix.strip
                    stems.extend(self._apply(stripped, affix, depth))
        for i in range(n - 1, -1, -1):  # prefix appends: word[:i]
            for affix in self.dic.lookup_prefix(word[:i]):
                if self._cross_checked(affix.flag, flags):
                    stripped = affix.strip + word[len(affix.append):]
                    stems.extend(self._apply(stripped, affix, depth))
        return stems

    def _apply(self, stripped: str, affix: Affix, depth: int) -> list[str]:
        """ApplyAffix (HunspellStemmer.cs:158-188)."""
        if not affix.condition.search(stripped):
            return []
        entries = self.dic.lookup_word(stripped)
        if entries is None:
            return []
        stems: list[str] = []
        for fset in entries:
            if affix.flag in fset:
                if affix.cross_product and depth < RECURSION_CAP:
                    deeper = self._stem(stripped, affix.append_flags,
                                        depth + 1)
                    stems.extend(deeper if deeper else [stripped])
                else:
                    stems.append(stripped)
        return stems

    @staticmethod
    def _cross_checked(flag: str, flags: tuple[str, ...] | None) -> bool:
        return flags is None or flag in flags


def hunspell_tokens(text: str | None, stemmer: HunspellStemmer,
                    dedup: bool = True) -> list[tuple[str, int]]:
    """Standard chain + HunspellStemFilter: each surviving token is
    replaced by its (unique) stems, all at the token's position; unknown
    words pass through unchanged (HunspellStemFilter.cs:73-76)."""
    out: list[tuple[str, int]] = []
    for tok, pos in tokenize_standard(text):
        stems = (stemmer.unique_stems(tok) if dedup else stemmer.stem(tok))
        if not stems:
            out.append((tok, pos))
        else:
            out.extend((s, pos) for s in stems)
    return out


def hunspell_analyzer(dictionary: HunspellDictionary, dedup: bool = True):
    """analyzer= callable for the index builders."""
    stemmer = HunspellStemmer(dictionary)

    def analyze(text):
        return hunspell_tokens(text, stemmer, dedup)

    return analyze
