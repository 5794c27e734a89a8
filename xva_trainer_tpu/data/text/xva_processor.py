"""v3 text → xVAARPAbet id encoding.

The reference's v3 front end (python/xvapitch/text/text_preprocessing.py, ~3.3k
LoC) runs per-language cleaning, heteronym dictionaries and eSpeak/epitran G2P
with on-disk caches, emitting tokens from the 524-symbol xVAARPAbet inventory
(ipa_to_xvaarpabet.py:103). This module implements the same interface with:

- the exact 524-token vocabulary (data file, index-compatible for export);
- English rule-based letter-context G2P (a compact approximation that emits
  valid ARPAbet; the dictionary/eSpeak layers slot in per-language later —
  ``register_g2p`` hook + the same on-disk cache format
  (text_preprocessing.py:279-303));
- punctuation pass-through and per-language processor registry for the 31
  languages (character-fallback until their G2P lands).
"""
from __future__ import annotations

import os
import re
from typing import Callable, Dict, List, Optional

import numpy as np

from .cleaners import english_cleaners
from .symbols import xva_symbols

_PUNCT = {".", ",", "!", "?", "-", ";", ":", "—"}

# Compact English letter-context → ARPAbet rules (approximation; a real
# dictionary/G2P can be registered per language via register_g2p).
_DIGRAPHS = [
    ("tch", ["CH"]), ("sch", ["SH"]), ("ough", ["AO1"]),
    ("th", ["TH"]), ("sh", ["SH"]), ("ch", ["CH"]), ("ph", ["F"]),
    ("wh", ["W"]), ("ck", ["K"]), ("ng", ["NG"]), ("qu", ["K", "W"]),
    ("ee", ["IY1"]), ("ea", ["IY1"]), ("oo", ["UW1"]), ("ou", ["AW1"]),
    ("ow", ["OW1"]), ("ai", ["EY1"]), ("ay", ["EY1"]), ("oi", ["OY1"]),
    ("oy", ["OY1"]), ("au", ["AO1"]), ("aw", ["AO1"]), ("ar", ["AA1", "R"]),
    ("er", ["ER0"]), ("ir", ["ER1"]), ("or", ["AO1", "R"]), ("ur", ["ER1"]),
]
_SINGLE = {
    "a": ["AE1"], "b": ["B"], "c": ["K"], "d": ["D"], "e": ["EH1"],
    "f": ["F"], "g": ["G"], "h": ["HH"], "i": ["IH1"], "j": ["JH"],
    "k": ["K"], "l": ["L"], "m": ["M"], "n": ["N"], "o": ["AA1"],
    "p": ["P"], "q": ["K"], "r": ["R"], "s": ["S"], "t": ["T"],
    "u": ["AH1"], "v": ["V"], "w": ["W"], "x": ["K", "S"], "y": ["Y"],
    "z": ["Z"],
}


def english_rule_g2p(word: str) -> List[str]:
    word = word.lower()
    phones: List[str] = []
    i = 0
    while i < len(word):
        for pat, ph in _DIGRAPHS:
            if word.startswith(pat, i):
                phones += ph
                i += len(pat)
                break
        else:
            ph = _SINGLE.get(word[i])
            if ph:
                # silent final e
                if word[i] == "e" and i == len(word) - 1 and len(word) > 2:
                    i += 1
                    continue
                phones += ph
            i += 1
    return phones or ["AH0"]


class XvaTextProcessor:
    """text → xVAARPAbet ids with an on-disk G2P cache (reference cache file
    format: one ``word|PH0 PH1 ...`` per line)."""

    def __init__(
        self,
        lang: str = "en",
        g2p: Optional[Callable[[str], List[str]]] = None,
        cache_path: Optional[str] = None,
    ):
        self.lang = lang
        self.symbols = xva_symbols()
        self.id_by_symbol = {s: i for i, s in enumerate(self.symbols)}
        self.pad_id = self.id_by_symbol["<PAD>"]
        self.g2p = g2p or _G2P_REGISTRY.get(lang, english_rule_g2p)
        self.cache: Dict[str, List[str]] = {}
        self.cache_path = cache_path
        if cache_path and os.path.exists(cache_path):
            with open(cache_path, encoding="utf-8") as f:
                for line in f:
                    if "|" in line:
                        w, p = line.strip().split("|", 1)
                        self.cache[w] = p.split(" ")

    def save_cache(self):
        if self.cache_path:
            with open(self.cache_path, "w", encoding="utf-8") as f:
                for w, p in self.cache.items():
                    f.write(f"{w}|{' '.join(p)}\n")

    def word_to_phones(self, word: str) -> List[str]:
        w = word.lower()
        if w not in self.cache:
            self.cache[w] = self.g2p(w)
        return self.cache[w]

    def text_to_sequence(self, text: str) -> np.ndarray:
        text = english_cleaners(text)
        ids: List[int] = []
        for token in re.findall(r"[a-zA-Z']+|[^\sa-zA-Z']", text):
            if token and token[0].isalpha():
                for ph in self.word_to_phones(token):
                    i = self.id_by_symbol.get(ph)
                    if i is not None:
                        ids.append(i)
            elif token in _PUNCT:
                ids.append(self.id_by_symbol[token])
            ids.append(self.id_by_symbol["_"])  # inter-token separator
        if ids and ids[-1] == self.id_by_symbol["_"]:
            ids.pop()
        return np.asarray(ids or [self.id_by_symbol["_"]], dtype=np.int32)

    __call__ = text_to_sequence


_G2P_REGISTRY: Dict[str, Callable[[str], List[str]]] = {}


def register_g2p(lang: str, fn: Callable[[str], List[str]]) -> None:
    """Plug a per-language G2P returning xVAARPAbet phones directly."""
    _G2P_REGISTRY[lang] = fn


def register_ipa_g2p(lang: str, fn: Callable[[str], str]) -> None:
    """Plug a per-language G2P returning an IPA string (the eSpeak/epitran
    interface) — routed through the reference-parity IPA→xVAARPAbet mapping
    (ipa.py; reference fill_missing_via_g2p text_preprocessing.py:304-448)."""
    from .ipa import ipa_to_xvaarpabet

    _G2P_REGISTRY[lang] = lambda word: ipa_to_xvaarpabet(fn(word))


def get_text_preprocessor(lang: str, base_dir: Optional[str] = None) -> XvaTextProcessor:
    """Factory mirroring reference text_preprocessing.py:1523 semantics."""
    cache = os.path.join(base_dir, f"g2p_cache_{lang}.txt") if base_dir else None
    return XvaTextProcessor(lang, cache_path=cache)
