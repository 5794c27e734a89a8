"""English text cleaners (reference python/fastpitch1_1/common/text/cleaners.py
semantics: lowercase → abbreviation expansion → number normalization →
whitespace collapse, with accent stripping instead of unidecode)."""
from __future__ import annotations

import re
import unicodedata

from .numbers import normalize_numbers

_ABBREVIATIONS = [
    (re.compile(r"\b%s\." % abbr, re.IGNORECASE), full)
    for abbr, full in [
        ("mrs", "misess"), ("mr", "mister"), ("dr", "doctor"), ("st", "saint"),
        ("co", "company"), ("jr", "junior"), ("maj", "major"), ("gen", "general"),
        ("drs", "doctors"), ("rev", "reverend"), ("lt", "lieutenant"),
        ("hon", "honorable"), ("sgt", "sergeant"), ("capt", "captain"),
        ("esq", "esquire"), ("ltd", "limited"), ("col", "colonel"), ("ft", "fort"),
    ]
]

_whitespace_re = re.compile(r"\s+")


def expand_abbreviations(text: str) -> str:
    for pattern, full in _ABBREVIATIONS:
        text = pattern.sub(full, text)
    return text


def strip_accents(text: str) -> str:
    return "".join(
        c for c in unicodedata.normalize("NFD", text)
        if unicodedata.category(c) != "Mn"
    )


def collapse_whitespace(text: str) -> str:
    return _whitespace_re.sub(" ", text)


def english_cleaners(text: str) -> str:
    text = strip_accents(text)
    text = text.lower()
    text = expand_abbreviations(text)
    text = normalize_numbers(text)
    return collapse_whitespace(text).strip()
