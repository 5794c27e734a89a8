"""IPA → xVAARPAbet conversion.

Behavioral parity with reference python/xvapitch/text/ipa_to_xvaarpabet.py
(ipa2xvaarpabet :724-820 + the vendored public `phonecodes` translation
tables): greedy longest-match IPA→ARPAbet translation, stress/tone digits
attached to vowels, manual replacement tables for 20+ languages, and the
compound-phone splitting loop. The mapping tables live in
ipa_mappings.json (data extracted from the reference's tables — they are
interoperability vocabulary, index-compatible with shipped models).

Any IPA-producing G2P (eSpeak-NG, epitran, dictionaries, the reference's own
g2p caches) can feed this to hit the exact 524-token vocabulary.
"""
from __future__ import annotations

import functools
import json
import os
import re
from typing import Dict, List


@functools.lru_cache(maxsize=None)
def _tables():
    path = os.path.join(os.path.dirname(__file__), "ipa_mappings.json")
    with open(path, encoding="utf-8") as f:
        d = json.load(f)
    # longest-first keys for greedy matching (drop degenerate empty keys)
    ipa_keys = sorted(
        (k for k in d["ipa2arpabet"] if k), key=len, reverse=True
    )
    return d, ipa_keys


@functools.lru_cache(maxsize=None)
def _arpabet_symbols():
    from .symbols import xva_symbols

    # base ARPAbet inventory = everything before the punctuation block
    syms = xva_symbols()
    out = []
    for s in syms:
        if s in (".", ",", "!", "?", "-", ";", ":", "—"):
            break
        out.append(s)
    return out


def _translate_greedy(ipa: str) -> List[str]:
    """Greedy longest-match IPA→ARPAbet (phonecodes translate_string)."""
    d, ipa_keys = _tables()
    table: Dict[str, str] = d["ipa2arpabet"]
    out: List[str] = []
    i = 0
    while i < len(ipa):
        ch = ipa[i]
        if ch in " \t":
            out.append(" ")
            i += 1
            continue
        matched = False
        for k in ipa_keys:
            if ipa.startswith(k, i):
                out.append(table[k])
                i += len(k)
                matched = True
                break
        if not matched:
            out.append(ch)  # handled later by the manual tables
            i += 1
    return out


def _attach_stress(tokens: List[str]) -> List[str]:
    """Attach stress digits to the FOLLOWING vowel (IPA ˈ/ˌ precede the
    stressed syllable); an existing lexical digit is replaced."""
    d, _ = _tables()
    vowels = set(d["arpabet_vowels"])
    bases = {v.rstrip("012") for v in vowels} | set(vowels)
    out: List[str] = []
    pending_stress: str = ""
    for t in tokens:
        if t in "012":
            pending_stress = t
            continue
        if pending_stress and (t in vowels or t.rstrip("012") in bases and t[:1] in "AEIOU"):
            t = t.rstrip("012") + pending_stress
            pending_stress = ""
        out.append(t)
    return out


def _resolve_unknown(chunk: str, manual: Dict[str, str],
                     arpabet_set, by_len) -> List[str]:
    """Resolve a run of untranslated IPA chars via the manual tables
    (longest-prefix), peeling any ARPAbet symbols that appear inline."""
    manual_keys = sorted((k for k in manual if k), key=len, reverse=True)
    phones: List[str] = []
    while chunk:
        for k in manual_keys:
            if chunk.startswith(k):
                phones.extend(manual[k].split(" "))
                chunk = chunk[len(k):]
                break
        else:
            for p in by_len:
                if chunk.startswith(p):
                    phones.append(p)
                    chunk = chunk[len(p):]
                    break
            else:
                chunk = chunk[1:]  # unmappable mark — drop
    return [p for p in phones if p in arpabet_set]


def ipa_to_xvaarpabet(ipa_text: str) -> List[str]:
    """IPA string → list of xVAARPAbet phones."""
    d, _ = _tables()
    ipa_text = ipa_text.replace("ː", " ").replace("ˈ", "1").replace("ˌ", "2")
    tokens = _attach_stress(_translate_greedy(ipa_text))

    arpabet = _arpabet_symbols()
    arpabet_set = set(arpabet)
    by_len = sorted(arpabet, key=len, reverse=True)
    manual = {**d["manual_replace"], **d["manual_ignore_replace"]}

    phones: List[str] = []
    pending = ""  # run of untranslated raw chars (may be multi-codepoint keys)
    for t in tokens + [" "]:
        if t in arpabet_set or t == " ":
            if pending:
                phones.extend(_resolve_unknown(pending, manual, arpabet_set, by_len))
                pending = ""
            if t != " ":
                phones.append(t)
        else:
            pending += t
    return phones
