"""IPA → xVAARPAbet conversion, exact to the reference implementation.

The shipped v3 models tokenize text through this conversion
(reference python/xvapitch/text/ipa_to_xvaarpabet.py:714-812 ipa2xvaarpabet,
built on the public phonecodes DP translator), so its behavior — including
its quirks (stress digits only attach to phonecode-translated vowels; OOV
symbols resolve through the manual tables after a greedy ARPAbet peel) — is
an interop contract. Tables live in ipa_tables.json (extracted
interoperability data, like the 524-symbol vocabulary). Golden tests run the
shipped g2p caches through both implementations.
"""
from __future__ import annotations

import functools
import json
import os
from typing import Dict, List, Set, Tuple

_HERE = os.path.dirname(__file__)


@functools.lru_cache(maxsize=None)
def _tables():
    with open(os.path.join(_HERE, "ipa_tables.json"), encoding="utf8") as f:
        t = json.load(f)
    return t


def _translate_string(s: str, d: Dict[str, str]) -> Tuple[List[str], List[bool]]:
    """Min-cost segmentation of ``s`` into dictionary symbols (phonecodes
    translate_string semantics: cost 1 per translated symbol, 10 per OOV
    character)."""
    N = len(s)
    symcost, oovcost = 1, 10
    maxsym = max((len(k) for k in d), default=1)
    # lattice[n] = (cost, back, out_symbol, translated)
    lattice: List[Tuple[int, int, str, bool]] = [(0, 0, "", True)]
    for n in range(1, N + 1):
        lattice.append((oovcost + lattice[n - 1][0], n - 1, s[n - 1:n], False))
        for m in range(1, min(n + 1, maxsym + 1)):
            seg = s[n - m:n]
            if seg in d and symcost + lattice[n - m][0] < lattice[n][0]:
                lattice[n] = (symcost + lattice[n - m][0], n - m, d[seg], True)
    out, translated = [], []
    n = N
    while n > 0:
        out.append(lattice[n][2])
        translated.append(lattice[n][3])
        n = lattice[n][1]
    return out[::-1], translated[::-1]


def _attach_tones_to_vowels(il: List[str], tones: str, vowels: Set[str],
                            searchstep: int, catdir: int) -> List[str]:
    """Attach stress-digit symbols to the nearest following vowel symbol
    (phonecodes attach_tones_to_vowels semantics, including its index
    behavior after removal)."""
    ol = list(il)
    v = 0 if searchstep > 0 else len(ol) - 1
    t = -1
    while 0 <= v < len(ol):
        if (ol[v] in vowels or (len(ol[v]) > 1 and ol[v][0] in vowels)) and t >= 0:
            ol[v] = ol[v] + ol[t] if catdir >= 0 else ol[t] + ol[v]
            ol = ol[:t] + ol[t + 1:]
            t = -1
        if v < len(ol) and ol[v] in tones:
            t = v
        v += searchstep
    return ol


def phonecode_ipa2arpabet(ipa_string: str) -> str:
    t = _tables()
    il, _ = _translate_string(ipa_string, t["ipa2arpabet"])
    return "".join(
        _attach_tones_to_vowels(il, "012", set(t["arpabet_vowels"]), 1, 1)
    )


def ipa_to_xvaarpabet(ipa_text: str) -> List[str]:
    """Space-separated IPA phones → list of xVAARPAbet symbols (exact
    reference ipa2xvaarpabet behavior; the reference returns the joined
    string)."""
    t = _tables()
    arpabet_symbols: List[str] = t["arpabet_symbols"]
    arpabet_set = set(arpabet_symbols)
    manual_replace: Dict[str, str] = t["manual_replace"]
    ignore_replace: Dict[str, str] = t["manual_ignore_replace"]

    ipa_text = ipa_text.replace("ː", " ")
    pc = phonecode_ipa2arpabet(ipa_text)

    for k, v in ignore_replace.items():
        pc = pc.replace(k, v)
        pc = pc.replace("  ", "").replace("  ", "").strip()

    phones_final: List[str] = []
    for phone in pc.split(" "):
        phone = phone.strip()
        if not phone:
            continue
        if phone in arpabet_set:
            phones_final.append(phone)
            continue
        # greedy peel: repeatedly strip leading ARPAbet symbols in list
        # order, then fall back to the manual table (digits stripped after
        # the third round) — order and repeat counts are part of the
        # reference contract
        for outer_i in range(5):
            phone = phone.strip()
            for _ in range(5):
                if phone:
                    for ap in arpabet_symbols:
                        if phone and phone.startswith(ap):
                            phones_final.append(ap)
                            phone = phone[len(ap):]
                            if phone in arpabet_set:
                                phones_final.append(phone)
                                phone = ""
            if phone:
                if outer_i > 2:
                    phone = (phone.replace("0", "").replace("1", "")
                             .replace("2", "").replace("3", ""))
                if phone in manual_replace:
                    phones_final.append(manual_replace[phone])
                    phone = ""
                else:
                    for _ in range(3):
                        for mk in manual_replace:
                            if phone and phone.startswith(mk):
                                phones_final.append(manual_replace[mk])
                                phone = phone[len(mk):]
                                if phone in manual_replace:
                                    phones_final.append(manual_replace[phone])
                                    phone = ""

    mpr: Dict[str, str] = t["manual_phone_replacements"]
    return [mpr.get(p, p) for p in phones_final]


# Back-compat alias used elsewhere in the package
ipa2xvaarpabet = ipa_to_xvaarpabet
