"""Symbol inventories.

v2 (FastPitch) uses the keithito/tacotron 'english_basic' set: 64 characters +
84 ARPAbet phonemes = 148 ids, pad=0 (reference
python/fastpitch1_1/common/text/symbols.py — itself from the public
keithito/tacotron repo; the inventory is interop data required for checkpoint
compatibility).

v3 (xVAPitch) uses the 524-token xVAARPAbet set, stored as data in
xvaarpabet_symbols.json (extracted from reference
python/xvapitch/text/ipa_to_xvaarpabet.py:103).
"""
from __future__ import annotations

import functools
import json
import os

# CMUdict phone inventory with stress variants (public CMUdict data).
ARPABET = [
    "AA", "AA0", "AA1", "AA2", "AE", "AE0", "AE1", "AE2", "AH", "AH0", "AH1",
    "AH2", "AO", "AO0", "AO1", "AO2", "AW", "AW0", "AW1", "AW2", "AY", "AY0",
    "AY1", "AY2", "B", "CH", "D", "DH", "EH", "EH0", "EH1", "EH2", "ER", "ER0",
    "ER1", "ER2", "EY", "EY0", "EY1", "EY2", "F", "G", "HH", "IH", "IH0",
    "IH1", "IH2", "IY", "IY0", "IY1", "IY2", "JH", "K", "L", "M", "N", "NG",
    "OW", "OW0", "OW1", "OW2", "OY", "OY0", "OY1", "OY2", "P", "R", "S", "SH",
    "T", "TH", "UH", "UH0", "UH1", "UH2", "UW", "UW0", "UW1", "UW2", "V", "W",
    "Y", "Z", "ZH",
]


@functools.lru_cache(maxsize=None)
def get_symbols(symbol_set: str = "english_basic"):
    if symbol_set == "english_basic":
        _pad = "_"
        _punctuation = "!'(),.:;? "
        _special = "-"
        _letters = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
        return list(_pad + _special + _punctuation + _letters) + [
            "@" + s for s in ARPABET
        ]
    if symbol_set == "xvaarpabet":
        return xva_symbols()
    raise ValueError(f"unknown symbol set {symbol_set}")


def get_pad_idx(symbol_set: str = "english_basic") -> int:
    if symbol_set == "english_basic":
        return 0
    if symbol_set == "xvaarpabet":
        return xva_symbols().index("<PAD>")
    raise ValueError(symbol_set)


@functools.lru_cache(maxsize=None)
def xva_symbols():
    """524-token xVAARPAbet inventory (v3 vocabulary, data file)."""
    path = os.path.join(os.path.dirname(__file__), "xvaarpabet_symbols.json")
    with open(path) as f:
        return json.load(f)["all_symbols"]
