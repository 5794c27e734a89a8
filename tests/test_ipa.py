"""IPA → xVAARPAbet conversion + v3 processor with an IPA G2P."""
import numpy as np

from xva_trainer_tpu.data.text.ipa import ipa_to_xvaarpabet
from xva_trainer_tpu.data.text.symbols import xva_symbols
from xva_trainer_tpu.data.text.xva_processor import (
    XvaTextProcessor,
    register_ipa_g2p,
)


def test_basic_english_ipa():
    # space-separated IPA phones, reference-verified outputs
    assert ipa_to_xvaarpabet("t ˈɛ s t") == ["T", "EH1", "S", "T"]
    assert ipa_to_xvaarpabet("θ ˈɪ ŋ k ɪ ŋ") == [
        "TH", "IH1", "NG", "K", "IH", "NG"
    ]


def test_stress_attaches_forward():
    out = ipa_to_xvaarpabet("h ˈʌ l oʊ")
    assert out == ["HH", "AH1", "L", "OW"]


def test_non_english_symbols_resolve():
    syms = set(xva_symbols())
    for ipa in ("bɔ̃ʒuʁ", "ʃpʁaːxə", "ɡuːtən"):
        phones = ipa_to_xvaarpabet(ipa)
        assert phones, ipa
        assert all(p in syms for p in phones), (ipa, phones)


def test_processor_with_ipa_g2p():
    lex = {"hallo": "haˈloː", "welt": "vɛlt"}
    register_ipa_g2p("de", lambda w: lex.get(w, w))
    tp = XvaTextProcessor("de")
    ids = tp.text_to_sequence("Hallo Welt")
    assert ids.dtype == np.int32 and len(ids) > 4
    syms = xva_symbols()
    decoded = [syms[i] for i in ids]
    assert "V" in decoded and "L" in decoded  # welt → V EH L T
