"""Test-only loader for the reference PyTorch modules at /root/reference.

Used exclusively to verify torch->flax checkpoint-import parity: we
instantiate the reference nn.Modules, pull their ``state_dict()`` (the exact
artifact format xVASynth consumes), and compare forward passes against the
flax models. The reference tree is read-only and is never imported by the
package itself.

Several reference imports (numba, librosa, eSpeak-backed text deps) are not
in this image; they are stubbed here — none of the stubs are on the compute
path being verified.
"""
from __future__ import annotations

import importlib.machinery
import importlib.util
import re
import os
import sys
import types
import warnings

REF = "/root/reference/python"


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    m = types.ModuleType(name)
    # a real ModuleSpec so importlib.util.find_spec (e.g. transformers'
    # dependency probing) doesn't choke on __spec__ is None
    m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def _fake_jit(*a, **k):
    if a and callable(a[0]):
        return a[0]
    return lambda f: f


def install_stubs():
    import numpy as _np

    def _pad_center(data, size=None, axis=-1, **kw):
        size = size if size is not None else kw.get("size")
        n = data.shape[axis]
        lpad = (size - n) // 2
        widths = [(0, 0)] * data.ndim
        widths[axis] = (lpad, size - n - lpad)
        return _np.pad(data, widths)

    def _normalize(S, norm=_np.inf, axis=0, **kw):
        mag = _np.abs(S).astype(float)
        length = mag.max(axis=axis, keepdims=True)
        length[length == 0] = 1.0
        return S / length

    _stub("numba", jit=_fake_jit, prange=range)
    lu = _stub("librosa.util", pad_center=_pad_center, normalize=_normalize,
               tiny=lambda x: _np.finfo(float).tiny)
    lf = _stub("librosa.filters")
    # real Slaney mel filterbank from our DSP core — the reference's
    # TacotronSTFT calls librosa.filters.mel at module init
    from xva_trainer_tpu.ops.mel import mel_filterbank

    lf.mel = lambda sr=22050, n_fft=1024, n_mels=80, fmin=0.0, fmax=8000.0, **kw: (
        mel_filterbank(sr, n_fft, n_mels, fmin, fmax)
    )
    lib = _stub("librosa", util=lu, filters=lf)
    lib.__path__ = []  # mark as package so `librosa.filters` imports resolve
    _stub("unidecode", unidecode=lambda s: s)
    _stub("g2pc", G2pC=object)

    class _H2p:
        def __init__(self, *a, **kw):
            pass

        def replace_het(self, text):
            return text

    _stub("h2p_parser")
    _stub("h2p_parser.h2p", H2p=_H2p)
    _stub("num2words", num2words=lambda *a, **k: "")
    _stub("pykakasi", kakasi=object)
    _stub("epitran", Epitran=object)
    _stub("nltk", download=lambda *a, **k: None)
    _stub("nltk.tokenize", word_tokenize=lambda s: s.split())

    # inflect replica backed by our self-contained number wording, so the
    # reference pipeline produces real (comparable) number expansions
    from xva_trainer_tpu.data.text import en_numbers_v3 as _env3

    class _Engine:
        def number_to_words(self, n, andword="", zero="zero", group=0, **kw):
            s = str(n).strip()
            if re.match(r"^[0-9,]+(st|nd|rd|th)$", s):
                return _env3.ordinal_words(int(re.sub(r"[a-z,]", "", s)))
            return _env3.number_to_words(s, zero=zero, group=group)

        def __getattr__(self, k):
            return lambda *a, **kk: ""

    _stub("inflect", engine=lambda: _Engine())


_cache = {}


def load_ref_module(rel_path: str, name: str):
    """Load a reference python file as a module (with stubs installed)."""
    key = (rel_path, name)
    if key in _cache:
        return _cache[key]
    install_stubs()
    own_dir = os.path.dirname(f"{REF}/{rel_path}")
    path_dirs = [own_dir, f"{REF}/xvapitch", f"{REF}/xvapitch/text"]
    added = [d for d in path_dirs if d not in sys.path]
    sys.path[:0] = added
    warnings.filterwarnings("ignore", category=SyntaxWarning)
    try:
        spec = importlib.util.spec_from_file_location(name, f"{REF}/{rel_path}")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
    finally:
        for d in added:
            sys.path.remove(d)
    _cache[key] = mod
    return mod


class XvapArgs:
    """The app-parity xVAPitch args (reference xva_train.py:1086-1133 defaults
    with the inference overrides at :1422-1426)."""

    def __init__(self, **overrides):
        self.pitch = 1
        self.energy = 0
        self.hifi_only = 0
        self.pe_scaling = 0.1
        self.mltts_rc = 0
        self.mltts_rc_rev = 0
        self.lang_w = 1
        self.big = 1
        self.flc = 0
        self.frozen_vocoder_langs = 0
        self.fp_emels = 0
        self.ow_flow = 0
        self.expanded_flow = 0
        self.expanded_flow_dim = 32
        self.vocoder = 0
        self.debug = 0
        for k, v in overrides.items():
            setattr(self, k, v)


def ref_xvapitch(**overrides):
    """Instantiate the reference xVAPitch model on CPU in eval mode."""
    m = load_ref_module("xvapitch/model.py", "ref_xvap_model")
    model = m.xVAPitch(XvapArgs(**overrides))
    model.eval()
    return model
