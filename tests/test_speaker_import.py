"""speaker_rep.pt import parity for the ResNet34-SE H/ASP speaker encoder.

The reference frontend uses torchaudio (absent here), so parity splits:
- ResNet+ASP trunk: reference model with use_torch_spec=False vs flax with a
  precomputed spectrogram — exact parity on the same input.
- Mel frontend: our jax implementation vs a torch.stft replication of
  torchaudio.MelSpectrogram's documented semantics (center reflect, hamming
  400/512, hop 160, power 2, HTK mel, no norm).
"""

import pytest

pytestmark = pytest.mark.slow  # full-size/e2e tier: run via `make test-all`
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from xva_trainer_tpu.interop.pretrained import load_speaker_encoder
from xva_trainer_tpu.models.speaker_encoder.model import (
    ResNetSpeakerEncoder,
    spk_mel_spectrogram,
)

from ref_loader import install_stubs, load_ref_module


@pytest.fixture(scope="module")
def ref_encoder():
    install_stubs()
    import importlib.machinery
    import sys
    import types

    # torchaudio stub: the module must import; use_torch_spec=False avoids
    # instantiating MelSpectrogram in the trunk-parity path. The stub is
    # removed again at teardown — a spec-less module left in sys.modules
    # breaks transformers' torchaudio availability probe in later test files
    # (ValueError: torchaudio.__spec__ is None).
    added = []
    if "torchaudio" not in sys.modules:
        ta = types.ModuleType("torchaudio")
        tr = types.ModuleType("torchaudio.transforms")

        class _Mel:
            def __init__(self, **kw):
                pass

        tr.MelSpectrogram = _Mel
        ta.transforms = tr
        for name, mod_ in (("torchaudio", ta), ("torchaudio.transforms", tr)):
            mod_.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
            sys.modules[name] = mod_
            added.append(name)
    mod = load_ref_module("xvapitch/speaker_representation/main.py",
                          "ref_speaker_main")
    torch.manual_seed(0)
    m = mod.ResNetSpeakerEncoder(use_torch_spec=False)
    m.eval()
    yield m
    for name in added:
        sys.modules.pop(name, None)


def test_trunk_parity(ref_encoder, tmp_path):
    path = os.path.join(tmp_path, "speaker_rep.pt")
    torch.save({"model": ref_encoder.state_dict()}, path)
    variables = load_speaker_encoder(path)

    rng = np.random.default_rng(0)
    # reference trunk input: raw mel power spectrogram (B, 64, T)
    spec = (rng.standard_normal((1, 64, 100)).astype(np.float32) ** 2) * 3.0
    with torch.no_grad():
        emb_t = ref_encoder(torch.from_numpy(spec[:, None]), l2_norm=True).numpy()
    m = ResNetSpeakerEncoder()
    emb_f = m.apply(variables, jnp.zeros((1, 16000)), l2_norm=True,
                    spectrogram=jnp.asarray(spec))
    np.testing.assert_allclose(np.asarray(emb_f), emb_t, atol=1e-3)


def test_frontend_matches_torchaudio_semantics():
    rng = np.random.default_rng(1)
    wav = (rng.standard_normal(16000) * 0.3).astype(np.float32)

    # torch replication of PreEmphasis + torchaudio.MelSpectrogram defaults
    x = torch.from_numpy(wav)[None]
    xp = torch.nn.functional.pad(x.unsqueeze(1), (1, 0), "reflect").squeeze(1)
    x = xp[:, 1:] - 0.97 * xp[:, :-1]
    window = torch.hamming_window(400, periodic=True)
    spec = torch.stft(
        x, n_fft=512, hop_length=160, win_length=400, window=window,
        center=True, pad_mode="reflect", return_complex=True,
    )
    power = spec.real**2 + spec.imag**2  # (1, 257, T)

    def hz_to_htk_mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def htk_mel_to_hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    all_freqs = np.linspace(0, 8000, 257)
    m_pts = np.linspace(hz_to_htk_mel(0.0), hz_to_htk_mel(8000.0), 64 + 2)
    f_pts = htk_mel_to_hz(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts[None, :] - all_freqs[:, None]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))  # (257, 64)
    mel_t = np.einsum("fm,bft->bmt", fb, power.numpy())

    mel_f = np.asarray(spk_mel_spectrogram(jnp.asarray(wav)[None]))
    assert mel_f.shape == mel_t.shape, (mel_f.shape, mel_t.shape)
    np.testing.assert_allclose(mel_f, mel_t, atol=2e-3)
