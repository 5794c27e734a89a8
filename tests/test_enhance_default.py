"""Default enhancement checkpoint: learned-by-default + objective SNR gain
(VERDICT r1 #6; reference bar audio_source_separation/model.py:16-42)."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from xva_trainer_tpu.models.enhance.model import (
    SpeechEnhancer,
    load_params_npz,
    si_sdr,
)
from xva_trainer_tpu.models.enhance.synth import SR, make_pair
from xva_trainer_tpu.tools.text_tools import (
    SourceSeparationTool,
    default_enhancer_path,
)

WEIGHTS = default_enhancer_path()
pytestmark = pytest.mark.skipif(
    not os.path.exists(WEIGHTS),
    reason="assets/enhancer_default.npz not built "
           "(scripts/train_default_enhancer.py)",
)


def test_default_weights_shipped_and_small():
    assert os.path.getsize(WEIGHTS) < 10e6  # fp16 npz, committable


def test_ass_tool_is_learned_by_default(monkeypatch):
    monkeypatch.delenv("XVA_ASS_CKPT", raising=False)
    SourceSeparationTool._model_backend = None
    tool = SourceSeparationTool.__new__(SourceSeparationTool)
    backend = tool._load_learned(None)
    assert backend is not None, "ass should load the committed weights"
    SourceSeparationTool._model_backend = None


def test_si_sdr_gain_beats_spectral_gate():
    """Committed weights must beat both the noisy input and the DSP
    spectral-gate fallback on held-out synthetic noisy speech.
    (Training eval 2026-08-17: mean gain +14.5 dB; gate is typically +1-3 dB.)
    """
    enh = SpeechEnhancer(load_params_npz(WEIGHTS))
    rng = np.random.default_rng(777)
    gains_model, gains_gate = [], []
    for _ in range(3):
        noisy, clean = make_pair(3.0, 5.0, rng)
        est = enh.enhance(noisy)
        gate = SourceSeparationTool._spectral_gate(noisy)
        L = min(len(est), len(clean), len(gate))
        base = float(si_sdr(jnp.asarray(noisy[:L]), jnp.asarray(clean[:L])))
        gains_model.append(
            float(si_sdr(jnp.asarray(est[:L]), jnp.asarray(clean[:L]))) - base)
        gains_gate.append(
            float(si_sdr(jnp.asarray(gate[:L]), jnp.asarray(clean[:L]))) - base)
    assert np.mean(gains_model) > 6.0, (gains_model, gains_gate)
    assert np.mean(gains_model) > np.mean(gains_gate) + 2.0, (
        gains_model, gains_gate)
