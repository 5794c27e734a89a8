"""Diarization quality harness: DER on synthetic mixtures with known turns
(VERDICT r1 #7 / r4 #7; reference behavior spec
speaker_diarization/model.py:44-107).

Measured with the random-init speaker encoder (2026-08-20, the
temporal-contrast-weighted fused embeddings + smallest-significant-eigengap
auto-k + Ward clustering rewrite in tools/diarize.py — full table in
scripts/der_table.py output / README):
2spk 0.025 · 3spk 0.041 · overlap+music 0.175 · reverb 0.058 · telephone
0.011 · noise@10dB 0.114 · reverb+noise 0.083 · 4spk 0.137 (4/4 found) ·
5spk 0.165 (5/5 found); false alarm 0.0 and confusion 0.0 everywhere.
Thresholds below carry ~2x margin. A pretrained speaker_rep checkpoint
(interop.speaker import) only improves the embeddings.
"""

import pytest

pytestmark = pytest.mark.slow  # full-size/e2e tier: run via `make test-all`
import numpy as np
import pytest

from xva_trainer_tpu.models.speaker_encoder import SpeakerEncoder
from xva_trainer_tpu.tools.der import der
from xva_trainer_tpu.tools.speaker_tools import diarize

SR = 22050
VOICES = {0: (118.0, 0.85), 1: (196.0, 0.6), 2: (285.0, 0.45)}


def _voice(f0, decay, t):
    y = np.zeros_like(t)
    for h in range(1, 10):
        y += (decay ** h) * np.sin(2 * np.pi * f0 * h * t + 0.1 * h)
    vib = 1.0 + 0.01 * np.sin(2 * np.pi * 5.0 * t)
    return 0.3 * y * vib / np.abs(y).max()


def build_mixture(spec, gap=0.4):
    total = sum(d for _, d in spec) + gap * len(spec) + 0.4
    y = np.zeros(int(SR * total), np.float32)
    turns, cur = [], 0.2
    for spk, dur in spec:
        t = np.arange(int(SR * dur)) / SR
        f0, dec = VOICES[spk]
        seg = _voice(f0, dec, t) * (0.6 + 0.4 * np.sin(2 * np.pi * 1.3 * t))
        a = int(cur * SR)
        y[a:a + len(seg)] += seg.astype(np.float32)
        turns.append({"start": cur, "end": cur + dur, "speaker": spk})
        cur += dur + gap
    return y, turns


def test_der_metric_identity_and_errors():
    ref = [{"start": 0.0, "end": 2.0, "speaker": 0},
           {"start": 3.0, "end": 5.0, "speaker": 1}]
    m = der(ref, ref)
    assert m["der"] == 0.0
    # hypothesis silent everywhere → everything missed
    m = der(ref, [])
    assert m["missed"] == pytest.approx(1.0)
    # wrong speaker everywhere → pure confusion (mapping can fix only one)
    hyp = [{"start": 0.0, "end": 2.0, "speaker": 9},
           {"start": 3.0, "end": 5.0, "speaker": 9}]
    m = der(ref, hyp)
    assert m["false_alarm"] == 0.0 and 0.3 < m["confusion"] <= 0.6
    # speaker ids are arbitrary labels: a consistent permutation is perfect
    hyp = [{"start": 0.0, "end": 2.0, "speaker": 7},
           {"start": 3.0, "end": 5.0, "speaker": 4}]
    assert der(ref, hyp)["der"] == 0.0


@pytest.fixture(scope="module")
def encoder():
    return SpeakerEncoder()


def test_diarize_three_speakers_auto(encoder):
    spec = [(0, 3.0), (1, 2.5), (0, 2.0), (2, 3.5), (1, 3.0), (2, 2.0),
            (0, 2.5)]
    y, ref = build_mixture(spec)
    hyp = diarize(y, SR, encoder)
    m = der(ref, hyp)
    assert m["der"] < 0.30, m
    assert m["missed"] < 0.08, m
    assert m["false_alarm"] < 0.08, m


def test_diarize_two_speakers_auto(encoder):
    spec = [(0, 3.0), (1, 3.0), (0, 2.5), (1, 2.0), (0, 2.0)]
    y, ref = build_mixture(spec)
    hyp = diarize(y, SR, encoder)
    m = der(ref, hyp)
    assert m["der"] < 0.40, m
    assert m["false_alarm"] < 0.08, m
    # detected turn count in the right ballpark (5 true turns)
    assert 3 <= len(hyp) <= 10


# ---- formant-synthesized pseudo-speech (VERDICT r3 missing #2) ----
# No real speech is redistributable from this build environment (zero
# egress); formant synthesis (tests/formant_speech.py) is the closest honest
# stand-in: glottal source + per-speaker vocal-tract resonances, breaths
# between turns, overlapped speech, and a tonal music bed — the artifacts
# that actually break energy-VAD + embedding clustering on real recordings.


def test_diarize_formant_speech_with_breaths(encoder):
    from formant_speech import build_conversation

    spec = [(0, 3.0), (1, 2.5), (0, 2.5), (1, 3.0), (0, 2.0), (1, 2.5)]
    y, ref = build_conversation(spec, with_breaths=True, seed=1)
    hyp = diarize(y, SR, encoder)
    m = der(ref, hyp)
    assert m["der"] <= 0.25, m
    # breaths must not be labeled speech wholesale
    assert m["false_alarm"] < 0.10, m


def test_diarize_formant_speech_overlap_and_music(encoder):
    """Overlapped turns + a quiet music bed: DER counts overlap windows as
    double-speech, so the bar is looser; the false-alarm bar still binds
    (music must not become phantom speakers)."""
    from formant_speech import build_conversation

    spec = [(0, 3.0), (1, 3.0), (0, 2.5), (1, 2.5), (0, 2.5)]
    y, ref = build_conversation(spec, overlap_pairs=(1,), music_level=0.015,
                                with_breaths=True, seed=2)
    hyp = diarize(y, SR, encoder)
    m = der(ref, hyp)
    assert m["der"] <= 0.35, m
    assert m["false_alarm"] < 0.12, m


# ---- round-5 stress tier (VERDICT r4 #7): reverb, channel/bandwidth
# mismatch, additive noise, 4-5 speakers. Measured DERs in the module
# docstring; every bar below is >= 1.8x the measurement.


FOUR = [(0, 3.0), (1, 2.5), (2, 3.0), (3, 2.5), (0, 2.0), (2, 2.5),
        (1, 3.0), (3, 2.0)]
TWO = [(0, 3.0), (1, 2.5), (0, 2.5), (1, 3.0), (0, 2.0), (1, 2.5)]
THREE = [(0, 3.0), (1, 2.5), (0, 2.0), (2, 3.5), (1, 3.0), (2, 2.0),
         (0, 2.5)]


def _run(encoder, spec, **kw):
    from formant_speech import build_conversation

    y, ref = build_conversation(spec, with_breaths=True, **kw)
    hyp = diarize(y, SR, encoder)
    return der(ref, hyp), len({t["speaker"] for t in hyp}), \
        len({t["speaker"] for t in ref})


def test_diarize_reverb(encoder):
    """Synthetic-RIR reverb (rt60 0.4, 50% wet): decay tails smear turn
    boundaries — the classic energy-VAD killer (measured 0.058)."""
    m, k, ktrue = _run(encoder, TWO, seed=4, rt60=0.4)
    assert m["der"] <= 0.20, m
    assert m["false_alarm"] < 0.10, m


def test_diarize_telephone_channel(encoder):
    """300-3400 Hz bandpass + saturation: bandwidth mismatch vs the
    features' design assumptions (measured 0.011)."""
    m, k, ktrue = _run(encoder, TWO, seed=5, channel="tel")
    assert m["der"] <= 0.15, m
    assert k == ktrue, (k, ktrue)


def test_diarize_additive_noise(encoder):
    """Pink noise at 10 dB SNR raises the VAD floor (measured 0.114)."""
    m, k, ktrue = _run(encoder, TWO, seed=6, snr_db=10.0)
    assert m["der"] <= 0.28, m
    assert m["false_alarm"] < 0.10, m


def test_diarize_reverb_plus_noise(encoder):
    """Reverb AND noise together, 3 speakers (measured 0.083)."""
    m, k, ktrue = _run(encoder, THREE, seed=7, rt60=0.3, snr_db=15.0)
    assert m["der"] <= 0.25, m
    assert k == ktrue, (k, ktrue)


def test_diarize_four_speakers(encoder):
    """4 speakers incl. a deliberately close pair (f0 112 vs 95 Hz): the
    temporal-contrast weighting regression test — blind z-scored fusion
    measured 0.47 here, the weighted fusion 0.137 with 4/4 found."""
    m, k, ktrue = _run(encoder, FOUR, seed=8)
    assert m["der"] <= 0.28, m
    assert k == 4, k


def test_diarize_five_speakers(encoder):
    """5 speakers, two close pairs (measured 0.165, 5/5 found)."""
    m, k, ktrue = _run(encoder, FOUR + [(4, 3.0), (0, 2.0), (4, 2.5)],
                       seed=9)
    assert m["der"] <= 0.30, m
    assert k >= 4, k
