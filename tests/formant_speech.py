"""Formant-synthesized pseudo-speech for the diarization DER harness.

This build environment has zero network egress and ships no redistributable
real speech, so the closest honest stand-in is classic source-filter (Klatt
style) synthesis: a glottal pulse train with jitter/shimmer driving a cascade
of per-speaker formant resonators, syllable-rate amplitude modulation,
unvoiced fricative bursts, breath noises, and an optional low-level music
bed. Unlike pure harmonic tones, this produces the artifacts that break
energy-VAD + embedding clustering on real recordings: spectrally speech-like
non-speech (breaths), overlapping speakers, and steady tonal interference.

The DER test built on this is a necessary-but-not-sufficient proxy for real
speech — `tools/der.py` accepts any externally labeled corpus for the real
thing (see its docstring for the RTTM-ish dict format).
"""
from __future__ import annotations

import numpy as np
from scipy.signal import lfilter

SR = 22050

# Per-speaker vocal profiles: f0 base + vocal-tract scale. Formant targets
# are scaled per speaker the way shorter/longer vocal tracts shift them.
SPEAKERS = {
    0: dict(f0=112.0, tract=1.00, breathy=0.02),   # low male-ish
    1: dict(f0=205.0, tract=1.18, breathy=0.05),   # higher female-ish
    2: dict(f0=150.0, tract=0.92, breathy=0.01),   # mid
    3: dict(f0=95.0, tract=1.06, breathy=0.03),    # deep male-ish
    4: dict(f0=232.0, tract=1.24, breathy=0.04),   # high female-ish
}

# (F1, F2, F3) vowel targets in Hz (schwa-adjacent set keeps it generic)
VOWELS = [
    (730, 1090, 2440),   # /a/
    (270, 2290, 3010),   # /i/
    (300, 870, 2240),    # /u/
    (530, 1840, 2480),   # /e/
    (570, 840, 2410),    # /o/
]


def _resonator(y: np.ndarray, freq: float, bw: float) -> np.ndarray:
    """Second-order IIR formant resonator (Klatt cascade element)."""
    r = np.exp(-np.pi * bw / SR)
    theta = 2 * np.pi * freq / SR
    a = [1.0, -2 * r * np.cos(theta), r * r]
    b = [1.0 - 2 * r * np.cos(theta) + r * r]
    return lfilter(b, a, y)


def _glottal_source(n: int, f0: float, rng, jitter=0.02, shimmer=0.1,
                    breathy=0.02) -> np.ndarray:
    """Pulse train at f0 with cycle-level jitter/shimmer + aspiration."""
    src = np.zeros(n, np.float64)
    pos = 0.0
    while pos < n:
        period = SR / (f0 * (1.0 + jitter * rng.standard_normal()))
        i = int(pos)
        if i < n:
            src[i] = 1.0 + shimmer * rng.standard_normal()
        pos += max(period, 8.0)
    # differentiated-pulse shaping: -6 dB/oct source spectrum
    src = lfilter([1.0], [1.0, -0.96], src)
    src += breathy * rng.standard_normal(n)
    return src


def utterance(spk: int, dur: float, seed: int = 0) -> np.ndarray:
    """One speaker's pseudo-speech utterance: syllable-rate vowel sequence
    with fricative bursts and micro-pauses."""
    rng = np.random.default_rng(seed * 1000 + spk)
    p = SPEAKERS[spk]
    n = int(SR * dur)
    out = np.zeros(n, np.float64)
    t = 0
    while t < n:
        syl = int(SR * rng.uniform(0.12, 0.28))
        end = min(t + syl, n)
        seg_n = end - t
        if rng.uniform() < 0.18:
            # unvoiced fricative: shaped noise, no glottal source
            noise = rng.standard_normal(seg_n)
            seg = _resonator(noise, 4500 / p["tract"], 1200) * 0.05
        else:
            f0 = p["f0"] * (1.0 + 0.08 * np.sin(2 * np.pi * rng.uniform(1, 3)
                                                * np.arange(seg_n) / SR)
                            + rng.uniform(-0.05, 0.05))
            src = _glottal_source(seg_n, float(np.mean(f0)), rng,
                                  breathy=p["breathy"])
            f1, f2, f3 = VOWELS[rng.integers(len(VOWELS))]
            seg = src
            for f, bw in ((f1, 60), (f2, 90), (f3, 130)):
                seg = _resonator(seg, f / p["tract"], bw)
        # syllable envelope with soft attack/decay
        env = np.hanning(max(seg_n, 2) * 2)[:seg_n] ** 0.5
        out[t:end] += seg * env
        t = end + int(SR * rng.uniform(0.0, 0.04))  # micro-pause
    peak = np.abs(out).max() or 1.0
    return (0.3 * out / peak).astype(np.float32)


def breath(dur: float, seed: int = 0) -> np.ndarray:
    """A breath: band-passed noise burst at low level — spectrally wide,
    the classic energy-VAD false alarm."""
    rng = np.random.default_rng(seed + 77)
    n = int(SR * dur)
    y = _resonator(rng.standard_normal(n), 900, 800)
    env = np.hanning(n)
    y = y * env
    return (0.04 * y / (np.abs(y).max() or 1.0)).astype(np.float32)


def music_bed(dur: float, level: float = 0.02) -> np.ndarray:
    """Steady sine chord — tonal interference under the whole mixture."""
    t = np.arange(int(SR * dur)) / SR
    y = sum(np.sin(2 * np.pi * f * t) for f in (220.0, 277.2, 329.6))
    return (level * y / 3.0).astype(np.float32)


def synthetic_rir(rt60: float = 0.4, dur: float = 0.35,
                  seed: int = 0) -> np.ndarray:
    """Synthetic room impulse response: direct path + exponentially decaying
    diffuse noise tail calibrated so the envelope hits -60 dB at rt60
    (the standard image-method surrogate under zero egress — no measured
    RIR corpora are shippable from this environment)."""
    rng = np.random.default_rng(seed + 31)
    n = int(SR * max(dur, rt60))
    t = np.arange(n) / SR
    h = rng.standard_normal(n) * np.exp(-6.9078 * t / rt60)
    h[: int(0.002 * SR)] = 0.0          # 2 ms pre-delay before reflections
    h *= 0.35
    h[0] = 1.0                          # direct path
    return (h / np.abs(h).max()).astype(np.float32)


def reverberate(y: np.ndarray, rt60: float = 0.4, wet: float = 0.5,
                seed: int = 0) -> np.ndarray:
    """Convolve with a synthetic RIR and mix wet/dry at equal peak level —
    the classic energy-VAD killer (decay tails smear turn boundaries)."""
    from scipy.signal import fftconvolve

    r = fftconvolve(y, synthetic_rir(rt60, seed=seed))[: len(y)]
    r *= (np.abs(y).max() or 1.0) / (np.abs(r).max() or 1.0)
    return ((1.0 - wet) * y + wet * r).astype(np.float32)


def telephone_channel(y: np.ndarray) -> np.ndarray:
    """Narrowband channel: 300-3400 Hz bandpass + soft saturation — the
    bandwidth-mismatch case (F3 and the fricative band are gone, so the
    encoder sees a spectrum unlike its training distribution)."""
    from scipy.signal import butter, sosfilt

    sos = butter(4, [300.0, 3400.0], btype="bandpass", fs=SR, output="sos")
    f = sosfilt(sos, y.astype(np.float64))
    f = np.tanh(2.5 * f) / 2.5
    peak = np.abs(f).max() or 1.0
    return (f * (np.abs(y).max() or 1.0) / peak).astype(np.float32)


def add_noise(y: np.ndarray, snr_db: float, seed: int = 0,
              pink: bool = True) -> np.ndarray:
    """Additive noise at a target SNR vs the signal's mean power; pink
    (1/f-ish) by default — broadband noise raises the energy-VAD floor."""
    rng = np.random.default_rng(seed + 13)
    noise = rng.standard_normal(len(y))
    if pink:
        noise = lfilter([0.06], [1.0, -0.94], noise)
    p_sig = float((y.astype(np.float64) ** 2).mean())
    p_noise = float((noise ** 2).mean()) or 1.0
    g = np.sqrt(p_sig / (p_noise * 10.0 ** (snr_db / 10.0)))
    return (y + g * noise).astype(np.float32)


def build_conversation(spec, gap=0.35, overlap_pairs=(), with_breaths=True,
                       music_level=0.0, seed=0, rt60=None, channel=None,
                       snr_db=None):
    """spec: [(spk, dur), ...] sequential turns. overlap_pairs: indices i
    where turn i+1 starts 0.5s BEFORE turn i ends (true overlapped speech).
    rt60: reverberate the final mixture (synthetic RIR). channel="tel":
    narrowband bandpass + saturation. snr_db: additive pink noise at that
    SNR. Returns (wav, turns) with ground-truth second-resolution labels."""
    total = sum(d for _, d in spec) + gap * len(spec) + 1.0
    y = np.zeros(int(SR * total), np.float32)
    turns, cur = [], 0.3
    for i, (spk, dur) in enumerate(spec):
        seg = utterance(spk, dur, seed=seed + i)
        a = int(cur * SR)
        y[a:a + len(seg)] += seg
        turns.append({"start": cur, "end": cur + dur, "speaker": spk})
        if with_breaths and i + 1 < len(spec):
            b = breath(0.3, seed=seed + i)
            bb = int((cur + dur + 0.02) * SR)
            y[bb:bb + len(b)] += b
        step = dur + gap
        if i in overlap_pairs:
            step -= 0.5 + gap  # next speaker comes in 0.5s early
        cur += step
    if music_level > 0:
        m = music_bed(total, music_level)
        y[: len(m)] += m
    if rt60:
        y = reverberate(y, rt60=rt60, seed=seed)
    if channel == "tel":
        y = telephone_channel(y)
    if snr_db is not None:
        y = add_noise(y, snr_db, seed=seed)
    return y, turns
