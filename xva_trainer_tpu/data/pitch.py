"""Host-side f0 estimation (YIN with CMNDF + parabolic interpolation).

The reference extracts f0 with librosa.pyin (fmin=C2≈65.4Hz, fmax=C7≈2093Hz,
frame_length=1024 → hop 256; reference
python/fastpitch1_1/fastpitch/data_function.py:136-146) or praat, on the host
per item, and normalizes by dataset mean/std leaving unvoiced frames at 0
(normalize_pitch:165-170). librosa isn't available here; this is a YIN
implementation producing f0 on the same frame grid with unvoiced→0, which the
trainer normalizes identically. Runs once per utterance into the feature
cache — never in the train-step path (SURVEY.md §7 hard part 5).
"""
from __future__ import annotations

import numpy as np

FMIN = 65.40639  # C2
FMAX = 2093.0045  # C7


def yin_f0(
    y: np.ndarray,
    sr: int = 22050,
    frame_length: int = 1024,
    hop_length: int = 256,
    fmin: float = FMIN,
    fmax: float = FMAX,
    threshold: float = 0.15,
    use_native: bool = True,
) -> np.ndarray:
    """f0 per frame (Hz), 0 where unvoiced. Output length = 1 + len(y)//hop.

    Dispatches to the C++ implementation (native.yin_f0) when built."""
    if use_native:
        from .. import native

        if native.available():
            out = native.yin_f0(y, sr, frame_length, hop_length, fmin, fmax,
                                threshold)
            if out is not None:
                return out
    # center-pad like librosa (frames centered on y[t*hop])
    pad = frame_length // 2
    y = np.pad(y.astype(np.float64), (pad, pad), mode="reflect")
    n_frames = 1 + (len(y) - frame_length) // hop_length
    tau_min = max(2, int(sr / fmax))
    tau_max = min(frame_length - 1, int(sr / fmin))

    idx = np.arange(n_frames)[:, None] * hop_length + np.arange(frame_length)[None, :]
    frames = y[idx]  # (N, frame)

    # Difference function via autocorrelation (Wiener–Khinchin):
    # d(tau) = r(0) + r_tau(0) - 2*acf(tau), computed for all frames at once.
    W = frame_length
    fft_size = 2 * W
    spec = np.fft.rfft(frames, fft_size, axis=1)
    acf = np.fft.irfft(spec * np.conj(spec), fft_size, axis=1)[:, : tau_max + 1]
    # cumulative energy terms
    sq = frames**2
    cumsq = np.concatenate(
        [np.zeros((n_frames, 1)), np.cumsum(sq, axis=1)], axis=1
    )  # (N, W+1)
    r0 = cumsq[:, W][:, None]  # total energy
    taus = np.arange(tau_max + 1)
    # energy of y[tau:W] and y[0:W-tau]
    e_head = cumsq[:, W] [:, None] - cumsq[:, taus]      # sum_{tau..W}
    e_tail = cumsq[:, W - taus]                           # sum_{0..W-tau}
    d = e_head + e_tail - 2.0 * acf  # (N, tau_max+1)
    d = np.maximum(d, 0.0)

    # Cumulative-mean-normalized difference
    cum = np.cumsum(d[:, 1:], axis=1)
    cmndf = np.ones_like(d)
    cmndf[:, 1:] = d[:, 1:] * taus[1:] / np.maximum(cum, 1e-12)

    # First LOCAL MINIMUM below threshold in [tau_min, tau_max], else global
    # min (canonical YIN step 4: descend past the threshold crossing).
    band = cmndf[:, tau_min : tau_max + 1]
    nxt = np.concatenate([band[:, 1:], np.full((n_frames, 1), np.inf)], axis=1)
    cand = (band < threshold) & (band <= nxt)
    first = np.where(cand.any(axis=1), cand.argmax(axis=1), band.argmin(axis=1))
    tau = first + tau_min

    # Parabolic interpolation around tau
    t0 = np.clip(tau - 1, 0, tau_max)
    t2 = np.clip(tau + 1, 0, tau_max)
    ar = np.arange(n_frames)
    d0, d1, d2 = cmndf[ar, t0], cmndf[ar, tau], cmndf[ar, t2]
    denom = 2.0 * (2.0 * d1 - d0 - d2)
    shift = np.where(np.abs(denom) > 1e-12, (d2 - d0) / np.maximum(np.abs(denom), 1e-12), 0.0)
    shift = np.clip(shift * np.sign(denom), -0.5, 0.5)
    tau_f = tau + shift

    f0 = sr / np.maximum(tau_f, 1e-6)
    voiced = (cmndf[ar, tau] < threshold) & (f0 >= fmin) & (f0 <= fmax)
    # low-energy frames are unvoiced
    energy = r0[:, 0] / W
    voiced &= energy > 1e-6
    return np.where(voiced, f0, 0.0).astype(np.float32)


def normalize_pitch(pitch: np.ndarray, mean: float, std: float) -> np.ndarray:
    """(p - mean)/std with unvoiced zeros preserved (reference :165-170)."""
    out = (pitch - mean) / max(std, 1e-8)
    out[pitch == 0.0] = 0.0
    return out.astype(np.float32)
