"""Native C++ host library vs the numpy reference implementations."""
import numpy as np
import pytest

from xva_trainer_tpu import native
from xva_trainer_tpu.data import save_wav, load_wav, resample as np_resample
from xva_trainer_tpu.data.pitch import yin_f0 as np_yin

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain"
)


def _tone(f=220.0, sec=1.0, sr=22050, amp=0.4):
    t = np.arange(int(sr * sec)) / sr
    return (amp * np.sin(2 * np.pi * f * t)).astype(np.float32)


def test_decode_wav(tmp_path):
    y = _tone()
    p = str(tmp_path / "t.wav")
    save_wav(p, y)
    out = native.decode_wav(p)
    assert out is not None
    y2, sr = out
    assert sr == 22050
    assert np.abs(y2 - y).max() < 1e-3


def test_resample_tone():
    y = _tone(440, 1.0, sr=44100)
    out = native.resample(y, 44100, 22050)
    assert out is not None
    assert abs(len(out) - 22050) <= 2
    # spectral peak still at 440 Hz
    spec = np.abs(np.fft.rfft(out * np.hanning(len(out))))
    peak_hz = spec.argmax() * 22050 / len(out)
    assert abs(peak_hz - 440) < 5
    # amplitude preserved within 1 dB
    assert abs(20 * np.log10(out.std() / y.std())) < 1.0


def test_yin_matches_numpy():
    for f in (110.0, 220.0, 440.0):
        y = _tone(f, 1.0)
        f0_c = native.yin_f0(y, 22050)
        voiced = f0_c[f0_c > 0]
        assert len(voiced) > 0.7 * len(f0_c)
        assert abs(np.median(voiced) - f) / f < 0.02
    # silence unvoiced
    f0 = native.yin_f0(np.zeros(22050, np.float32), 22050)
    assert (f0 == 0).all()


def test_find_silences():
    sr = 22050
    y = np.concatenate([_tone(440, 0.5), np.zeros(sr), _tone(220, 0.5)])
    regions = native.find_silences(y, sr, -40.0, 0.3)
    assert len(regions) == 1
    s, e = regions[0]
    assert abs(s / sr - 0.5) < 0.1 and abs(e / sr - 1.5) < 0.1


def test_native_loudness_parity():
    import numpy as np

    from xva_trainer_tpu import native
    from xva_trainer_tpu.ops import loudness as L

    if not native.available():
        import pytest

        pytest.skip("no compiler")
    sr = 22050
    t = np.arange(sr * 3) / sr
    y = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    a = native.integrated_loudness(y, sr)
    # numpy reference path (2-D input skips the native shortcut)
    b = L.integrated_loudness(y[:, None], sr)
    assert abs(a - b) < 1e-4
