"""Dataset-prep panels: /prepText, /cleanData, /checkTextQuality
(reference javascript/tools.js:788-1008)."""
import asyncio
import os
import logging

import numpy as np

from xva_trainer_tpu.app import AppServer
from xva_trainer_tpu.data import save_wav
from xva_trainer_tpu.tools.text_tools import TranscribeTool


def run(coro):
    return asyncio.new_event_loop().run_until_complete(coro)


def _server():
    lg = logging.getLogger("test_quiet_prep")
    lg.addHandler(logging.NullHandler())
    lg.propagate = False
    return AppServer(logger=lg)


def _make_ds(tmp_path, names=("a", "b", "c")):
    ds = tmp_path / "ds"
    (ds / "wavs").mkdir(parents=True)
    for n in names:
        save_wav(str(ds / "wavs" / f"{n}.wav"), np.zeros(2205, np.float32))
    return ds


def test_prep_text_filters(tmp_path):
    """Backup + blank filter + bad-char filter + duplicate removal, and the
    name|text|text rewrite (tools.js:795-875)."""
    server = _server()
    ds = _make_ds(tmp_path)
    (ds / "metadata.csv").write_text(
        "a.wav|good line\nb.wav|\nc.wav|has a ~tilde\na.wav|dup of a\n")
    out = run(server.handle_http("/prepText", {
        "path": str(ds), "backup": True, "filter_blanks": True,
        "filter_chars": "~,#", "remove_duplicates": True,
    }))
    assert out["ok"] and out["kept"] == 0 and out["removed"] == 4
    # a removed as duplicate (BOTH occurrences), b blank, c bad char
    assert (ds / "metadata.csv").read_text() == ""
    backup = (ds / "metadata_backup.csv").read_text()
    assert "c.wav|has a ~tilde" in backup

    # no dedup, no char filter: keeps a (twice) and c in |text|text form
    (ds / "metadata.csv").write_text(
        "a.wav|good line\nb.wav|\nc.wav|has a ~tilde\na.wav|dup of a\n")
    out = run(server.handle_http("/prepText", {
        "path": str(ds), "backup": False, "filter_blanks": True,
        "remove_duplicates": False,
    }))
    assert out == {"ok": True, "kept": 3, "removed": 1}
    rows = (ds / "metadata.csv").read_text().split("\n")
    assert rows[0] == "a.wav|good line|good line"


def test_clean_data(tmp_path):
    """Lines whose wav is missing go; wavs not in the metadata go
    (tools.js:973-1008)."""
    server = _server()
    ds = _make_ds(tmp_path, names=("a", "stray"))
    (ds / "metadata.csv").write_text("a.wav|kept\nmissing.wav|dropped\n")
    out = run(server.handle_http("/cleanData", {"path": str(ds)}))
    assert out == {"ok": True, "removed_lines": 1, "removed_wavs": 1}
    assert (ds / "metadata.csv").read_text().strip() == "a.wav|kept"
    assert (ds / "wavs" / "a.wav").exists()
    assert not (ds / "wavs" / "stray.wav").exists()


def test_check_text_quality_pipeline(tmp_path):
    """Fresh ASR pass + WER report lands where the explorer's WER column
    reads it (tools.js:883-967)."""
    server = _server()
    ds = _make_ds(tmp_path, names=("a", "b"))
    (ds / "metadata.csv").write_text("a.wav|asr text\nb.wav|totally different\n")

    TranscribeTool.set_asr_backend(lambda wav16k: "asr text")
    try:
        async def go():
            out = await server.handle_http("/checkTextQuality",
                                           {"path": str(ds)})
            assert out["ok"]
            await server._tq_task
            return await server.handle_http("/textQualityStatus",
                                            {"path": str(ds)})
        status = run(go())
    finally:
        TranscribeTool._asr_backend = None

    assert status["running"] is False and "error" not in status
    assert status["n_scored"] == 2
    assert status["mean_wer"] > 0  # b.wav mismatch gives a non-zero mean
    report = (ds / "wer_report.txt").read_text()
    assert "a" in report and "b" in report
    # a matches exactly -> 0 WER line present
    assert any(ln.startswith("0.000") for ln in report.splitlines())

    # the explorer payload picks the WER column up from wer_report.txt
    info = server._dataset_info(str(ds))
    by_name = {it["name"]: it for it in info["items"]}
    assert by_name["a.wav"]["wer"] == 0.0
    assert by_name["b.wav"]["wer"] > 0


def test_list_datasets(tmp_path):
    """Dataset browser payload (reference script.js:226-233): dirs with a
    metadata.csv or wavs/ folder only, with record counts."""
    server = _server()
    root = tmp_path / "datasets"
    root.mkdir()
    a = root / "voice_a"
    (a / "wavs").mkdir(parents=True)
    (a / "metadata.csv").write_text("x.wav|one\ny.wav|two\n")
    (root / "voice_b" / "wavs").mkdir(parents=True)   # wavs, no metadata
    (root / "not_a_dataset").mkdir()                  # neither -> excluded
    (root / "stray.txt").write_text("file, not dir")

    out = run(server.handle_http("/listDatasets", {"path": str(root)}))
    got = {d["name"]: d for d in out["datasets"]}
    assert set(got) == {"voice_a", "voice_b"}
    assert got["voice_a"]["records"] == 2
    assert got["voice_b"]["records"] == 0
    assert got["voice_a"]["path"] == str(a)

    # falls back to the app-settings datasets path
    server.app_settings["datasets_path"] = str(root)
    out = run(server.handle_http("/listDatasets", {}))
    assert {d["name"] for d in out["datasets"]} == {"voice_a", "voice_b"}


def test_noise_profile_recording_denoise(tmp_path, monkeypatch):
    """Mic noise removal (reference sox noisered pipe, script.js:1074-1090):
    a saved noise profile + the record_noise_removal setting attenuates a
    stationary tone in subsequent recordings."""
    import io

    from scipy.io import wavfile

    monkeypatch.chdir(tmp_path)
    server = _server()
    ds = tmp_path / "ds"
    (ds / "wavs").mkdir(parents=True)

    def wav_bytes(y):
        buf = io.BytesIO()
        wavfile.write(buf, 22050, (y * 32767).astype(np.int16))
        return buf.getvalue()

    t = np.arange(22050) / 22050.0
    noise = 0.2 * np.sin(2 * np.pi * 3000 * t).astype(np.float32)
    speechy = (0.5 * np.sin(2 * np.pi * 220 * t) + noise).astype(np.float32)

    r = server.save_noise_profile(wav_bytes(noise))
    assert r["ok"] and os.path.exists(tmp_path / "noise_profile.wav")

    server.app_settings["record_noise_removal"] = True
    server.app_settings["noise_removal_strength"] = 0.5
    r = server.save_recording(str(ds), "rec1.wav", wav_bytes(speechy))
    assert r["ok"]
    _, cleaned = wavfile.read(ds / "wavs" / "rec1.wav")
    cleaned = cleaned.astype(np.float32) / 32767.0

    def band_power(y, f):
        spec = np.abs(np.fft.rfft(y))
        k = int(f * len(y) / 22050)
        return spec[k - 3:k + 4].max()

    # the 3 kHz noise band drops by >6 dB; the 220 Hz "speech" keeps >50%
    assert band_power(cleaned, 3000) < 0.5 * band_power(speechy, 3000)
    assert band_power(cleaned, 220) > 0.5 * band_power(speechy, 220)

    # setting off -> recording stored untouched
    server.app_settings["record_noise_removal"] = False
    server.save_recording(str(ds), "rec2.wav", wav_bytes(speechy))
    _, raw = wavfile.read(ds / "wavs" / "rec2.wav")
    raw = raw.astype(np.float32) / 32767.0
    assert band_power(raw, 3000) > 0.9 * band_power(speechy, 3000)


def test_app_settings_reset(tmp_path, monkeypatch):
    """Reset-to-defaults (reference reset_settings_btn,
    settingsMenu.js:147-156)."""
    monkeypatch.chdir(tmp_path)
    server = _server()
    run(server.handle_http("/appSettings", {"set": {
        "pagination_size": 7, "theme": "light"}}))
    assert server.app_settings["pagination_size"] == 7
    out = run(server.handle_http("/appSettings", {"reset": True}))
    assert out["settings"]["pagination_size"] == 100
    assert out["settings"]["theme"] == "dark"
