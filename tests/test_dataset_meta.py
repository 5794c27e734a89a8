"""Dataset metadata / lifecycle endpoints + the model-export flow
(reference javascript/script.js:1185-1331 and javascript/train.js:870-941)."""
import asyncio
import json
import logging
import os

import numpy as np

from xva_trainer_tpu.app import AppServer
from xva_trainer_tpu.data import save_wav


def run(coro):
    return asyncio.new_event_loop().run_until_complete(coro)


def _server():
    lg = logging.getLogger("test_quiet_meta")
    lg.addHandler(logging.NullHandler())
    lg.propagate = False
    return AppServer(logger=lg)


def test_compose_voice_id():
    assert AppServer._compose_voice_id("SK", "Ulfric Storm") == "sk_ulfric_storm"
    assert AppServer._compose_voice_id("", "Solo") == "solo"


def test_dataset_metadata_roundtrip(tmp_path):
    server = _server()
    ds = tmp_path / "sk_maleeventoned"
    ds.mkdir()
    out = run(server.handle_http("/datasetMetadata", {
        "path": str(ds),
        "set": {"voiceName": "Male Even Toned", "gameId": "Skyrim",
                "gameIdCode": "sk", "voiceId": "sk_maleeventoned",
                "lang": "EN", "author": "me", "license": "cc",
                "gender": "male", "modelVersion": "3.0"},
    }))
    m = out["metadata"]
    # reference schema: script.js:1229-1244
    assert m["version"] == "3.0" and m["modelType"] == "xVAPitch"
    assert m["lang"] == "en" and m["author"] == "me"
    assert m["games"][0]["gameId"] == "skyrim"
    assert m["games"][0]["voiceId"] == "sk_maleeventoned"
    assert m["games"][0]["gender"] == "male"
    on_disk = json.loads((ds / "dataset_metadata.json").read_text())
    assert on_disk == m
    # read-only call returns the same metadata
    out2 = run(server.handle_http("/datasetMetadata", {"path": str(ds)}))
    assert out2["metadata"] == m and out2["exists"]


def test_new_and_delete_dataset(tmp_path):
    server = _server()
    out = run(server.handle_http("/newDataset", {
        "datasets_root": str(tmp_path), "gameIdCode": "fo4",
        "voiceId": "piper", "voiceName": "Piper", "gender": "female",
    }))
    assert out["ok"] and out["voiceId"] == "fo4_piper"
    ds = tmp_path / "fo4_piper"
    assert (ds / "wavs").is_dir() and (ds / "metadata.csv").exists()
    meta = json.loads((ds / "dataset_metadata.json").read_text())
    assert meta["games"][0]["voiceName"] == "Piper"
    # duplicate creation is refused
    again = run(server.handle_http("/newDataset", {
        "datasets_root": str(tmp_path), "gameIdCode": "fo4",
        "voiceId": "piper"}))
    assert not again["ok"]
    # deleting a non-dataset dir is refused
    plain = tmp_path / "not_a_dataset"
    plain.mkdir()
    refuse = run(server.handle_http("/deleteDataset", {"path": str(plain)}))
    assert not refuse["ok"] and plain.exists()
    gone = run(server.handle_http("/deleteDataset", {"path": str(ds)}))
    assert gone["ok"] and not ds.exists()


def test_remove_duplicates(tmp_path):
    server = _server()
    ds = tmp_path / "ds"
    (ds / "wavs").mkdir(parents=True)
    y = np.zeros(2205, np.float32)
    for n in ("a", "b", "c"):
        save_wav(str(ds / "wavs" / f"{n}.wav"), y)
    # 'a' appears twice -> BOTH its lines and its wav go (script.js:1268-1305)
    (ds / "metadata.csv").write_text(
        "a.wav|first copy\nb.wav|keep me\na.wav|second copy\nc.wav|and me\n")
    out = run(server.handle_http("/removeDuplicates", {"path": str(ds)}))
    assert out == {"ok": True, "removed_lines": 2, "removed_wavs": 1}
    kept = (ds / "metadata.csv").read_text().strip().split("\n")
    assert kept == ["b.wav|keep me", "c.wav|and me"]
    assert not (ds / "wavs" / "a.wav").exists()
    assert (ds / "wavs" / "b.wav").exists()


def test_export_voice_merges_dataset_metadata(tmp_path):
    """The export must overlay dataset_metadata.json onto the training JSON
    and rename the artifacts to the final voiceId (train.js:893-913)."""
    server = _server()
    ds = tmp_path / "myvoice"
    ds.mkdir()
    run(server.handle_http("/datasetMetadata", {
        "path": str(ds),
        "set": {"voiceName": "My Voice", "gameId": "skyrim",
                "voiceId": "sk_myvoice", "lang": "de", "author": "aa",
                "license": "mit", "gender": "female"},
    }))
    tdir = tmp_path / "ckpts"
    tdir.mkdir()
    (tdir / "myvoice.pt").write_bytes(b"\x00fake-model-bytes")
    (tdir / "myvoice.json").write_text(json.dumps({
        "version": "3.0", "games": [{"base_speaker_emb": [0.1] * 4,
                                     "voiceId": "myvoice"}]}))
    out_dir = tmp_path / "exported"
    out = run(server.handle_http("/exportVoice", {
        "dataset_path": str(ds), "training_dir": str(tdir),
        "out_dir": str(out_dir), "preview": False,
    }))
    assert out["ok"] and out["voiceId"] == "sk_myvoice"
    assert (out_dir / "sk_myvoice.pt").read_bytes() == b"\x00fake-model-bytes"
    merged = json.loads((out_dir / "sk_myvoice.json").read_text())
    assert merged["author"] == "aa" and merged["lang"] == "de"
    assert merged["games"][0]["voiceId"] == "sk_myvoice"
    assert merged["games"][0]["gender"] == "female"
    assert merged["games"][0]["base_speaker_emb"] == [0.1] * 4  # preserved
    # missing checkpoint -> helpful error
    bad = run(server.handle_http("/exportVoice", {
        "dataset_path": str(tmp_path / "other"), "training_dir": str(tdir),
        "out_dir": str(out_dir), "preview": False}))
    assert not bad["ok"] and "trained" in bad["error"]


def test_ui_has_dataset_meta_surface():
    from xva_trainer_tpu.app.server import _ui_html

    html = _ui_html()
    for frag in ("dmVoiceName", "searchName", "%duplicates%", "exportVoice",
                 "removeDuplicates", "newDataset", "deleteDataset"):
        assert frag in html, frag
