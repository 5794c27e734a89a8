"""App server protocol tests: JSON task dispatch, tool events, HTTP endpoints."""
import asyncio
import json
import os

import numpy as np
import pytest

from xva_trainer_tpu.app import AppServer, ModelsManager
from xva_trainer_tpu.data import save_wav


class FakeWS:
    def __init__(self):
        self.sent = []

    async def send(self, msg):
        self.sent.append(json.loads(msg))


def run(coro):
    return asyncio.new_event_loop().run_until_complete(coro)


def test_models_manager_lazy_init():
    mm = ModelsManager()
    tool = run(mm.init_model("formatting"))
    assert tool is run(mm.init_model("formatting"))  # cached
    with pytest.raises(KeyError):
        mm.sync_init_model("nope")


def test_run_task_protocol(tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    y = (0.1 * np.sin(np.arange(22050) * 0.05)).astype(np.float32)
    save_wav(str(src / "a.wav"), y)
    server = AppServer(logger=_quiet_logger())
    ws = FakeWS()
    msg = json.dumps({
        "model": "formatting", "task": "runTask",
        "data": {"inPath": str(src), "outputDirectory": str(tmp_path / "out")},
    })
    run(server.handle_message(msg, ws))
    assert any(e["key"] == "tasks_next" for e in ws.sent)
    assert os.path.exists(tmp_path / "out" / "a.wav")


def test_debug_backdoors():
    """ws debug messages keyed on `model` (reference server.py:146-163)."""
    server = AppServer(logger=_quiet_logger())
    assert run(server.handle_message(
        json.dumps({"model": "print", "task": "", "data": "hello"}), FakeWS()
    )) == ""
    assert run(server.handle_message(
        json.dumps({"model": "print_and_return", "task": "", "data": "echo"}),
        FakeWS(),
    )) == "echo"


def test_error_event_on_bad_tool_input(tmp_path):
    server = AppServer(logger=_quiet_logger())
    ws = FakeWS()
    msg = json.dumps({
        "model": "formatting", "task": "runTask",
        "data": {"inPath": str(tmp_path / "missing_dir")},
    })
    run(server.handle_message(msg, ws))
    assert any(e["key"] == "tasks_error" for e in ws.sent)


def test_http_endpoints(tmp_path):
    server = AppServer(logger=_quiet_logger())
    out = run(server.handle_http("/checkReady", {}))
    assert out == {"ready": True}
    d = tmp_path / "wavs"
    d.mkdir()
    save_wav(str(d / "x.wav"), np.zeros(22050, np.float32))
    out = run(server.handle_http("/getAudioLengthOfDir", {"directory": str(d)}))
    assert abs(out["seconds"] - 1.0) < 0.01
    out = run(server.handle_http("/setDevice", {"device": "cpu"}))
    assert out == {"ok": True}
    out = run(server.handle_http("/bogus", {}))
    assert "error" in out


def _quiet_logger():
    import logging

    lg = logging.getLogger("test_quiet")
    lg.addHandler(logging.NullHandler())
    lg.propagate = False
    return lg


def test_ui_endpoints(tmp_path):
    from xva_trainer_tpu.app.server import _ui_html

    html = _ui_html()
    assert "<html" in html and "Dataset explorer" in html

    ds = tmp_path / "ds"
    (ds / "wavs").mkdir(parents=True)
    y = (0.1 * np.sin(np.arange(11025) * 0.05)).astype(np.float32)
    save_wav(str(ds / "wavs" / "a.wav"), y)
    save_wav(str(ds / "wavs" / "b.wav"), y)
    (ds / "metadata.csv").write_text("a.wav|hello there\n")

    server = AppServer(logger=_quiet_logger())
    info = run(server.handle_http("/datasetInfo", {"path": str(ds)}))
    assert info["items"][0]["text"] == "hello there"
    assert "b.wav" in info["untranscribed"]

    run(server.handle_http(
        "/updateTranscript",
        {"path": str(ds), "name": "a.wav", "text": "edited line"},
    ))
    info = run(server.handle_http("/datasetInfo", {"path": str(ds)}))
    assert info["items"][0]["text"] == "edited line"

    q = run(server.handle_http("/queue", {}))
    assert q["running"] is False and q["queue"] == []

    g = run(server.handle_http("/graphs", {"dir": str(tmp_path)}))
    assert g == {}


def test_training_queue_persistence(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    server = AppServer(logger=_quiet_logger())
    ts = server.training
    ts.queue = [{"dataset_path": "/a"}, {"dataset_path": "/b"}]
    ts.queue_index = 1
    ts.save_queue()
    ts2 = AppServer(logger=_quiet_logger()).training
    assert ts2.load_queue()
    assert ts2.queue_index == 1 and len(ts2.queue) == 2


def test_save_recording(tmp_path):
    import io

    import numpy as np
    from scipy.io import wavfile

    server = AppServer(logger=_quiet_logger())
    sr = 44100
    t = np.arange(sr) / sr
    y = (0.3 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)
    buf = io.BytesIO()
    wavfile.write(buf, sr, y)
    r = server.save_recording(str(tmp_path), "take1", buf.getvalue(),
                              text="a recorded line")
    assert r["ok"] and abs(r["seconds"] - 1.0) < 0.05
    assert os.path.exists(tmp_path / "wavs" / "take1.wav")
    # resampled to 22050 and registered in metadata
    sr2, data = wavfile.read(tmp_path / "wavs" / "take1.wav")
    assert sr2 == 22050
    meta = (tmp_path / "metadata.csv").read_text()
    assert "take1.wav|a recorded line" in meta


def test_delete_record(tmp_path):
    """/deleteRecord removes the metadata line; the wav stays (reference
    explorer line delete, javascript/script.js:531-545)."""
    import asyncio

    import numpy as np

    from xva_trainer_tpu.app.server import AppServer
    from xva_trainer_tpu.data.audio_io import save_wav

    ds = tmp_path / "ds"
    (ds / "wavs").mkdir(parents=True)
    for n in ("a", "b"):
        save_wav(str(ds / "wavs" / f"{n}.wav"),
                 np.zeros(2205, np.float32))
    (ds / "metadata.csv").write_text("a.wav|alpha\nb.wav|beta")

    async def run():
        srv = AppServer(http_port=8099, ws_port=8100)
        r = await srv.handle_http("/deleteRecord",
                                  {"path": str(ds), "name": "a.wav"})
        assert r["ok"]
        assert (ds / "metadata.csv").read_text() == "b.wav|beta"
        assert (ds / "wavs" / "a.wav").exists()  # wav untouched
        info = srv._dataset_info(str(ds))
        assert [i["name"] for i in info["items"]] == ["b.wav"]
        assert "a.wav" in info.get("untranscribed", [])
        r2 = await srv.handle_http("/deleteRecord",
                                   {"path": str(ds), "name": "a.wav"})
        assert not r2["ok"]  # already gone

    asyncio.run(run())


def test_app_settings_persist_and_restart(tmp_path, monkeypatch):
    """Settings survive a server restart via app_settings.json (reference
    settingsMenu.js:201-249 persisted userSettings)."""
    monkeypatch.chdir(tmp_path)
    server = AppServer()
    out = run(server.handle_http("/appSettings", {}))
    assert out["settings"]["theme"] == "dark"  # defaults
    out = run(server.handle_http("/appSettings", {"set": {
        "theme": "light", "datasets_path": "/data/voices",
        "http_port": 9102, "unknown_key": "ignored"}}))
    assert out["settings"]["theme"] == "light"
    assert "unknown_key" not in out["settings"]
    # a NEW server instance (restart) reads them back from disk
    server2 = AppServer()
    out2 = run(server2.handle_http("/appSettings", {}))
    assert out2["settings"]["theme"] == "light"
    assert out2["settings"]["datasets_path"] == "/data/voices"
    assert out2["settings"]["http_port"] == 9102


def test_server_log_endpoint(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    import logging
    from logging.handlers import RotatingFileHandler

    lg = logging.getLogger("t-srvlog")
    lg.setLevel(logging.INFO)
    h = RotatingFileHandler(str(tmp_path / "server.log"), maxBytes=1 << 20)
    lg.addHandler(h)
    lg.propagate = False
    server = AppServer(logger=lg)
    lg.info("hello from the app logger")
    out = run(server.handle_http("/serverLog", {"tail": 10}))
    assert any("hello from the app logger" in ln for ln in out["lines"])


def test_queue_reorder_and_duplicate(tmp_path, monkeypatch):
    """Queue reorder/duplicate (reference javascript/train.js:258-368)."""
    monkeypatch.chdir(tmp_path)
    server = AppServer()
    server.training.queue = [
        {"dataset_path": "/a"}, {"dataset_path": "/b"}, {"dataset_path": "/c"},
    ]
    out = run(server.handle_http("/updateQueueItem", {"index": 2, "move": 0}))
    assert out["ok"]
    assert [q["dataset_path"] for q in server.training.queue] == ["/c", "/a", "/b"]
    out = run(server.handle_http("/updateQueueItem", {"index": 1,
                                                      "duplicate": True}))
    assert out["ok"]
    assert [q["dataset_path"] for q in server.training.queue] == [
        "/c", "/a", "/a", "/b"]
    # duplicates are independent copies
    server.training.queue[2]["batch_size"] = 4
    assert "batch_size" not in server.training.queue[1]
    # order persisted to disk
    with open("training_queue.json") as f:
        saved = json.load(f)
    assert [q["dataset_path"] for q in saved["queue"]] == ["/c", "/a", "/a", "/b"]


def test_ui_dom_ids_consistent():
    """Every element id the inline script looks up must exist as an id= in
    the markup (no browser/JS runtime in CI — this catches the typo class of
    UI breakage), and JS braces/parens must balance outside strings."""
    import re

    from xva_trainer_tpu.app.server import _ui_html

    html = _ui_html()
    ids = set(re.findall(r'id="([^"]+)"', html))
    script = html[html.index("<script>"):html.index("</script>")]
    wanted = set(re.findall(r"getElementById\('([^']+)'\)", script))
    missing = wanted - ids
    assert not missing, f"JS references missing element ids: {sorted(missing)}"

    # strip strings/comments, then require balanced delimiters
    stripped = re.sub(r"'(?:\\.|[^'\\])*'|\"(?:\\.|[^\"\\])*\"|`(?:\\.|[^`\\])*`",
                      "", script)
    stripped = re.sub(r"//[^\n]*", "", stripped)
    stripped = re.sub(r"/\*.*?\*/", "", stripped, flags=re.S)
    for o, c in (("{", "}"), ("(", ")"), ("[", "]")):
        assert stripped.count(o) == stripped.count(c), f"unbalanced {o}{c}"


def test_import_metadata_merge(tmp_path):
    """Drag-drop import endpoint: named rows update in place (extension-
    insensitive), new names append, nameless .txt lines get fresh auto
    names — reference javascript/script.js:658-760."""
    ds = tmp_path / "ds"
    ds.mkdir()
    (ds / "metadata.csv").write_text("a|old text\nb.wav|keep me")

    server = AppServer(logger=_quiet_logger())
    r = run(server.handle_http("/importMetadata", {"path": str(ds), "lines": [
        {"name": "a.wav", "text": "new text"},   # updates stem key "a"
        {"name": "c.wav", "text": "fresh"},      # appended
        {"text": "typed line one"},              # auto-named
        {"text": "typed line two"},
    ]}))
    assert r == {"ok": True, "updated": 1, "added": 3}
    rows = dict(ln.split("|", 1)
                for ln in (ds / "metadata.csv").read_text().splitlines() if ln)
    assert rows["a"] == "new text"
    assert rows["b.wav"] == "keep me"
    assert rows["c.wav"] == "fresh"
    assert rows["line_0.wav"] == "typed line one"
    assert rows["line_1.wav"] == "typed line two"
    assert len(rows) == 5
