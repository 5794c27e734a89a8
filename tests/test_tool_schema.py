"""Per-tool settings schema + queue-item config endpoints
(VERDICT r1 missing #3; reference javascript/tools.js:82-488,
train.js:711-747)."""
import asyncio
import json
import logging

from xva_trainer_tpu.app import AppServer
from xva_trainer_tpu.tools import TOOL_REGISTRY
from xva_trainer_tpu.tools.schema import (
    TOOL_SETTINGS_SCHEMA,
    default_settings,
)


def run(coro):
    return asyncio.new_event_loop().run_until_complete(coro)


def _quiet_logger():
    lg = logging.getLogger("test-schema")
    lg.addHandler(logging.NullHandler())
    lg.propagate = False
    return lg


def test_schema_covers_every_registered_tool():
    assert set(TOOL_SETTINGS_SCHEMA) == set(TOOL_REGISTRY)


def test_schema_fields_are_well_formed():
    for tool, spec in TOOL_SETTINGS_SCHEMA.items():
        for f in spec["fields"]:
            assert set(f) >= {"key", "type", "label", "default"}, (tool, f)
            assert f["type"] in ("bool", "int", "float", "select", "str")
            if f["type"] == "select":
                assert f["default"] in f["options"]
        json.dumps(spec)  # must be JSON-serializable for the HTTP endpoint


def test_reference_parity_keys():
    """Spot-check the reference's settings keys survive verbatim."""
    d = default_settings("formatting")
    assert d == {"useMP": False, "formatting_hz": 22050}
    d = default_settings("silence_split")
    assert d["min_dB"] == -10.0 and d["silence_duration"] == 0.25
    d = default_settings("cluster_speakers")
    assert "use_custom_k" in d and d["cluster_folder_prefix"] == "0001"
    assert TOOL_SETTINGS_SCHEMA["speaker_search"]["dual_input"] == "corpus"
    assert TOOL_SETTINGS_SCHEMA["noise_removal"]["dual_input"] == "noise"


def test_schema_http_endpoint():
    server = AppServer(logger=_quiet_logger())
    out = run(server.handle_http("/toolSettingsSchema", {}))
    assert set(out["schema"]) == set(TOOL_REGISTRY)


def test_update_queue_item(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    server = AppServer(logger=_quiet_logger())
    server.training.queue = [
        {"dataset_path": "/a", "batch_size": 16},
        {"dataset_path": "/b", "batch_size": 16},
    ]
    out = run(server.handle_http(
        "/updateQueueItem",
        {"index": 1, "config": {"batch_size": 8, "force_stage": 5}}))
    assert out["ok"]
    assert server.training.queue[1]["batch_size"] == 8
    assert server.training.queue[1]["force_stage"] == 5
    out = run(server.handle_http("/updateQueueItem",
                                 {"index": 0, "remove": True}))
    assert out["ok"] and len(server.training.queue) == 1
    assert server.training.queue[0]["dataset_path"] == "/b"
    out = run(server.handle_http("/updateQueueItem", {"index": 9}))
    assert not out["ok"]


def test_pipeline_force_stage5_config():
    from xva_trainer_tpu.train.pipeline import PipelineConfig

    cfg = PipelineConfig(force_stage=5, epochs_per_checkpoint=3)
    assert cfg.force_stage == 5 and cfg.epochs_per_checkpoint == 3


def test_dataset_info_wer_column(tmp_path):
    """Explorer WER column joins the wer_evaluation report
    (reference script.js:243-316 WER column)."""
    import numpy as np

    from xva_trainer_tpu.data import save_wav

    ds = tmp_path / "ds"
    (ds / "wavs").mkdir(parents=True)
    for i in range(2):
        save_wav(str(ds / "wavs" / f"a{i}.wav"),
                 np.zeros(2205, np.float32))
    (ds / "metadata.csv").write_text("a0.wav|hello there\na1.wav|bye now")
    (ds / "wer_report.txt").write_text(
        "0.500 | a1 | bye now | by cow\n0.000 | a0 | hello there | hello there\n")
    server = AppServer(logger=_quiet_logger())
    info = run(server.handle_http("/datasetInfo", {"path": str(ds)}))
    by_name = {it["name"]: it for it in info["items"]}
    assert by_name["a0.wav"]["wer"] == 0.0
    assert by_name["a1.wav"]["wer"] == 0.5
