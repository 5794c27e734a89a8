"""Typed-config overlay precedence (SURVEY 5.6)."""
import json

from xva_trainer_tpu.train.xvapitch_trainer import XvaTrainConfig
from xva_trainer_tpu.utils.config import build_config, overlay


def test_overlay_precedence(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({"batch_size": 8, "gen_lr": 1e-4}))
    cfg, unknown = build_config(
        XvaTrainConfig,
        json_path=str(p),
        message={"batch_size": 12, "bogus_key": 1},
        cli=["batch_size=24", "save_step=10"],
        output_dir="/tmp/x",
    )
    assert cfg.batch_size == 24          # cli wins
    assert cfg.gen_lr == 1e-4            # json survives
    assert cfg.save_step == 10
    assert cfg.output_dir == "/tmp/x"
    assert "bogus_key" in unknown


def test_coercion():
    cfg, _ = overlay(XvaTrainConfig(), {"hifi_only": "true", "target_bs": "200"})
    assert cfg.hifi_only is True and cfg.target_bs == 200
