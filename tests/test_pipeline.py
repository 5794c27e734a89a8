"""Training-pipeline failure handling (SURVEY §5.3): the OOM batch
retreat (reference handleTrainer.js:131-145 restarts with batch_size-3) and
non-OOM error propagation. Fault-injection tests — the inner pipeline is
monkeypatched."""
import pytest

pytestmark = pytest.mark.slow  # full-size/e2e tier: run via `make test-all`


def test_oom_batch_retreat(monkeypatch):
    """Fault injection for the OOM retreat (reference handleTrainer:131-145):
    a RESOURCE_EXHAUSTED failure restarts the pipeline with batch_size-3."""
    from xva_trainer_tpu.train import pipeline as P

    seen = []

    def fake_inner(cfg, model_cfg, gen_cfg, mesh, max_iters, on_trainer=None):
        seen.append(cfg.batch_size)
        if len(seen) < 3:
            raise RuntimeError("RESOURCE_EXHAUSTED: out of memory on HBM")
        return {"ok": True, "bs": cfg.batch_size}

    monkeypatch.setattr(P, "_train_v2_pipeline", fake_inner)
    cfg = P.PipelineConfig(dataset_path="/nonexistent", output_path="/tmp/x",
                           batch_size=16)
    out = P.train_v2_pipeline(cfg)
    assert seen == [16, 13, 10]
    assert out == {"ok": True, "bs": 10}


def test_non_oom_error_propagates(monkeypatch):
    from xva_trainer_tpu.train import pipeline as P

    def fake_inner(*a, **k):
        raise ValueError("unrelated failure")

    monkeypatch.setattr(P, "_train_v2_pipeline", fake_inner)
    cfg = P.PipelineConfig(dataset_path="/nonexistent", output_path="/tmp/x")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="unrelated"):
        P.train_v2_pipeline(cfg)
