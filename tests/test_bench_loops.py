"""CPU smokes for the trainer-loop benches that the TPU capture script runs
(scripts/tpu_round3_capture.sh) — a plumbing failure there would otherwise
only surface on the live chip."""
import pytest

pytestmark = pytest.mark.slow  # full-size/e2e tier: run via `make test-all`
import numpy as np

from xva_trainer_tpu.models.xvapitch import XVAPitchConfig

TINY = XVAPitchConfig(
    n_vocab=524, big=False, upsample_initial_channel=16,
    resblock_kernel_sizes=(3,), spec_segment_size=8, mltts_rc=False,
    text_layers=1, posterior_layers=2, flow_wn_layers=1, num_flows=2,
    sdp_flows=2, pitch_layers=1,
)


def test_bench_v3_loop_smoke():
    from bench_train import bench_v3_trainer_loop

    out = bench_v3_trainer_loop(n_clips=6, batch_size=2, steps=2,
                                model_cfg=TINY)
    assert np.isfinite(out["xvapitch_loop_frames_per_sec"])
    assert out["xvapitch_loop_frames_per_sec"] > 0
