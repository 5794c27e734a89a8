"""North-star measurement (BASELINE.md): 2h-dataset FastPitch(1-4) +
HiFi-GAN(5) fine-tune < 1h wall-clock on v5e-8 (VERDICT r1 #3).

Methodology (everything a user would wait for is included):
1. Build a synthetic 2h dataset (1200 clips × ~6s, tonal "voices").
2. Measure the one-time preprocessing wall-clock: feature-cache build
   (wav decode + TPU mel + native YIN pitch) + packing.
3. For each FastPitch stage and for HiFi-GAN, run 1 warm-up epoch (compile)
   + 1 timed steady-state epoch with the production trainer loop (prefetch
   host feed included) at the stage's production batch sizing.
4. Duration extraction (stage 1→2 hand-off) is timed once.
5. Compose two schedules from the measured epoch times:
   - min-schedule: the early-stopper's minimum legal epochs per stage
     (1/20/1/1 + HiFi 25 — train/early_stop.py, reference :952 / hifigan
     :268-270);
   - typical-schedule: 5/20/5/5 + HiFi 25 (stages with min 1 rarely hit
     their delta target before ~5 epochs).
6. v5e-8 extrapolation: stage epoch time scales 1/8 (DP over ICI; the
   measured loop is device-bound after the prefetch work — see
   fastpitch_loop_frames_per_sec vs device-only in bench_train.py), while
   one-time host preprocessing does not scale.

Run: python bench_northstar.py [--clips N] [--seconds-per-clip S]
Writes northstar.json and prints one JSON line.
"""
import argparse
import json
import os
import time

import numpy as np


def build_dataset(root: str, n_clips: int, sec: float) -> str:
    from xva_trainer_tpu.data.audio_io import save_wav

    rng = np.random.default_rng(0)
    ds = os.path.join(root, "ds2h")
    os.makedirs(os.path.join(ds, "wavs"), exist_ok=True)
    lines = []
    words = ("the quick brown fox jumps over the lazy dog while seven "
             "wizards toast jugs of very exquisite blank verse").split()
    for i in range(n_clips):
        dur = sec * rng.uniform(0.7, 1.3)
        t = np.arange(int(22050 * dur)) / 22050
        f0 = 110 + (i % 40) * 3
        y = np.zeros_like(t)
        for h in range(1, 8):
            y += 0.4 / h * np.sin(2 * np.pi * f0 * h * t)
        y *= 0.5 + 0.5 * np.sin(2 * np.pi * rng.uniform(1, 3) * t)
        save_wav(os.path.join(ds, "wavs", f"c{i:05d}.wav"),
                 (0.4 * y).astype(np.float32))
        k = rng.integers(6, 14)
        text = " ".join(rng.choice(words, k))
        lines.append(f"c{i:05d}.wav|{text}")
    with open(os.path.join(ds, "metadata.csv"), "w") as f:
        f.write("\n".join(lines))
    return ds


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=1200)
    ap.add_argument("--seconds-per-clip", type=float, default=6.0)
    ap.add_argument("--root", default="/tmp/xva_northstar")
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--tiny", action="store_true",
                    help="shrunken model configs: validates the whole script "
                         "quickly (numbers NOT meaningful — smoke mode only)")
    args = ap.parse_args()

    from xva_trainer_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache(os.path.dirname(os.path.abspath(__file__)))
    # same tunnel-down protection as bench.py: probe the default backend in
    # a subprocess; fall back to CPU (and honor JAX_PLATFORMS=cpu, which the
    # axon sitecustomize otherwise overrides)
    from bench import probe_backend

    report_platform = probe_backend()

    import jax

    from xva_trainer_tpu.data.dataset import BucketBatcher, FeatureCache
    from xva_trainer_tpu.data.text import TextProcessor
    from xva_trainer_tpu.models.fastpitch import FastPitchConfig
    from xva_trainer_tpu.train.fastpitch_trainer import (
        FastPitchTrainConfig,
        FastPitchTrainer,
    )
    from xva_trainer_tpu.train.hifigan_trainer import (
        HifiganTrainConfig,
        HifiganTrainer,
    )
    from xva_trainer_tpu.train.pipeline import stage_batch_size
    from xva_trainer_tpu.train.early_stop import fastpitch_min_epochs

    os.makedirs(args.root, exist_ok=True)
    report = {"clips": args.clips, "sec_per_clip": args.seconds_per_clip,
              "platform": report_platform}

    t0 = time.perf_counter()
    ds = build_dataset(args.root, args.clips, args.seconds_per_clip)
    report["dataset_gen_s"] = round(time.perf_counter() - t0, 1)

    hours = args.clips * args.seconds_per_clip / 3600
    report["dataset_hours"] = round(hours, 2)

    # ---- one-time preprocessing (counted) ----
    t0 = time.perf_counter()
    cache = FeatureCache(ds, TextProcessor().encode)
    cache.build()
    report["cache_build_s"] = round(time.perf_counter() - t0, 1)

    out_dir = os.path.join(args.root, "out")
    cfg = FastPitchTrainConfig(output_dir=out_dir, batch_size=args.batch_size)
    from xva_trainer_tpu.models.hifigan import HifiganConfig

    if args.tiny:
        model_cfg = FastPitchConfig(
            symbols_embedding_dim=64, in_fft_n_layers=1, out_fft_n_layers=1,
            in_fft_d_head=32, out_fft_d_head=32, in_fft_filter_size=64,
            out_fft_filter_size=64, predictor_filter_size=32)
        hifi_gen_cfg = HifiganConfig(
            upsample_initial_channel=32, resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 3),))
        report["tiny_smoke_mode"] = True
    else:
        model_cfg, hifi_gen_cfg = FastPitchConfig(), HifiganConfig()
    tr = FastPitchTrainer(cache, cfg, model_cfg)
    max_len = cache.max_file_len_sec()
    n_dev = len(jax.devices())

    def batcher_for(stage):
        bs = stage_batch_size(args.batch_size, stage, max_len, n_dev)
        # device_prior (trainer default): skip the host prior collate and its
        # H2D transfer; the step materializes it on device (ops/attn_prior.py)
        b = BucketBatcher(cache, batch_size=bs,
                          with_prior=not cfg.device_prior,
                          device_prior=cfg.device_prior)
        b.use_durs = stage >= 2 and cache.has_durations()
        return b

    rng = jax.random.PRNGKey(0)
    stage_epoch_s = {}
    stage_compile_s = {}
    durs_s = 0.0
    pre = None
    hifi_holder = {}
    hcfg = HifiganTrainConfig(output_dir=os.path.join(out_dir, "hifi"),
                              batch_size=16,
                              data_mult=1 if args.tiny else None)

    def _build_hifi():
        h = HifiganTrainer(ds, hcfg, hifi_gen_cfg)
        h.setup(resume=False)
        h.precompile()
        hifi_holder["trainer"] = h

    for stage in (1, 2, 3, 4):
        tr.stage = stage
        tr._stage_objects()
        batcher = batcher_for(stage)
        if stage == 1:
            tr.setup(batcher, resume=False)
            if os.environ.get("XVA_PRECOMPILE", "1") != "0":
                # production-pipeline behavior (train/pipeline.py): warm all
                # later compiles in background threads while stage 1 trains
                from xva_trainer_tpu.train.precompile import Precompiler

                pre = Precompiler()
                occupied = [b for b, it in batcher.assignment.items() if it]
                for s in (1, 2, 3, 4):
                    bs = stage_batch_size(args.batch_size, s, max_len, n_dev)
                    pre.submit(f"fp_stage{s}", tr.precompile_stage, s, bs,
                               occupied)
                pre.submit("fp_align", tr.precompile_align,
                           stage_batch_size(args.batch_size, 1, max_len,
                                            n_dev), occupied)
                pre.submit("hifigan", _build_hifi)
        else:
            tr.reset_opt_state()  # re-committed: bare tx.init triggers a
            # full recompile of every bucket shape on the NEXT epoch (the
            # r3 north-star's 208s/epoch stage-2 "steady state" was exactly
            # those recompiles; true steady epochs are <1s)
        # warm-up epoch = compile + first pass
        t0 = time.perf_counter()
        _, rng = tr.run_epoch(batcher, rng)
        stage_compile_s[stage] = round(time.perf_counter() - t0, 1)
        # steady-state epoch
        t0 = time.perf_counter()
        _, rng = tr.run_epoch(batcher, rng)
        stage_epoch_s[stage] = round(time.perf_counter() - t0, 1)
        print(f"[northstar] stage {stage}: warmup {stage_compile_s[stage]}s "
              f"steady {stage_epoch_s[stage]}s "
              f"({len(batcher)} steps/epoch, frames/s "
              f"{int(tr.meter.mean())})", flush=True)
        if stage == 1:
            t0 = time.perf_counter()
            tr.extract_durations(batcher)
            durs_s = round(time.perf_counter() - t0, 1)
    report["stage_epoch_s"] = stage_epoch_s
    report["stage_warmup_s"] = stage_compile_s
    report["durations_extract_s"] = durs_s

    # ---- HiFi-GAN (stage 5) ----
    t0 = time.perf_counter()
    if pre is not None:
        pre.wait()
        report["precompile_task_s"] = pre.timings
        if pre.errors:
            report["precompile_errors"] = [f"{n}: {e}" for n, e in pre.errors]
        pre.close()
    hifi = hifi_holder.get("trainer")
    if hifi is None:
        hifi = HifiganTrainer(ds, hcfg, hifi_gen_cfg)
        hifi.setup(resume=False)
    report["hifi_setup_s"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    hifi.run_epoch()
    report["hifi_warmup_s"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    hifi.run_epoch()
    hifi_epoch_s = round(time.perf_counter() - t0, 1)
    report["hifi_epoch_s"] = hifi_epoch_s
    print(f"[northstar] hifi: warmup {report['hifi_warmup_s']}s "
          f"steady {hifi_epoch_s}s", flush=True)

    # ---- schedule compositions ----
    one_time = (report["cache_build_s"] + durs_s
                + sum(stage_compile_s.values()) + report["hifi_warmup_s"]
                + report["hifi_setup_s"])
    min_epochs = {s: fastpitch_min_epochs(s) for s in (1, 2, 3, 4)}
    typical = {1: 5, 2: 20, 3: 5, 4: 5}
    HIFI_MIN = 25

    def total(epochs):
        train = sum(stage_epoch_s[s] * max(0, epochs[s] - 1)
                    for s in (1, 2, 3, 4))
        train += hifi_epoch_s * (HIFI_MIN - 1)
        return one_time + train

    report["one_time_s"] = round(one_time, 1)
    report["min_schedule_wall_s"] = round(total(min_epochs), 1)
    report["typical_schedule_wall_s"] = round(total(typical), 1)
    report["northstar_target_s"] = 3600

    # ---- v5e-8 estimate, measured composition (VERDICT r3 weak #1) ----
    # Replaces the old bare 1/8 scale. Per stage, the v5e-8 epoch estimate is
    #   max( steps/epoch × (t_step(B/8) + t_allreduce), host_collate_epoch )
    # where:
    # - t_step(B/8) is MEASURED on this chip: the stage's real jitted step
    #   dispatched at per-chip batch B/8 (global batch and steps/epoch
    #   unchanged under 8-way DP), best-of-3 chained dispatches per occupied
    #   bucket, weighted by that bucket's batches/epoch;
    # - t_allreduce is the ring all-reduce of the fp32 grad tree over ICI
    #   (2·bytes·(N-1)/N ÷ 9e10 B/s per chip) — an analytic term, labeled so;
    # - host_collate_epoch is MEASURED: one v5e-8 host still collates the
    #   full global batch every step, so the host feed is a floor that does
    #   not scale with chips.
    # One-time work (cache build, compiles, extraction) does not scale.
    if not args.tiny and os.environ.get("XVA_NORTHSTAR_V5E8", "1") != "0":
        from northstar_v5e8 import probe_v5e8

        v5e8 = probe_v5e8(tr, hifi, batcher_for, args.batch_size, max_len,
                          n_dev)
        report["v5e8_probe"] = v5e8

        def total8(epochs):
            train = sum(v5e8["stage_epoch_est_s"][str(s)]
                        * max(0, epochs[s] - 1) for s in (1, 2, 3, 4))
            train += v5e8["hifi_epoch_est_s"] * (HIFI_MIN - 1)
            return one_time + train

        report["min_schedule_v5e8_est_s"] = round(total8(min_epochs), 1)
        report["typical_schedule_v5e8_est_s"] = round(total8(typical), 1)
        report["v5e8_method"] = (
            "estimated: measured per-chip step @ B/8 + analytic ICI ring "
            "all-reduce (fp32 grads, 9e10 B/s) + measured host-collate floor;"
            " one-time does not scale")
    # The target verdict is only meaningful for the real benchmark: full-size
    # models, the full 2h dataset, and an accelerator backend. A tiny/CPU/
    # short-dataset smoke writes null — it validates the script, not the
    # north star (VERDICT r2 weak #2).
    full_run = (not args.tiny and args.clips >= 1200
                and report_platform != "cpu")
    report["meets_target_1chip_typical"] = (
        report["typical_schedule_wall_s"] < 3600) if full_run else None
    if "typical_schedule_v5e8_est_s" in report:
        report["meets_target_v5e8_typical_est"] = (
            report["typical_schedule_v5e8_est_s"] < 3600) if full_run else None

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "northstar.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
