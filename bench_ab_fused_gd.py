"""A/B: fused single-backward G+D v3 step vs the two-pass formulation.

Times the full-size xVAPitch train step (same config as bench_train's
flagship bench) both ways on the default backend and writes
ab_fused_gd.json. The fused step computes both gradient trees in one
backward over ``g_loss + d_loss`` with stop_gradient routing
(train/xvapitch_trainer.make_v3_step) — numerics proven identical in
tests/test_fused_gd.py; this measures the step-time win.

Run: python bench_ab_fused_gd.py [--iters N]
"""
import argparse
import json
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--B", type=int, default=128)
    ap.add_argument("--T-text", type=int, default=96)
    ap.add_argument("--T-spec", type=int, default=384)
    args = ap.parse_args()

    from xva_trainer_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache(os.path.dirname(os.path.abspath(__file__)))

    import jax

    from bench_train import _xvapitch_state_and_batch, _bf16_peak_flops, _step_flops
    from xva_trainer_tpu.train.xvapitch_trainer import make_v3_step

    platform = jax.devices()[0].platform
    model, disc, g_tx, d_tx, state0, batch = _xvapitch_state_and_batch(
        args.B, args.T_text, args.T_spec)
    keys = [jax.random.PRNGKey(i) for i in range(args.iters + 1)]
    frames = int(np.sum(np.asarray(batch["slens"])))

    report = {"platform": platform, "B": args.B, "T_text": args.T_text,
              "T_spec": args.T_spec, "iters": args.iters}

    def run_variant(name, fused, model, disc, g_tx, d_tx, state, batch):
        """Runs one variant in its own scope so its donated state chain and
        executables are droppable before the other variant builds (two full
        V3States + activations do not fit HBM together)."""
        from bench_train import _commit_single

        # state0 is host-side now (see _xvapitch_state_and_batch) — each
        # variant commits its own fresh device copy and donates that
        state = _commit_single(state)
        step = make_v3_step(model, disc, g_tx, d_tx, freeze_post_dec=False,
                            fused_gd=fused)
        flops = _step_flops(step, None, state, batch, keys[-1])
        state, meta = step(state, batch, keys[-1])  # compile+warm (donates)
        jax.block_until_ready(meta["loss"])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for i in range(args.iters):
                state, meta = step(state, batch, keys[i])
            jax.block_until_ready(meta["loss"])
            best = min(best, (time.perf_counter() - t0) / args.iters)
        report[f"{name}_step_ms"] = round(best * 1e3, 2)
        report[f"{name}_frames_per_sec"] = round(frames / best, 1)
        report[f"{name}_loss"] = float(meta["loss"])
        if flops:
            report[f"{name}_step_tflops"] = round(flops / 1e12, 3)
            report[f"{name}_mfu_vs_bf16_peak"] = round(
                (flops / best) / _bf16_peak_flops(), 4)
        if hasattr(step, "clear_cache"):
            step.clear_cache()  # free the variant's compiled executable

    import gc

    run_variant("unfused", False, model, disc, g_tx, d_tx, state0, batch)
    del model, disc, g_tx, d_tx, state0, batch
    gc.collect()
    model, disc, g_tx, d_tx, state0, batch = _xvapitch_state_and_batch(
        args.B, args.T_text, args.T_spec)
    run_variant("fused", True, model, disc, g_tx, d_tx, state0, batch)

    report["fused_speedup"] = round(
        report["unfused_step_ms"] / report["fused_step_ms"], 3)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "ab_fused_gd.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
