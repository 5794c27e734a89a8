"""Decompose the xVAPitch fused train step's device time into stages.

Times, at the production bench shape (B=128, T_text=96, T_spec=384):

  spec      — _materialize_spec alone (int16 dequant + device linear STFT)
  g_fwd     — generator forward + non-adversarial losses (make_v3_loss_eval)
  gd_value  — full both-loss value (G fwd + 2x CSE'd D fwd + all losses)
  gd_grad   — value_and_grad of the same (adds the backward)
  full_step — the production make_v3_step (adds NaN guards + both optimizers)

Differences attribute the full step: backward = gd_grad - gd_value,
optimizer/finish = full_step - gd_grad, D fwd + adv losses =
gd_value - g_fwd - spec.  Prints one JSON line; run on the real chip:

    python scripts/decompose_step.py [--iters 10]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xva_trainer_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=10, reps=3, label=""):
    import jax

    print(f"[decompose] compiling {label}...", file=sys.stderr, flush=True)

    def force(o):
        # device_get of one leaf: the tunneled backend's block_until_ready
        # can return before remote execution completes; a host transfer
        # cannot.
        return jax.device_get(jax.tree_util.tree_leaves(o)[0])

    out = fn(*args)
    force(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        force(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--B", type=int, default=128)
    args = ap.parse_args()

    import functools

    import jax

    import bench_train
    from xva_trainer_tpu.models.xvapitch.model import XVAPitch
    from xva_trainer_tpu.models.xvapitch import losses as v_losses
    from xva_trainer_tpu.train import amp
    from xva_trainer_tpu.train.xvapitch_trainer import (
        _materialize_spec, make_v3_loss_eval, make_v3_step)

    model, disc, g_tx, d_tx, state, batch = \
        bench_train._xvapitch_state_and_batch(args.B, 96, 384)
    rng = jax.random.PRNGKey(0)
    res = {"B": args.B, "platform": jax.devices()[0].platform}

    # --- spec materialization alone ---
    spec_fn = jax.jit(functools.partial(
        _materialize_spec, hop=model.cfg.hop_length))
    res["spec_ms"] = timeit(spec_fn, batch, iters=args.iters, label="spec")

    # --- generator forward + non-adversarial losses ---
    eval_fn = make_v3_loss_eval(model)
    res["g_fwd_ms"] = timeit(
        eval_fn, state.g_params, batch, rng, iters=args.iters, label="g_fwd")
    print(json.dumps(res), file=sys.stderr, flush=True)

    # --- full G+D loss, value only vs value+grad ---
    _g_apply = functools.partial(
        amp.amp_apply, model.apply, exclude=("duration_predictor",))
    _d_apply = functools.partial(amp.amp_apply, disc.apply)

    def both_loss(g_params, d_params):
        rngs = {"noise": jax.random.fold_in(rng, 0),
                "segments": jax.random.fold_in(rng, 1),
                "dropout": jax.random.fold_in(rng, 2)}
        linear, wav = _materialize_spec(batch, hop=model.cfg.hop_length)
        out = _g_apply(
            g_params, batch["tokens"], batch["tlens"], linear,
            batch["slens"], batch["pitch"], batch["energy"],
            wav, batch["dvec"], batch["lang"],
            method=XVAPitch.train_step, rngs=rngs)
        s_fake, f_fake, s_real, f_real = _d_apply(
            jax.lax.stop_gradient(d_params),
            out["model_outputs"], out["waveform_seg"])
        g_loss, meta = v_losses.generator_loss(
            out, s_fake, f_fake, f_real,
            language_ids=batch["lang"], spec_lengths=batch["slens"])
        s_fake_d, _, s_real_d, _ = _d_apply(
            d_params,
            jax.lax.stop_gradient(out["model_outputs"]),
            jax.lax.stop_gradient(out["waveform_seg"]))
        d_loss, _ = v_losses.discriminator_loss(s_real_d, s_fake_d)
        return g_loss + d_loss

    value_fn = jax.jit(both_loss)
    res["gd_value_ms"] = timeit(
        value_fn, state.g_params, state.d_params, iters=args.iters,
        label="gd_value")
    print(json.dumps(res), file=sys.stderr, flush=True)

    # Returning full grad trees keeps ~700MB of outputs live alongside the
    # activations and OOMs; the production step consumes grads in-place
    # (donated state). Reduce to grad norms — the backward still runs fully.
    def grad_norms(g_params, d_params):
        (g_grads, d_grads) = jax.grad(both_loss, argnums=(0, 1))(
            g_params, d_params)
        sq = sum(jnp.vdot(x, x) for x in jax.tree_util.tree_leaves(g_grads))
        sqd = sum(jnp.vdot(x, x) for x in jax.tree_util.tree_leaves(d_grads))
        return sq, sqd

    import jax.numpy as jnp

    grad_fn = jax.jit(grad_norms)
    res["gd_grad_ms"] = timeit(
        grad_fn, state.g_params, state.d_params, iters=args.iters,
        label="gd_grad")
    print(json.dumps(res), file=sys.stderr, flush=True)

    # --- production step (donated; re-make state each rep is too slow, so
    # time without donation semantics by rebuilding once) ---
    step = make_v3_step(model, disc, g_tx, d_tx, freeze_post_dec=False)
    keys = [jax.random.PRNGKey(i) for i in range(args.iters)]
    state, meta = step(state, batch, keys[0])
    jax.block_until_ready(meta["loss"])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for k in keys:
            state, meta = step(state, batch, k)
        jax.block_until_ready(meta["loss"])
        best = min(best, (time.perf_counter() - t0) / args.iters)
    res["full_step_ms"] = best * 1e3

    res["backward_ms_est"] = res["gd_grad_ms"] - res["gd_value_ms"]
    res["optimizer_ms_est"] = res["full_step_ms"] - res["gd_grad_ms"]
    res["d_fwd_plus_adv_ms_est"] = (
        res["gd_value_ms"] - res["g_fwd_ms"] - res["spec_ms"])
    print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                      for k, v in res.items()}))


if __name__ == "__main__":
    main()
