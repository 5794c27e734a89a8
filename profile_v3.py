"""One-off: profile the xVAPitch fused G+D step on the chip and print the
top ops by self time (parsed from the jax.profiler trace-event dump)."""
import glob
import gzip
import json
import os
import sys
import time

import numpy as np


def main(B=64):
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from bench_train import bench_xvapitch  # reuse setup by monkey timing

    # Rebuild the same setup as bench_xvapitch but keep handles
    import jax.numpy as jnp
    import optax
    from xva_trainer_tpu.models.xvapitch import (
        VitsDiscriminator, XVAPitch, XVAPitchConfig)
    from xva_trainer_tpu.train.xvapitch_trainer import V3State, make_v3_step

    T_TEXT, T_SPEC = 96, 384
    cfg = XVAPitchConfig()
    model, disc = XVAPitch(cfg), VitsDiscriminator()
    rng = np.random.default_rng(0)
    tokens = np.zeros((B, T_TEXT), np.int32)
    tlens = rng.integers(T_TEXT // 2, T_TEXT + 1, B).astype(np.int32)
    for b, l in enumerate(tlens):
        tokens[b, :l] = rng.integers(1, 524, l)
    slens = rng.integers(T_SPEC // 2, T_SPEC + 1, B).astype(np.int32)
    batch = {
        "tokens": jnp.asarray(tokens), "tlens": jnp.asarray(tlens),
        "linear": jnp.asarray(np.abs(rng.standard_normal((B, T_SPEC, 513))).astype(np.float32)),
        "slens": jnp.asarray(slens),
        "pitch": jnp.asarray(rng.standard_normal((B, 1, T_SPEC)).astype(np.float32)),
        "energy": jnp.asarray(np.zeros((B, T_SPEC), np.float32)),
        "wav": jnp.asarray((rng.standard_normal((B, T_SPEC * 256, 1)) * 0.1).astype(np.float32)),
        "dvec": jnp.asarray((rng.standard_normal((B, 512)) * 0.1).astype(np.float32)),
        "lang": jnp.asarray(np.zeros((B,), np.int32)),
    }
    rngs = {k: jax.random.PRNGKey(i) for i, k in enumerate(
        ["params", "noise", "segments", "dropout"])}
    g_params = model.init(rngs, batch["tokens"], batch["tlens"], batch["linear"],
                          batch["slens"], batch["pitch"], batch["energy"],
                          batch["wav"], batch["dvec"], batch["lang"])
    seg = jnp.zeros((B, cfg.spec_segment_size * cfg.hop_length, 1))
    d_params = disc.init(jax.random.PRNGKey(9), seg, seg)
    g_tx = optax.MultiSteps(optax.adamw(1.75e-4, b1=0.8, b2=0.99, weight_decay=0.01), 7)
    d_tx = optax.MultiSteps(optax.adamw(2e-4, b1=0.8, b2=0.99, weight_decay=0.01), 7)
    state = V3State(g_params=g_params, d_params=d_params,
                    g_opt=g_tx.init(g_params), d_opt=d_tx.init(d_params),
                    step=jnp.zeros((), jnp.int32))
    step = make_v3_step(model, disc, g_tx, d_tx, freeze_post_dec=False)
    keys = [jax.random.PRNGKey(i) for i in range(8)]
    state, meta = step(state, batch, keys[-1])
    jax.block_until_ready(meta["loss"])

    trace_dir = "/tmp/v3_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for i in range(4):
            state, meta = step(state, batch, keys[i])
        jax.block_until_ready(meta["loss"])

    # parse trace events: accumulate device-op self durations by name
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    print("trace files:", files, file=sys.stderr)
    tot = {}
    for fp in files:
        with gzip.open(fp, "rt") as f:
            data = json.load(f)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            pidname = ev.get("pid")
            name = ev.get("name", "")
            dur = ev.get("dur", 0)
            # keep XLA op events (device lanes have long op names)
            tot[name] = tot.get(name, 0) + dur
    top = sorted(tot.items(), key=lambda kv: -kv[1])[:60]
    for name, dur in top:
        print(f"{dur/1e3/4:10.3f} ms/step  {name[:140]}")


if __name__ == "__main__":
    main()
