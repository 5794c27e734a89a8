"""A/B: HiFi-GAN update ordering (VERDICT r1 weak #4 / next #9).

Trains two identical HiFi-GAN runs on synthetic tonal audio — (a) the round-1
G-first/stale-D fused step (one generator forward per step), (b) the
reference's D-first-then-fresh-G ordering (hifigan/xva_train.py:451-567) —
and reports the mel-L1 trajectory of each plus steps/s. Run on the TPU:

    python bench_ab_hifigan.py [steps]

Writes ab_hifigan.json next to this file.
"""
import json
import os
import sys
import time

import numpy as np


def synth_batchset(n_items=24, seconds=2.0, sr=22050, seed=0):
    rng = np.random.default_rng(seed)
    wavs = []
    for i in range(n_items):
        t = np.arange(int(sr * seconds)) / sr
        f0 = 110 * 2 ** (i / 12)
        y = 0.0
        for h in range(1, 6):
            y = y + (0.4 / h) * np.sin(2 * np.pi * f0 * h * t)
        env = 0.5 + 0.5 * np.sin(2 * np.pi * 1.7 * t + i)
        wavs.append((y * env * 0.4).astype(np.float32))
    return wavs


def run_variant(d_first: bool, steps: int, batch_size: int = 16, seed: int = 0):
    import jax
    import jax.numpy as jnp
    import optax

    from xva_trainer_tpu.models.hifigan import (
        Generator,
        HifiganConfig,
        HifiganDiscriminator,
    )
    from xva_trainer_tpu.ops.stft import MelConfig
    from xva_trainer_tpu.train.hifigan_trainer import (
        SEGMENT_SIZE,
        GanState,
        make_gan_step,
    )

    gen = Generator(HifiganConfig())
    disc = HifiganDiscriminator()
    rng = np.random.default_rng(seed)
    wavs = synth_batchset(seed=seed)

    def sample_batch():
        seg = np.zeros((batch_size, SEGMENT_SIZE, 1), np.float32)
        for j in range(batch_size):
            y = wavs[rng.integers(0, len(wavs))]
            s = rng.integers(0, len(y) - SEGMENT_SIZE)
            seg[j, :, 0] = y[s : s + SEGMENT_SIZE]
        return jnp.asarray(seg)

    seg0 = sample_batch()
    mel0 = jnp.zeros((batch_size, SEGMENT_SIZE // 256, 80), jnp.float32)
    g_params = gen.init(jax.random.PRNGKey(0), mel0)
    d_vars = disc.init(jax.random.PRNGKey(1), seg0, seg0)
    g_tx = optax.adamw(2e-4, b1=0.8, b2=0.99, weight_decay=0.01)
    d_tx = optax.adamw(2e-4, b1=0.8, b2=0.99, weight_decay=0.01)
    state = GanState(
        g_params=g_params, d_params={"params": d_vars["params"]},
        d_stats=d_vars.get("batch_stats", {}),
        g_opt=g_tx.init(g_params), d_opt=d_tx.init({"params": d_vars["params"]}),
        step=jnp.zeros((), jnp.int32),
    )
    step = make_gan_step(gen, disc, g_tx, d_tx, MelConfig(), d_first=d_first)
    state, meta = step(state, seg0)  # compile
    float(meta["mel_l1"])

    curve = []
    t0 = time.perf_counter()
    pending = None
    for i in range(steps):
        state, meta = step(state, sample_batch())
        if pending is not None and (i % 10 == 0):
            curve.append(round(float(pending), 5))
        pending = meta["mel_l1"]
    curve.append(round(float(pending), 5))
    wall = time.perf_counter() - t0
    return {
        "d_first": d_first,
        "steps": steps,
        "steps_per_sec": round(steps / wall, 3),
        "mel_l1_curve": curve,
        "mel_l1_final10_mean": round(float(np.mean(curve[-10:])), 5),
    }


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    from xva_trainer_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache(os.path.dirname(os.path.abspath(__file__)))
    results = {
        "g_first_stale_d": run_variant(False, steps),
        "d_first_reference": run_variant(True, steps),
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "ab_hifigan.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({
        k: {kk: vv for kk, vv in v.items() if kk != "mel_l1_curve"}
        for k, v in results.items()
    }, indent=2))


if __name__ == "__main__":
    main()
