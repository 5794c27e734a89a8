"""Train + commit the default speech-enhancement weights (VERDICT r1 #6).

The reference ships a pretrained Asteroid DCCRNet blob
(python/audio_source_separation/model.py:16-42). This framework instead
trains its own complex-ratio-mask denoiser (models/enhance) on synthetic
noisy speech — fully reproducible from this script, no third-party blob —
and commits the small fp16 weight file the `ass` tool loads by default.

    python scripts/train_default_enhancer.py [steps]

Writes xva_trainer_tpu/assets/enhancer_default.npz (~3 MB) and prints the
held-out SI-SDR improvement.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xva_trainer_tpu.models.enhance.synth import SR, make_pair  # noqa: E402


def save_params_npz(params, path):
    from flax.traverse_util import flatten_dict

    flat = flatten_dict(params, sep="/")
    np.savez_compressed(
        path, **{k: np.asarray(v, np.float16) for k, v in flat.items()}
    )


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    from xva_trainer_tpu.models.enhance.model import (
        EnhanceConfig,
        SpeechEnhancer,
        si_sdr,
        train_enhancer,
    )
    from xva_trainer_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    rng = np.random.default_rng(0)
    # 10 minutes of paired training audio across SNRs
    noisy_parts, clean_parts = [], []
    for _ in range(60):
        ny, cy = make_pair(10.0, rng.uniform(0, 15), rng)
        noisy_parts.append(ny)
        clean_parts.append(cy)
    noisy = np.concatenate(noisy_parts)
    clean = np.concatenate(clean_parts)
    print(f"training data: {len(noisy)/SR:.0f}s, steps={steps}", flush=True)

    params, losses = train_enhancer(noisy, clean, steps=steps, batch=8)
    print(f"loss (neg SI-SDR): first={losses[0]:.2f} last10="
          f"{np.mean(losses[-10:]):.2f}", flush=True)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "xva_trainer_tpu", "assets",
        "enhancer_default.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    save_params_npz(params, out)
    print(f"saved {out} ({os.path.getsize(out)/1e6:.1f} MB)")

    # held-out eval
    import jax.numpy as jnp

    enh = SpeechEnhancer(params)
    rng_ev = np.random.default_rng(1234)
    gains = []
    for _ in range(5):
        ny, cy = make_pair(4.0, 5.0, rng_ev)
        est = enh.enhance(ny)
        L = min(len(est), len(cy))
        before = float(si_sdr(jnp.asarray(ny[:L]), jnp.asarray(cy[:L])))
        after = float(si_sdr(jnp.asarray(est[:L]), jnp.asarray(cy[:L])))
        gains.append(after - before)
        print(f"held-out: {before:.2f} dB → {after:.2f} dB", flush=True)
    print(f"mean SI-SDR gain: {np.mean(gains):.2f} dB")


if __name__ == "__main__":
    main()
