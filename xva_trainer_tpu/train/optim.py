"""Optimizer constructions (optax) matching the reference trainers.

- FastPitch: LAMB, base lr 0.1, wd 1e-6, Noam inverse-sqrt warmup 1000 steps
  (reference python/fastpitch1_1/lamb.py + xva_train.py:697-705,1252-1261),
  per-stage parameter freezing (xva_train.py:589-672) via optax.multi_transform.
- HiFi-GAN / xVAPitch GANs: AdamW pairs, betas (0.8, 0.99); HiFi-GAN lr 2e-4
  with ExponentialLR γ=0.999 per epoch (python/hifigan/xva_train.py:451-567);
  xVAPitch gen 1.75e-4 / disc 2e-4, wd 0.01, γ=0.999875 per step
  (python/xvapitch/training_util.py:4-71).
- Gradient accumulation via optax.MultiSteps (the reference's gam loop,
  python/xvapitch/xva_train.py:721-736).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax


def noam_warmup_schedule(base_lr: float, warmup_steps: int) -> optax.Schedule:
    """lr * (step/warmup^1.5) during warmup else lr / sqrt(step)."""

    def schedule(step):
        step = jnp.maximum(step.astype(jnp.float32), 1.0)
        if warmup_steps == 0:
            return jnp.full_like(step, base_lr)
        scale = jnp.where(
            step > warmup_steps,
            1.0 / jnp.sqrt(step),
            step / (warmup_steps**1.5),
        )
        return base_lr * scale

    return schedule


def make_fastpitch_optimizer(
    base_lr: float = 0.1,
    weight_decay: float = 1e-6,
    warmup_steps: int = 1000,
    grad_accum: int = 1,
    freeze_mask: Optional[Callable] = None,
) -> optax.GradientTransformation:
    """LAMB + warmup (+ optional per-stage freeze mask over the param tree).

    freeze_mask: params-pytree → pytree of 'train'/'freeze' labels.
    """
    tx = optax.lamb(
        learning_rate=noam_warmup_schedule(base_lr, warmup_steps),
        weight_decay=weight_decay,
    )
    if freeze_mask is not None:
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, freeze_mask
        )
    if grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
    return tx


def make_gan_optimizer(
    lr: float,
    *,
    betas=(0.8, 0.99),
    weight_decay: float = 0.01,
    gamma: float = 0.999875,
    decay_every: int = 1,
    grad_accum: int = 1,
    kind: str = "adamw",
) -> optax.GradientTransformation:
    """AdamW (default) or Lion with per-`decay_every`-steps exponential decay.

    kind="lion" mirrors the reference's --lion flag scaling exactly: lr/5,
    weight_decay*5, same betas (training_util.py:45-51).
    """

    if kind == "lion":
        lr, weight_decay = lr / 5.0, weight_decay * 5.0
    elif kind != "adamw":
        raise ValueError(f"unknown optimizer kind {kind!r} "
                         "(expected 'adamw' or 'lion')")

    def schedule(step):
        return lr * gamma ** (step // decay_every)

    if kind == "lion":
        tx = optax.lion(schedule, b1=betas[0], b2=betas[1],
                        weight_decay=weight_decay)
    else:
        tx = optax.adamw(schedule, b1=betas[0], b2=betas[1],
                         weight_decay=weight_decay)
    if grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
    return tx


def make_lion_optimizer(lr: float = 2e-5, weight_decay: float = 0.01):
    """Bare Lion (reference training_util.py:24-47 optional path)."""
    return optax.lion(lr, weight_decay=weight_decay)


# ---- FastPitch per-stage freeze labels (reference xva_train.py:589-672) ----

_STAGE_FROZEN_MODULES = {
    1: ["duration_predictor", "decoder", "pitch_predictor", "pitch_emb",
        "energy_predictor", "energy_emb", "proj"],
    2: ["attention", "decoder", "pitch_predictor", "pitch_emb",
        "energy_predictor", "energy_emb", "proj"],
    3: ["attention", "duration_predictor"],
    4: ["attention", "duration_predictor", "pitch_predictor", "pitch_emb",
        "energy_predictor", "energy_emb"],
}


def fastpitch_stage_mask(stage: int):
    """params pytree → 'train'/'freeze' labels for optax.multi_transform."""
    frozen = _STAGE_FROZEN_MODULES[stage]

    def label(params):
        flat = jax.tree_util.tree_flatten_with_path(params)[0]

        def path_label(path):
            keys = [getattr(p, "key", "") for p in path]
            return "freeze" if any(k in frozen for k in keys) else "train"

        labels = [path_label(p) for p, _ in flat]
        treedef = jax.tree_util.tree_structure(params)
        return jax.tree_util.tree_unflatten(treedef, labels)

    return label
