"""Load the reference's pretrained torch checkpoints into flax param trees.

The product is *fine-tuning*: xVAPitch training warm-starts from the shipped
``xVAPitch_5820651.pt`` base (reference xva_train.py:104-131,250), HiFi-GAN
stage 5 always starts from the ``g_``/``do_`` [male]/[female] checkpoints
("never from scratch", reference hifigan/xva_train.py:276-277), and every
embedding tool depends on ``speaker_rep.pt``
(speaker_representation/main.py:226-261). These functions bridge those
artifacts to the flax models, torch-free (interop.torch_io).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from .mapping import apply_import
from .torch_io import load_torch_pt
from .xvapitch_map import (
    hifigan_decoder_rules,
    period_disc_rules,
    scale_disc_rules,
    vits_disc_rules,
    xvapitch_generator_rules,
)


def _overlay(template: Dict, imported: Dict) -> Dict:
    """Fill a full param tree: imported leaves where present, template
    elsewhere (e.g. modules absent from the checkpoint)."""

    def walk(t, i):
        if isinstance(t, dict):
            return {
                k: walk(v, i.get(k)) if isinstance(i, dict) else v
                for k, v in t.items()
            }
        if i is None:
            return t
        arr = np.asarray(i)
        tshape = tuple(np.shape(t))
        if tuple(arr.shape) != tshape:
            raise ValueError(f"shape mismatch: ckpt {arr.shape} vs model {tshape}")
        return arr
    return walk(template, imported)


def _coverage(imported: Dict, template: Dict, prefix=()) -> list:
    """Paths present in template but not imported (diagnostic)."""
    out = []
    if isinstance(template, dict):
        for k, v in template.items():
            sub = imported.get(k) if isinstance(imported, dict) else None
            out += _coverage(sub if sub is not None else {}, v, prefix + (k,))
        return out
    if imported == {}:
        out.append("/".join(prefix))
    return out


def extract_state_dict(ckpt: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Reference checkpoints store the model under 'model' (training ckpts,
    xva_train.py:952-963) or are a bare state dict (exports)."""
    for key in ("model", "state_dict", "generator"):
        if key in ckpt and isinstance(ckpt[key], dict):
            return ckpt[key]
    return ckpt


def load_xvapitch_base(
    path: str,
    g_template: Optional[Dict] = None,
    d_template: Optional[Dict] = None,
):
    """xVAPitch base checkpoint -> (generator params, discriminator params).

    Either may be None in the checkpoint-less export format; discriminator
    keys exist only in full training checkpoints.
    """
    sd = extract_state_dict(load_torch_pt(path))
    g = apply_import(sd, xvapitch_generator_rules(), strict=True)
    has_disc = any(k.startswith("disc.") for k in sd)
    d = apply_import(sd, vits_disc_rules(), strict=True) if has_disc else None
    if g_template is not None:
        g = {"params": _overlay(g_template["params"], g["params"])}
    if d is not None and d_template is not None:
        d = {"params": _overlay(d_template["params"], d["params"])}
    return g, d


def v2_generator_rules():
    """Standalone v2 HiFi-GAN generator (reference python/hifigan/models.py:81-138):
    weight-normed conv_pre/conv_post (with bias), no cond layer."""
    return hifigan_decoder_rules(
        tp="", fp=(), cond=False, pre_post_weight_norm=True, post_bias=True,
    )


def _strip_prefix_rules(rules, strip="."):
    # rules built with tp="" produce keys like ".conv_pre.weight" — normalize
    out = []
    for r in rules:
        tk = r.torch_key.lstrip(".")
        out.append(
            type(r)(tk, r.flax_path, r.kind, scale_path=r.scale_path,
                    tshape=r.tshape)
        )
    return out


def load_hifigan_generator(path: str, template: Optional[Dict] = None):
    """g_ checkpoint -> flax Generator params (reference utils.py load g_)."""
    ckpt = load_torch_pt(path)
    sd = ckpt.get("generator", ckpt)
    rules = _strip_prefix_rules(v2_generator_rules())
    params = apply_import(sd, rules, strict=True)
    if template is not None:
        params = {"params": _overlay(template["params"], params["params"])}
    return params


def v2_discriminator_rules():
    """do_ checkpoint: mpd.discriminators.N + msd.discriminators.N ->
    flax HifiganDiscriminator (MultiPeriodDiscriminator_0 + MultiScaleDiscriminator_0).

    The MSD's first sub-disc uses spectral norm in both frameworks; its
    torch params (weight_orig/weight_u/...) do not map onto the flax
    power-iteration state, so it is imported via effective-weight
    recombination too.
    """
    rules = []
    for j in range(5):
        rules += period_disc_rules(
            f"mpd.discriminators.{j}",
            ("MultiPeriodDiscriminator_0", f"DiscriminatorP_{j}"),
        )
    for j in range(1, 3):  # weight-normed MSD discs
        rules += scale_disc_rules(
            f"msd.discriminators.{j}",
            ("MultiScaleDiscriminator_0", f"DiscriminatorS_{j}"),
            7,
        )
    return rules


def load_speaker_encoder(path: str, template: Optional[Dict] = None):
    from .speaker_map import speaker_encoder_rules

    ckpt = load_torch_pt(path)
    sd = ckpt.get("model", ckpt)
    params = apply_import(sd, speaker_encoder_rules(), strict=True)
    if template is not None:
        params = {"params": _overlay(template["params"], params["params"])}
    return params
