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
from .xvapitch_map import vits_disc_rules, xvapitch_generator_rules


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


def load_hifigan_generator(path: str, template: Optional[Dict] = None):
    """g_ checkpoint -> flax Generator params (reference utils.py load g_)."""
    from .hifigan_map import v2_generator_rules

    ckpt = load_torch_pt(path)
    sd = ckpt.get("generator", ckpt)
    params = apply_import(sd, v2_generator_rules(), strict=True)
    if template is not None:
        params = {"params": _overlay(template["params"], params["params"])}
    return params


def load_hifigan_discriminators(path: str, template: Optional[Dict] = None):
    """do_ checkpoint -> flax HifiganDiscriminator variables
    {'params': ..., 'batch_stats': ...} plus host metadata (steps/epoch).

    MPD + the two weight-normed MSD discs map by rules; the spectral-normed
    MSD disc 0 maps via effective-weight + sigma import
    (hifigan_map.import_msd_spectral)."""
    from .hifigan_map import import_msd_spectral, v2_mpd_rules, v2_msd_wn_rules

    ckpt = load_torch_pt(path)
    sd = {}
    for group in ("mpd", "msd"):
        for k, v in ckpt[group].items():
            sd[f"{group}.{k}"] = v
    params = apply_import(sd, v2_mpd_rules() + v2_msd_wn_rules(), strict=True)
    s_params, s_stats = import_msd_spectral(sd)
    msd = params["params"].setdefault("MultiScaleDiscriminator_0", {})
    msd["DiscriminatorS_0"] = s_params
    variables = {
        "params": params["params"],
        "batch_stats": {
            "MultiScaleDiscriminator_0": {"DiscriminatorS_0": s_stats}
        },
    }
    if template is not None:
        variables["params"] = _overlay(template["params"], variables["params"])
    meta = {k: ckpt[k] for k in ("steps", "epoch") if k in ckpt}
    return variables, meta


def load_speaker_encoder(path: str, template: Optional[Dict] = None):
    """speaker_rep.pt -> flax variables {'params', 'batch_stats'}
    (reference speaker_representation/main.py:226-261 load)."""
    from .speaker_map import speaker_encoder_rules

    ckpt = load_torch_pt(path)
    sd = ckpt.get("model", ckpt)
    variables = apply_import(sd, speaker_encoder_rules(), strict=True)
    if template is not None:
        variables["params"] = _overlay(template["params"], variables["params"])
        if "batch_stats" in template:
            variables["batch_stats"] = _overlay(
                template["batch_stats"], variables["batch_stats"]
            )
    return variables
