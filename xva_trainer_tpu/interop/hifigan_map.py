"""Rule tables for the v2 HiFi-GAN checkpoints (g_ / do_ / .hg.pt).

Torch side: /root/reference/python/hifigan/models.py (Generator:81-138,
DiscriminatorP:140-177, DiscriminatorS:205-229, MSD:231-261) with
config_v1.json (no embedding conditioning). Flax side:
xva_trainer_tpu.models.hifigan.

g_ checkpoints hold {'generator': sd}; do_ hold {'mpd': sd, 'msd': sd,
'steps', 'epoch', ...} (reference hifigan/xva_train.py:285-296).
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from .mapping import Rule, _t2f
from .xvapitch_map import hifigan_decoder_rules, period_disc_rules, scale_disc_rules


def v2_generator_rules(tp: str = "", fp: Tuple[str, ...] = (),
                       num_ups: int = 4, num_kernels: int = 3,
                       num_dilations: int = 3) -> List[Rule]:
    """Standalone v2 generator: weight-normed conv_pre/conv_post with bias,
    no cond layer."""
    return hifigan_decoder_rules(
        tp=tp, fp=fp, num_ups=num_ups, num_kernels=num_kernels,
        num_dilations=num_dilations,
        cond=False, pre_post_weight_norm=True, post_bias=True,
    )


def v2_mpd_rules(tp: str = "mpd",
                 fp: Tuple[str, ...] = ("MultiPeriodDiscriminator_0",)) -> List[Rule]:
    rules: List[Rule] = []
    for j in range(5):
        rules += period_disc_rules(f"{tp}.discriminators.{j}",
                                   fp + (f"DiscriminatorP_{j}",))
    return rules


def v2_msd_wn_rules(tp: str = "msd",
                    fp: Tuple[str, ...] = ("MultiScaleDiscriminator_0",)) -> List[Rule]:
    """MSD discs 1 and 2 (weight norm). Disc 0 is spectral-normed — handled
    by import_msd_spectral below."""
    rules: List[Rule] = []
    for j in range(1, 3):
        rules += scale_disc_rules(f"{tp}.discriminators.{j}",
                                  fp + (f"DiscriminatorS_{j}",), 7)
    return rules


def import_msd_spectral(sd: Dict[str, np.ndarray], tp: str = "msd.discriminators.0"):
    """Spectral-normed MSD disc 0: torch stores weight_orig/weight_u/weight_v;
    flax nn.SpectralNorm stores a plain kernel plus batch_stats {u, sigma}.

    We import kernel = weight_orig (flax layout) and set
    sigma = u^T W_mat v (torch's power-iteration estimate) so that apply with
    update_stats=False reproduces torch's effective weight W/sigma exactly.

    Returns (params_subtree, batch_stats_subtree) keyed for
    HifiganDiscriminator's MultiScaleDiscriminator_0/DiscriminatorS_0.
    """
    params: Dict = {}
    stats: Dict = {}
    for i in range(8):  # convs.0-6 + conv_post
        tkey = f"{tp}.convs.{i}" if i < 7 else f"{tp}.conv_post"
        inner = f"Conv_{i}"
        w = np.asarray(sd[f"{tkey}.weight_orig"], np.float32)
        u = np.asarray(sd[f"{tkey}.weight_u"], np.float32)
        v = np.asarray(sd.get(f"{tkey}.weight_v"), np.float32) if f"{tkey}.weight_v" in sd else None
        wm = w.reshape(w.shape[0], -1)
        if v is None:
            # one power-iteration refinement from u
            v = wm.T @ u
            v /= max(np.linalg.norm(v), 1e-12)
        sigma = float(u @ (wm @ v))
        params[inner] = {
            "kernel": np.ascontiguousarray(_t2f(w, "conv1d")),
            "bias": np.asarray(sd[f"{tkey}.bias"], np.float32),
        }
        # flax SpectralNorm reshapes the kernel to (-1, out): torch's left
        # singular vector u (over the out axis) is flax's u row vector
        stats[f"SpectralNorm_{i}"] = {
            f"{inner}/kernel/sigma": np.float32(sigma),
            f"{inner}/kernel/u": u.reshape(1, -1).astype(np.float32),
        }
    return params, stats
