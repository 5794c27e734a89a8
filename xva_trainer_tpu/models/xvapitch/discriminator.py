"""VITS discriminator: one scale discriminator + MPD periods [2,3,5,7,11]
(reference python/xvapitch/model.py:1590-1631; sub-discriminators are the
HiFi-GAN DiscriminatorS/DiscriminatorP, python/xvapitch/hifigan.py:266-360)."""
from __future__ import annotations

import flax.linen as nn

from ..hifigan.models import DiscriminatorP, DiscriminatorS, V3_SCALE_SPECS


class VitsDiscriminator(nn.Module):
    periods: tuple = (2, 3, 5, 7, 11)
    scale_specs: tuple = V3_SCALE_SPECS

    @nn.compact
    def __call__(self, x, x_hat=None):
        """x: fake (or sole) waveform (B, T, 1); x_hat: real waveform.
        Returns (x_scores, x_feats, x_hat_scores, x_hat_feats).

        The scale disc uses the v3 channel/stride spec (16→64→256→1024,
        stride 4 — reference python/xvapitch/model.py:1560-1568), which
        differs from the v2 HiFi-GAN MSD disc."""
        nets = [DiscriminatorS(use_spectral_norm=False, specs=self.scale_specs)] + [
            DiscriminatorP(p) for p in self.periods
        ]
        x_scores, x_feats = [], []
        xh_scores = [] if x_hat is not None else None
        xh_feats = [] if x_hat is not None else None
        for net in nets:
            s, f = net(x)
            x_scores.append(s)
            x_feats.append(f)
            if x_hat is not None:
                s2, f2 = net(x_hat)
                xh_scores.append(s2)
                xh_feats.append(f2)
        return x_scores, x_feats, xh_scores, xh_feats
