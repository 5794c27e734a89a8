"""xVAPitch (VITS + pitch conditioning) — the v3 flagship model, in flax.

Parity target: reference python/xvapitch/model.py (xVAPitch: init :40-215,
train_step :681-905, infer :417-599, voice_conversion :602-622) with the
"big" configuration shipped with the app (latent 256, 12-dim language
embedding over 31 languages, 512-d speaker d-vectors).

TPU-first deltas:
- MAS runs on device (ops/mas.py lax.scan DP) instead of host numpy —
  no GPU→CPU→GPU round trip per step (reference model.py:775-788).
- random 32-frame decoder segments via vmapped dynamic_slice (static shapes).
- everything channels-last (B, T, C).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.mas import maximum_path
from ..hifigan.models import Generator as HifiganGenerator, HifiganConfig
from .modules import (
    PosteriorEncoder,
    RelativePositioningPitchEnergyEncoder,
    ResidualCouplingBlocks,
    ReversalClassifier,
    StochasticDurationPredictor,
    TextEncoder,
    sequence_mask,
)

NUM_LANGUAGES = 31  # reference python/xvapitch/text/__init__.py:5-37


@dataclasses.dataclass(frozen=True)
class XVAPitchConfig:
    n_vocab: int = 524  # len(ALL_SYMBOLS)
    big: bool = True
    pitch: bool = True
    energy: bool = False
    # language-adversarial reversal classifier — off in the app path
    # (reference get_argparse --mltts_rc default 0, xva_train.py:1108), and
    # the shipped base checkpoint carries no classifier params.
    mltts_rc: bool = False
    pe_scaling: float = 0.1   # pitch conditioning scale (inference parity)
    lang_w: float = 1.0
    d_vector_dim: int = 512
    spec_segment_size: int = 32
    hop_length: int = 256
    num_languages: int = NUM_LANGUAGES
    # structural depths (reference values; reducible for tests/dryruns)
    text_layers: int = 10
    posterior_layers: int = 16
    flow_wn_layers: int = 4
    num_flows: int = 4
    sdp_flows: int = 4
    pitch_layers: int = 3
    # decoder (HiFi-GAN MRF)
    upsample_rates: tuple = (8, 8, 2, 2)
    upsample_kernel_sizes: tuple = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: tuple = (3, 7, 11)
    # inference: the reference forces inference_noise_scale=0 right before
    # sampling (reference model.py:549-550), so app-parity synthesis is
    # deterministic at the prior mean; 0.333 is opt-in only.
    inference_noise_scale: float = 0.0
    inference_noise_scale_dp: float = 0.333
    length_scale: float = 1.0

    @property
    def latent_size(self) -> int:
        return 256 if self.big else 192

    @property
    def lang_emb_dim(self) -> int:
        return 12 if self.big else 4


def rand_segments(x, x_lengths, segment_size, rng):
    """Random per-item (segment_size)-frame slices (reference util.py:145-163).

    x: (B, T, C) → (B, segment_size, C), slice start ids (B,).
    """
    B, T, C = x.shape
    max_start = jnp.maximum(x_lengths - segment_size, 0)
    u = jax.random.uniform(rng, (B,))
    starts = (u * (max_start + 1).astype(jnp.float32)).astype(jnp.int32)
    starts = jnp.minimum(starts, jnp.maximum(T - segment_size, 0))

    def slice_one(xi, s):
        return jax.lax.dynamic_slice_in_dim(xi, s, segment_size, axis=0)

    return jax.vmap(slice_one)(x, starts), starts


def segment(x, starts, segment_size):
    """Fixed-size slices at given starts (reference util.py:165-178)."""

    def slice_one(xi, s):
        return jax.lax.dynamic_slice_in_dim(xi, s, segment_size, axis=0)

    return jax.vmap(slice_one)(x, starts)


class XVAPitch(nn.Module):
    cfg: XVAPitchConfig = XVAPitchConfig()

    def setup(self):
        c = self.cfg
        latent = c.latent_size
        self.emb_l = nn.Embed(c.num_languages, c.lang_emb_dim)
        self.text_encoder = TextEncoder(
            c.n_vocab, latent, latent, 768, 2, c.text_layers, 3, 0.1,
            language_emb_dim=c.lang_emb_dim,
        )
        self.posterior_encoder = PosteriorEncoder(
            513, latent, latent, 5, 1, c.posterior_layers,
            cond_channels=c.d_vector_dim,
        )
        self.flow = ResidualCouplingBlocks(
            latent, latent, 5, 1, c.flow_wn_layers, num_flows=c.num_flows,
            cond_channels=c.d_vector_dim,
        )
        self.duration_predictor = StochasticDurationPredictor(
            latent, latent, 3, 0.5, c.sdp_flows,
            cond_channels=c.d_vector_dim, language_emb_dim=c.lang_emb_dim,
        )
        self.waveform_decoder = HifiganGenerator(
            HifiganConfig(
                resblock_kernel_sizes=c.resblock_kernel_sizes,
                upsample_rates=c.upsample_rates,
                upsample_kernel_sizes=c.upsample_kernel_sizes,
                upsample_initial_channel=c.upsample_initial_channel,
                in_channels=latent,
                cond_channels=c.d_vector_dim,
                conv_pre_weight_norm=False,
                conv_post_weight_norm=False,
                conv_post_bias=False,
            )
        )
        if c.pitch:
            self.pitch_predictor = RelativePositioningPitchEnergyEncoder(
                hidden_channels=latent + c.lang_emb_dim,
                hidden_channels_ffn=768, num_heads=2, num_layers=c.pitch_layers,
                kernel_size=3, dropout_p=0.1,
                conditioning_emb_dim=c.d_vector_dim,
            )
            self.pitch_emb = nn.Conv(latent, (3,), padding="SAME")
        if c.mltts_rc:
            self.reversal_classifier = ReversalClassifier(
                latent, latent, c.num_languages
            )

    # ---------------- training forward ----------------

    def train_step(
        self,
        tokens,          # (B, T_text) int32
        text_lengths,    # (B,)
        linear,          # (B, T_spec, 513)
        spec_lengths,    # (B,)
        pitch,           # (B, 1, T_spec)
        energy,          # (B, T_spec) — unused unless cfg.energy
        waveform,        # (B, T_spec*hop, 1)
        d_vectors,       # (B, 512)
        language_ids,    # (B,)
        *,
        deterministic: bool = False,
    ) -> Dict[str, Any]:
        """Generator-side forward (reference model.py:681-905)."""
        c = self.cfg
        g = d_vectors
        lang_emb = self.emb_l(language_ids) * c.lang_w  # (B, 12)

        z, m_q, logs_q, y_mask = self.posterior_encoder(
            linear, spec_lengths, g=g, deterministic=deterministic
        )
        x, x_emb, x_mask = self.text_encoder(
            tokens, text_lengths, lang_emb, deterministic=deterministic
        )
        m_p, logs_p = self.text_encoder.stats(x, x_mask)

        z_p = self.flow(z, y_mask, g=g, deterministic=deterministic)

        lang_prediction = None
        if c.mltts_rc:
            lang_prediction = self.reversal_classifier(z_p)

        if c.pitch:
            # condition the prior on ground-truth pitch (reference :758-762)
            pitch_cond = self.pitch_emb(jnp.swapaxes(pitch, 1, 2)) * c.pe_scaling
            z_p = z_p - pitch_cond

        # ---- MAS (on device) ----
        sg = jax.lax.stop_gradient
        o_scale = jnp.exp(-2.0 * sg(logs_p))  # (B, T_text, C)
        zp2 = sg(z_p)
        logp1 = jnp.sum(
            -0.5 * math.log(2 * math.pi) - sg(logs_p), axis=2
        )[:, :, None]
        logp2 = jnp.einsum("btc,bsc->bts", o_scale, -0.5 * zp2**2)
        logp3 = jnp.einsum("btc,bsc->bts", sg(m_p) * o_scale, zp2)
        logp4 = jnp.sum(-0.5 * sg(m_p) ** 2 * o_scale, axis=2)[:, :, None]
        logp = logp1 + logp2 + logp3 + logp4  # (B, T_text, T_spec)
        attn_mask = x_mask[:, :, 0][:, :, None] * y_mask[:, :, 0][:, None, :]
        attn = sg(maximum_path(logp, attn_mask))  # (B, T_text, T_spec)

        attn_durations = attn.sum(axis=2)[..., None]  # (B, T_text, 1)
        # detach_dp_input semantics (reference model.py:794-802): x and g are
        # detached, but lang_emb is deliberately NOT — the language embedding
        # trains through the duration NLL
        nll_dur = self.duration_predictor(
            sg(x), x_mask, dr=attn_durations, g=sg(g), lang_emb=lang_emb,
            deterministic=deterministic,
        )
        loss_duration = nll_dur / jnp.sum(x_mask)

        w_ceil = jnp.ceil(attn_durations[..., 0] * x_mask[..., 0])  # (B, T_text)

        pitch_tgt = pitch_pred = None
        if c.pitch:
            pitch_tgt = sg(_average_over_durs(pitch, w_ceil))  # (B, 1, T_text)
            pitch_pred = self.pitch_predictor(
                sg(x), text_lengths, speaker_emb=g, deterministic=deterministic
            )  # (B, T_text, 1)
            pitch_pred = jnp.swapaxes(pitch_pred, 1, 2)  # (B, 1, T_text)

        # expand prior stats to frame rate
        m_p_exp = jnp.einsum("bts,btc->bsc", attn, m_p)
        logs_p_exp = jnp.einsum("bts,btc->bsc", attn, logs_p)

        z_slice, slice_ids = rand_segments(
            z, spec_lengths, c.spec_segment_size, self.make_rng("segments")
        )
        o = self.waveform_decoder(z_slice, g)
        wav_seg = segment(waveform, slice_ids * c.hop_length,
                          c.spec_segment_size * c.hop_length)

        return {
            "model_outputs": o,                 # (B, 8192, 1)
            "waveform_seg": wav_seg,
            "z": z,
            "z_p": z_p,
            "m_p": m_p_exp,
            "logs_p": logs_p_exp,
            "m_q": m_q,
            "logs_q": logs_q,
            "y_mask": y_mask,
            "x_mask": x_mask,
            "loss_duration": loss_duration,
            "pitch_tgt": pitch_tgt,
            "pitch_pred": pitch_pred,
            "lang_prediction": lang_prediction,
            "attn_durations": attn_durations[..., 0],
        }

    def train_hifi_only(self, linear, spec_lengths, waveform, d_vectors,
                        *, deterministic: bool = False):
        """hifi_only stage: posterior → decoder only (reference :649-679)."""
        c = self.cfg
        z, m_q, logs_q, y_mask = self.posterior_encoder(
            linear, spec_lengths, g=d_vectors, deterministic=deterministic
        )
        z_slice, slice_ids = rand_segments(
            z, spec_lengths, c.spec_segment_size, self.make_rng("segments")
        )
        o = self.waveform_decoder(z_slice, d_vectors)
        wav_seg = segment(waveform, slice_ids * c.hop_length,
                          c.spec_segment_size * c.hop_length)
        return {"model_outputs": o, "waveform_seg": wav_seg,
                "m_q": m_q, "logs_q": logs_q}

    # ---------------- inference ----------------

    def infer(
        self,
        tokens,           # (B, T_text)
        d_vector,         # (B, 512)
        language_id,      # (B,)
        x_lengths=None,   # (B,) — defaults to counting nonzero tokens
        *,
        pacing: float = 1.0,
        max_frames: int = 1024,
        deterministic: bool = True,
    ):
        """text → waveform (reference infer :417-599)."""
        c = self.cfg
        B, T_text = tokens.shape
        if x_lengths is None:
            x_lengths = jnp.maximum(
                jnp.sum((tokens > 0).astype(jnp.int32), axis=1), 1
            )
        g = d_vector
        lang_emb = self.emb_l(language_id) * c.lang_w

        x, x_emb, x_mask = self.text_encoder(
            tokens, x_lengths, lang_emb, deterministic=deterministic
        )
        m_p, logs_p = self.text_encoder.stats(x, x_mask)

        logw = self.duration_predictor(
            x, x_mask, g=g, lang_emb=lang_emb, reverse=True,
            noise_scale=c.inference_noise_scale_dp, deterministic=deterministic,
        )  # (B, T_text, 1)
        w = jnp.exp(logw[..., 0]) * x_mask[..., 0] * c.length_scale * pacing
        w_ceil = jnp.ceil(w)
        y_lengths = jnp.clip(jnp.sum(w_ceil, axis=1).astype(jnp.int32), 1, max_frames)
        y_mask = sequence_mask(y_lengths, max_frames)

        attn = _generate_path(w_ceil, x_mask[..., 0], max_frames)  # (B,T_text,F)

        m_p_exp = jnp.einsum("btf,btc->bfc", attn, m_p)
        logs_p_exp = jnp.einsum("btf,btc->bfc", attn, logs_p)

        if c.pitch:
            pitch_pred = self.pitch_predictor(
                x, x_lengths, speaker_emb=g, deterministic=deterministic
            )  # (B, T_text, 1)
            # expand per-token pitch to frames and add as prior residual
            pitch_frames = jnp.einsum("btf,btc->bfc", attn, pitch_pred)
            pitch_cond = self.pitch_emb(pitch_frames) * c.pe_scaling
        else:
            pitch_cond = 0.0

        noise = jax.random.normal(self.make_rng("noise"), m_p_exp.shape)
        z_p = m_p_exp + noise * jnp.exp(logs_p_exp) * c.inference_noise_scale
        z_p = z_p + pitch_cond
        z = self.flow(z_p * y_mask, y_mask, g=g, reverse=True,
                      deterministic=deterministic)
        wav = self.waveform_decoder(z * y_mask, g)  # (B, F*hop, 1)
        return {"wav": wav[..., 0], "y_lengths": y_lengths,
                "durations": w_ceil}

    def voice_conversion(self, linear, spec_lengths, src_emb, tgt_emb,
                         *, deterministic: bool = True):
        """posterior(src) → flow fwd (src) → flow rev (tgt) → decode
        (reference :602-622)."""

        def norm(e):
            return e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-8)

        g_src, g_tgt = norm(src_emb), norm(tgt_emb)
        z, _, _, y_mask = self.posterior_encoder(
            linear, spec_lengths, g=g_src, deterministic=deterministic
        )
        z_p = self.flow(z, y_mask, g=g_src, deterministic=deterministic)
        z_hat = self.flow(z_p, y_mask, g=g_tgt, reverse=True,
                          deterministic=deterministic)
        return self.waveform_decoder(z_hat * y_mask, g_tgt)[..., 0]

    def __call__(self, tokens, text_lengths, linear, spec_lengths, pitch,
                 energy, waveform, d_vectors, language_ids):
        return self.train_step(
            tokens, text_lengths, linear, spec_lengths, pitch, energy,
            waveform, d_vectors, language_ids, deterministic=True,
        )


# duration-bucketed nonzero-mean pooling: identical math to FastPitch's
# average_pitch (fastpitch/model.py:76-96) — one implementation, two models
from ..fastpitch.model import average_pitch as _average_over_durs  # noqa: E402


def _generate_path(durs: jnp.ndarray, x_mask: jnp.ndarray, max_frames: int):
    """durations (B, T_text) → monotonic path (B, T_text, max_frames)
    (reference util.py generate_path)."""
    cum = jnp.cumsum(durs, axis=1)
    prev = jnp.pad(cum[:, :-1], ((0, 0), (1, 0)))
    frames = jnp.arange(max_frames)[None, None, :]
    path = (frames >= prev[:, :, None]) & (frames < cum[:, :, None])
    return path.astype(jnp.float32) * x_mask[:, :, None]
