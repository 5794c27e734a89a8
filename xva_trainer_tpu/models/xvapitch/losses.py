"""xVAPitch losses (reference python/xvapitch/losses.py).

VitsGeneratorLoss (:18-324): mel L1 ×45 via the Tacotron-style 0-8kHz log-mel
(TorchSTFT semantics, audio.py:138-203), KL (:88-104), feature-matching ×2
(:64-73), LSGAN generator (:76-85), duration NLL, pitch MSE ×0.1 scaled by
batch (:225-252), language-adversarial CE, plus per-sample mel/kl/pitch
components for the loss-sorted resampling (:191-217).
VitsDiscriminatorLoss (:323-351): LSGAN.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ...ops.stft import DEFAULT_MEL, mel_spectrogram

MEL_LOSS_ALPHA = 45.0
PITCH_LOSS_SCALE = 0.1


# one source of truth for the GAN losses (identical math in both families)
from ..hifigan.models import (  # noqa: E402
    discriminator_loss as lsgan_discriminator_loss,
    feature_matching_loss,
    generator_adv_loss as lsgan_generator_loss,
)


def kl_loss(z_p, logs_q, m_p, logs_p, z_mask):
    """Prior/posterior KL (reference :88-104). All (B, T, C); z_mask (B, T, 1).
    Returns (scalar loss, per-sample sums)."""
    kl = logs_p - logs_q - 0.5
    kl = kl + 0.5 * (z_p - m_p) ** 2 * jnp.exp(-2.0 * logs_p)
    kl = kl * z_mask
    per_sample = kl.sum(axis=(1, 2))
    # Normalize by frame count only (reference losses.py:103 divides by
    # sum(z_mask), NOT frames*channels — the KL term is per-frame).
    return per_sample.sum() / jnp.maximum(z_mask.sum(), 1.0), per_sample


def language_prediction_loss(lang_prediction, language_ids, spec_lengths):
    """Masked CE over z_p frames (reference ReversalClassifier.loss)."""
    B, T, L = lang_prediction.shape
    mask = (jnp.arange(T)[None, :] < spec_lengths[:, None]).astype(jnp.float32)
    logp = jax.nn.log_softmax(lang_prediction, axis=-1)
    tgt = jax.nn.one_hot(language_ids, L)[:, None, :]
    ce = -(logp * tgt).sum(-1) * mask
    return ce.sum() / jnp.maximum(mask.sum(), 1.0)


def generator_loss(
    outputs: Dict,
    scores_disc_fake,
    feats_disc_fake,
    feats_disc_real,
    language_ids=None,
    spec_lengths=None,
    *,
    hifi_only: bool = False,
    use_pitch: bool = True,
    use_mltts_rc: bool = True,
):
    """Total generator loss + components (+ per-sample arrays for loss sorting)."""
    wav = outputs["waveform_seg"][..., 0]
    wav_hat = outputs["model_outputs"][..., 0]
    mel = mel_spectrogram(wav, DEFAULT_MEL)
    mel_hat = mel_spectrogram(wav_hat, DEFAULT_MEL)
    l1 = jnp.abs(mel - mel_hat)
    per_sample_mel = l1.sum(axis=(1, 2)) * MEL_LOSS_ALPHA
    loss_mel = l1.mean() * MEL_LOSS_ALPHA

    loss_gen = lsgan_generator_loss(scores_disc_fake)
    loss_feat = feature_matching_loss(feats_disc_real, feats_disc_fake)

    meta = {
        "loss_mel": loss_mel,
        "loss_gen": loss_gen,
        "loss_feat": loss_feat,
        "per_sample_mel": per_sample_mel,
    }
    if hifi_only:
        total = loss_mel + loss_gen + loss_feat
        meta["loss"] = total
        return total, meta

    loss_kl, per_sample_kl = kl_loss(
        outputs["z_p"], outputs["logs_q"], outputs["m_p"], outputs["logs_p"],
        outputs["y_mask"],
    )
    loss_duration = jnp.sum(outputs["loss_duration"])

    loss_pitch = 0.0
    if use_pitch and outputs.get("pitch_pred") is not None:
        mask = outputs["x_mask"][:, :, 0]  # (B, T_text)
        diff = (outputs["pitch_tgt"][:, 0, :] - outputs["pitch_pred"][:, 0, :]) ** 2
        diff = diff * mask
        meta["per_sample_pitch"] = diff.sum(axis=1)
        loss_pitch = diff.sum() / jnp.maximum(mask.sum(), 1.0)
        loss_pitch = loss_pitch / diff.shape[0] * PITCH_LOSS_SCALE

    lang_loss = 0.0
    if use_mltts_rc and outputs.get("lang_prediction") is not None:
        lang_loss = language_prediction_loss(
            outputs["lang_prediction"], language_ids, spec_lengths
        )

    total = loss_mel + loss_gen + loss_feat + loss_kl + loss_duration + loss_pitch + lang_loss
    meta.update(
        loss=total,
        loss_kl=loss_kl,
        loss_duration=loss_duration,
        loss_pitch=loss_pitch,
        lang_pred_loss=lang_loss,
        per_sample_kl=per_sample_kl,
    )
    return total, meta


def discriminator_loss(scores_real, scores_fake):
    loss = lsgan_discriminator_loss(scores_real, scores_fake)
    return loss, {"loss_disc": loss}
