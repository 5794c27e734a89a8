"""FastPitch staged losses in JAX.

Parity targets:
- FastPitchLoss (reference python/fastpitch1_1/fastpitch/loss_function.py:51-168):
  stage 1 = aligner CTC (+ KL binarization with epoch warmup, trainer
  xva_train.py:792-798), stage 2 = log-duration MSE, stage 3 = pitch+energy
  MSE, stage 4 = mel MSE (mask = nonzero mel target).
- AttentionCTCLoss / AttentionBinarizationLoss (attn_loss_function.py:20-54).
  CTC uses optax.ctc_loss with blank id 0 and the monotonic target 1..key_len.

Trainer scales (xva_train.py:702-708): dur 0.1, pitch 0.1, attn 1.0,
energy 0.1; KL start epoch 0, warmup 100 epochs, weight 1.
"""
from __future__ import annotations

import jax.numpy as jnp
import optax

DUR_SCALE = 0.1
PITCH_SCALE = 0.1
ENERGY_SCALE = 0.1
ATTN_SCALE = 1.0
KL_WARMUP_EPOCHS = 100.0
BLANK_LOGPROB = -1.0


def _len_mask(lens, max_len):
    return (jnp.arange(max_len)[None, :] < lens[:, None]).astype(jnp.float32)


def attention_ctc_loss(attn_logprob, in_lens, out_lens):
    """Monotonic-alignment CTC over the aligner log-probs.

    attn_logprob: (B, T_mel, T_text); labels are 1..in_len per item, blank=0.
    """
    B, T_mel, T_text = attn_logprob.shape
    # Prepend the blank column (reference pads blank_logprob=-1 at key idx 0).
    logits = jnp.pad(
        attn_logprob, ((0, 0), (0, 0), (1, 0)), constant_values=BLANK_LOGPROB
    )
    # Exclude padded key positions from the per-frame softmax.
    key_valid = jnp.arange(T_text + 1)[None, None, :] <= in_lens[:, None, None]
    logits = jnp.where(key_valid, logits, -1e9)
    logit_paddings = 1.0 - _len_mask(out_lens, T_mel)
    labels = jnp.tile(jnp.arange(1, T_text + 1)[None, :], (B, 1))
    label_paddings = 1.0 - _len_mask(in_lens, T_text)
    per_item = optax.ctc_loss(
        logits, logit_paddings, labels, label_paddings, blank_id=0
    )
    return per_item.mean()


def attention_binarization_loss(attn_hard, attn_soft, eps=1e-12):
    """-mean log soft-prob under the hard path (attn_loss_function.py:47-54)."""
    sel = jnp.log(jnp.clip(attn_soft, min=eps)) * attn_hard
    return -sel.sum() / jnp.maximum(attn_hard.sum(), 1.0)


def stage1_loss(out, in_lens, out_lens, kl_weight: jnp.ndarray):
    attn_loss = attention_ctc_loss(out["attn_logprob"], in_lens, out_lens)
    bin_loss = attention_binarization_loss(out["attn_hard"], out["attn_soft"])
    loss = attn_loss * ATTN_SCALE + kl_weight * bin_loss
    return loss, {"loss": loss, "attn_loss": attn_loss, "kl_loss": bin_loss * kl_weight}


def stage2_loss(out, in_lens):
    T_text = out["log_dur_pred"].shape[1]
    dur_mask = _len_mask(in_lens, T_text)
    log_dur_tgt = jnp.log(out["durations"].astype(jnp.float32) + 1.0)
    mse = (out["log_dur_pred"] - log_dur_tgt) ** 2
    dur_loss = (mse * dur_mask).sum() / jnp.maximum(dur_mask.sum(), 1.0)
    loss = dur_loss * DUR_SCALE
    return loss, {"loss": loss, "duration_predictor_loss": dur_loss}


def stage3_loss(out, mel_tgt, in_lens):
    """Pitch + energy MSE (+ mel for logging parity with reference stage 3)."""
    mel_loss = _mel_mse(out["mel_out"], mel_tgt)
    T_text = out["pitch_pred"].shape[1]
    dur_mask = _len_mask(in_lens, T_text)
    pitch_pred = out["pitch_pred"][..., 0]  # (B, T_text)
    pitch_tgt = out["pitch_tgt"][:, 0, :]
    pitch_loss = ((pitch_pred - pitch_tgt) ** 2 * dur_mask).sum() / jnp.maximum(
        dur_mask.sum(), 1.0
    )
    energy_loss = (
        (out["energy_pred"] - out["energy_tgt"]) ** 2 * dur_mask
    ).sum() / jnp.maximum(dur_mask.sum(), 1.0)
    loss = mel_loss + pitch_loss * PITCH_SCALE + energy_loss * ENERGY_SCALE
    return loss, {
        "loss": loss,
        "mel_loss": mel_loss,
        "pitch_loss": pitch_loss,
        "energy_loss": energy_loss,
    }


def stage4_loss(out, mel_tgt):
    mel_loss = _mel_mse(out["mel_out"], mel_tgt)
    return mel_loss, {"loss": mel_loss, "mel_loss": mel_loss}


def _mel_mse(mel_out, mel_tgt):
    """MSE over nonzero-target positions (reference loss_function.py:105-112).

    mel_out/mel_tgt: (B, T_mel, n_mel) channels-last.
    """
    mel_mask = (mel_tgt != 0).astype(jnp.float32)
    mse = (mel_out - mel_tgt) ** 2 * mel_mask
    return mse.sum() / jnp.maximum(mel_mask.sum(), 1.0)
