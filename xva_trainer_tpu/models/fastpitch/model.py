"""FastPitch 1.1 acoustic model in flax (TPU-first, static shapes).

Parity target: reference python/fastpitch1_1/fastpitch/model.py (FastPitch,
regulate_len:59-79, average_pitch:82-100, staged forward:325-390, infer:426-482).
Differences by design:
- Staged forward is expressed as explicit methods (jit compiles one graph per
  stage) instead of data-dependent branches.
- MAS binarization runs on device (ops/mas.py) instead of host numpy.
- ``regulate_len`` emits a fixed ``mel_max_len`` so shapes stay static.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.mas import maximum_path
from .layers import ConvAttention, Conv1d, FFTransformer, TemporalPredictor


@dataclasses.dataclass(frozen=True)
class FastPitchConfig:
    n_mel_channels: int = 80
    n_symbols: int = 148
    padding_idx: int = 0
    symbols_embedding_dim: int = 384
    in_fft_n_layers: int = 6
    in_fft_n_heads: int = 1
    in_fft_d_head: int = 64
    in_fft_kernel_size: int = 3
    in_fft_filter_size: int = 1536
    out_fft_n_layers: int = 6
    out_fft_n_heads: int = 1
    out_fft_d_head: int = 64
    out_fft_kernel_size: int = 3
    out_fft_filter_size: int = 1536
    p_fft_dropout: float = 0.1
    p_fft_dropatt: float = 0.1
    predictor_filter_size: int = 256
    predictor_kernel_size: int = 3
    p_predictor_dropout: float = 0.1
    predictor_n_layers: int = 2
    pitch_embedding_kernel_size: int = 3
    energy_conditioning: bool = True
    energy_embedding_kernel_size: int = 3
    max_duration: float = 75.0


def regulate_len(
    durations: jnp.ndarray,
    enc_out: jnp.ndarray,
    pace: float = 1.0,
    mel_max_len: Optional[int] = None,
):
    """Expand text-rate features to frame rate (reference model.py:59-79).

    durations (B, T_text) float/int; enc_out (B, T_text, C).
    Returns (B, mel_max_len, C), dec_lens (B,).
    """
    reps = jnp.asarray(durations, jnp.float32) * pace
    reps = (reps + 0.5).astype(jnp.int32)
    dec_lens = reps.sum(axis=1)
    if mel_max_len is None:
        raise ValueError("mel_max_len must be static under jit")
    cums = jnp.cumsum(jnp.pad(reps, ((0, 0), (1, 0))), axis=1)  # (B, T+1)
    rng = jnp.arange(mel_max_len)[None, :, None]
    mult = (cums[:, None, :-1] <= rng) & (cums[:, None, 1:] > rng)
    enc_rep = jnp.einsum("bmt,btc->bmc", mult.astype(enc_out.dtype), enc_out)
    return enc_rep, jnp.minimum(dec_lens, mel_max_len)


def average_pitch(pitch: jnp.ndarray, durs: jnp.ndarray) -> jnp.ndarray:
    """Mean of nonzero pitch frames per text token (reference model.py:82-100).

    pitch (B, n_formants, T_mel); durs (B, T_text) → (B, n_formants, T_text).
    """
    ends = jnp.cumsum(durs, axis=1).astype(jnp.int32)  # (B, T_text)
    starts = jnp.pad(ends[:, :-1], ((0, 0), (1, 0)))
    nz_cums = jnp.pad(
        jnp.cumsum((pitch != 0.0).astype(jnp.float32), axis=2), ((0, 0), (0, 0), (1, 0))
    )
    cums = jnp.pad(jnp.cumsum(pitch, axis=2), ((0, 0), (0, 0), (1, 0)))
    T1 = cums.shape[-1]
    ends_c = jnp.clip(ends, 0, T1 - 1)[:, None, :]
    starts_c = jnp.clip(starts, 0, T1 - 1)[:, None, :]
    sums = jnp.take_along_axis(cums, ends_c, axis=2) - jnp.take_along_axis(
        cums, starts_c, axis=2
    )
    nelems = jnp.take_along_axis(nz_cums, ends_c, axis=2) - jnp.take_along_axis(
        nz_cums, starts_c, axis=2
    )
    return jnp.where(nelems == 0.0, 0.0, sums / jnp.maximum(nelems, 1.0))


class FastPitch(nn.Module):
    """FastPitch1.1: encoder FFT → (aligner | dur/pitch/energy) → decoder FFT."""

    cfg: FastPitchConfig = FastPitchConfig()

    def setup(self):
        c = self.cfg
        self.encoder = FFTransformer(
            n_layer=c.in_fft_n_layers,
            n_head=c.in_fft_n_heads,
            d_model=c.symbols_embedding_dim,
            d_head=c.in_fft_d_head,
            d_inner=c.in_fft_filter_size,
            kernel_size=c.in_fft_kernel_size,
            dropout=c.p_fft_dropout,
            dropatt=c.p_fft_dropatt,
            embed_input=True,
            n_embed=c.n_symbols,
            padding_idx=c.padding_idx,
        )
        self.decoder = FFTransformer(
            n_layer=c.out_fft_n_layers,
            n_head=c.out_fft_n_heads,
            d_model=c.symbols_embedding_dim,
            d_head=c.out_fft_d_head,
            d_inner=c.out_fft_filter_size,
            kernel_size=c.out_fft_kernel_size,
            dropout=c.p_fft_dropout,
            dropatt=c.p_fft_dropatt,
            embed_input=False,
        )
        self.duration_predictor = TemporalPredictor(
            c.predictor_filter_size,
            c.predictor_kernel_size,
            c.p_predictor_dropout,
            c.predictor_n_layers,
        )
        self.pitch_predictor = TemporalPredictor(
            c.predictor_filter_size,
            c.predictor_kernel_size,
            c.p_predictor_dropout,
            c.predictor_n_layers,
        )
        self.pitch_emb = Conv1d(
            c.symbols_embedding_dim, c.pitch_embedding_kernel_size
        )
        if c.energy_conditioning:
            self.energy_predictor = TemporalPredictor(
                c.predictor_filter_size,
                c.predictor_kernel_size,
                c.p_predictor_dropout,
                c.predictor_n_layers,
            )
            self.energy_emb = Conv1d(
                c.symbols_embedding_dim, c.energy_embedding_kernel_size
            )
        self.proj = nn.Dense(c.n_mel_channels)
        self.attention = ConvAttention(
            c.n_mel_channels, c.symbols_embedding_dim, n_att_channels=80
        )

    # ---------- alignment (training stage 1, also dur extraction) ----------

    def _alignment(self, tokens, input_lens, mel_tgt, mel_lens, attn_prior,
                   deterministic: bool):
        text_emb = self.encoder.embed(tokens)  # shared encoder token embedding
        key_pad = (tokens != self.cfg.padding_idx).astype(jnp.float32)
        attn_soft, attn_logprob = self.attention(
            mel_tgt, text_emb, key_pad, attn_prior
        )
        # MAS on device over (B, T_text, T_mel)
        t_text = tokens.shape[1]
        t_mel = mel_tgt.shape[1]
        mask = (
            (jnp.arange(t_text)[None, :, None] < input_lens[:, None, None])
            & (jnp.arange(t_mel)[None, None, :] < mel_lens[:, None, None])
        ).astype(jnp.float32)
        attn_hard = maximum_path(
            jnp.swapaxes(jax.lax.stop_gradient(attn_soft), 1, 2), mask
        )
        attn_hard = jnp.swapaxes(attn_hard, 1, 2)  # (B, T_mel, T_text)
        durations = attn_hard.sum(axis=1)  # (B, T_text)
        return attn_soft, attn_logprob, attn_hard, durations

    def stage1(self, tokens, input_lens, mel_tgt, mel_lens, attn_prior,
               *, deterministic: bool = True):
        """Aligner-only stage (reference forward:348-360 stage-1 return)."""
        enc_out, enc_mask = self.encoder(tokens, deterministic=deterministic)
        attn_soft, attn_logprob, attn_hard, durs = self._alignment(
            tokens, input_lens, mel_tgt, mel_lens, attn_prior, deterministic
        )
        return {
            "attn_soft": attn_soft,
            "attn_logprob": attn_logprob,
            "attn_hard": attn_hard,
            "durations": durs,
        }

    def stage2(self, tokens, input_lens, mel_tgt, mel_lens, attn_prior,
               *, deterministic: bool = True):
        """Duration-predictor stage (reference forward:368-374)."""
        enc_out, enc_mask = self.encoder(tokens, deterministic=deterministic)
        _, _, _, durs = self._alignment(
            tokens, input_lens, mel_tgt, mel_lens, attn_prior, deterministic
        )
        log_dur_pred = self.duration_predictor(
            enc_out, enc_mask, deterministic=deterministic
        )[..., 0]
        dur_pred = jnp.clip(jnp.exp(log_dur_pred) - 1, 0, self.cfg.max_duration)
        return {
            "log_dur_pred": log_dur_pred,
            "dur_pred": dur_pred,
            "durations": durs,
        }

    def stage2_from_durs(self, tokens, input_lens, durs_gt,
                         *, deterministic: bool = True):
        """Duration-predictor stage with pre-extracted durations (no aligner)."""
        enc_out, enc_mask = self.encoder(tokens, deterministic=deterministic)
        log_dur_pred = self.duration_predictor(
            enc_out, enc_mask, deterministic=deterministic
        )[..., 0]
        dur_pred = jnp.clip(jnp.exp(log_dur_pred) - 1, 0, self.cfg.max_duration)
        return {
            "log_dur_pred": log_dur_pred,
            "dur_pred": dur_pred,
            "durations": durs_gt,
        }

    def _pitch_energy(self, enc_out, enc_mask, pitch_dense, energy_dense,
                      dur_tgt, use_gt_pitch, deterministic):
        c = self.cfg
        pitch_pred = self.pitch_predictor(
            enc_out, enc_mask, deterministic=deterministic
        )  # (B, T_text, 1)
        pitch_tgt = average_pitch(pitch_dense, dur_tgt)  # (B, 1, T_text)
        pitch_in = (
            jnp.swapaxes(pitch_tgt, 1, 2) if use_gt_pitch else pitch_pred
        )
        enc_out = enc_out + self.pitch_emb(pitch_in)

        energy_pred = energy_tgt = None
        if c.energy_conditioning:
            energy_pred = self.energy_predictor(
                enc_out, enc_mask, deterministic=deterministic
            )[..., 0]
            energy_tgt = average_pitch(energy_dense[:, None, :], dur_tgt)
            energy_tgt = jnp.log(1.0 + energy_tgt)  # (B, 1, T_text)
            enc_out = enc_out + self.energy_emb(jnp.swapaxes(energy_tgt, 1, 2))
            energy_tgt = energy_tgt[:, 0, :]
        return enc_out, pitch_pred, pitch_tgt, energy_pred, energy_tgt

    def full(
        self,
        tokens,
        input_lens,
        mel_tgt,
        mel_lens,
        pitch_dense,
        energy_dense,
        attn_prior=None,
        durs_gt=None,
        *,
        use_gt_pitch: bool = True,
        mel_max_len: Optional[int] = None,
        run_aligner: bool = True,
        deterministic: bool = True,
    ):
        """Stages 3/4 forward (reference forward:325-390 full path)."""
        enc_out, enc_mask = self.encoder(tokens, deterministic=deterministic)
        if run_aligner:
            _, _, _, dur_tgt = self._alignment(
                tokens, input_lens, mel_tgt, mel_lens, attn_prior, deterministic
            )
        else:
            dur_tgt = durs_gt
        log_dur_pred = self.duration_predictor(
            enc_out, enc_mask, deterministic=deterministic
        )[..., 0]
        dur_pred = jnp.clip(jnp.exp(log_dur_pred) - 1, 0, self.cfg.max_duration)

        enc_out, pitch_pred, pitch_tgt, energy_pred, energy_tgt = (
            self._pitch_energy(
                enc_out, enc_mask, pitch_dense, energy_dense, dur_tgt,
                use_gt_pitch, deterministic,
            )
        )
        mel_max_len = mel_max_len or mel_tgt.shape[1]
        len_regulated, dec_lens = regulate_len(
            dur_tgt, enc_out, 1.0, mel_max_len
        )
        dec_out, dec_mask = self.decoder(
            len_regulated, seq_lens=dec_lens, deterministic=deterministic
        )
        mel_out = self.proj(dec_out)  # (B, T_mel, n_mel)
        return {
            "mel_out": mel_out,
            "dec_mask": dec_mask,
            "dur_pred": dur_pred,
            "log_dur_pred": log_dur_pred,
            "pitch_pred": pitch_pred,
            "pitch_tgt": pitch_tgt,
            "energy_pred": energy_pred,
            "energy_tgt": energy_tgt,
            "durations": dur_tgt,
            "dec_lens": dec_lens,
        }

    def infer(
        self,
        tokens,
        *,
        pace: float = 1.0,
        mel_max_len: int = 2048,
        pitch_transform=None,
        deterministic: bool = True,
    ):
        """Inference path (reference infer:426-482)."""
        c = self.cfg
        enc_out, enc_mask = self.encoder(tokens, deterministic=deterministic)
        log_dur_pred = self.duration_predictor(
            enc_out, enc_mask, deterministic=deterministic
        )[..., 0]
        dur_pred = jnp.clip(jnp.exp(log_dur_pred) - 1, 0, c.max_duration)
        pitch_pred = self.pitch_predictor(
            enc_out, enc_mask, deterministic=deterministic
        )
        if pitch_transform is not None:
            pitch_pred = pitch_transform(pitch_pred)
        enc_out = enc_out + self.pitch_emb(pitch_pred)
        if c.energy_conditioning:
            energy_pred = self.energy_predictor(
                enc_out, enc_mask, deterministic=deterministic
            )[..., 0]
            enc_out = enc_out + self.energy_emb(energy_pred[..., None])
        len_regulated, dec_lens = regulate_len(dur_pred, enc_out, pace, mel_max_len)
        dec_out, _ = self.decoder(
            len_regulated, seq_lens=dec_lens, deterministic=deterministic
        )
        mel_out = self.proj(dec_out)
        return {
            "mel_out": jnp.swapaxes(mel_out, 1, 2),  # (B, n_mel, T)
            "dec_lens": dec_lens,
            "dur_pred": dur_pred,
            "pitch_pred": pitch_pred,
        }

    def __call__(self, tokens, input_lens, mel_tgt, mel_lens, pitch_dense,
                 energy_dense, attn_prior=None, *, deterministic: bool = True):
        """Default = full stage-3/4 forward (used for init + graft entry)."""
        return self.full(
            tokens, input_lens, mel_tgt, mel_lens, pitch_dense, energy_dense,
            attn_prior, deterministic=deterministic,
        )
