"""ResNet34-SE "H/ASP" speaker encoder in flax (arXiv 2009.14153).

Parity target: reference python/xvapitch/speaker_representation/main.py:65-261
(clovaai/voxceleb_trainer lineage): pre-emphasis 0.97 → 16 kHz power-mel
(n_fft 512, win 400 hamming, hop 160, 64 HTK mels) → log(x+1e-6) → instance
norm → SE-ResNet34 [3,4,6,3]×[32,64,128,256] (with the reference's
conv→relu→bn ordering) → attentive statistics pooling → 512-d embedding;
10-crop ``compute_embedding`` (:226-261).

Inference-only on TPU: batched crops, fixed shapes. Powers speaker-embedding
extraction for the v3 dataset and the cluster/search tools.
"""
from __future__ import annotations

import functools
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.mel import mel_filterbank
from ...ops.stft import frame_signal

SAMPLE_RATE = 16000
N_FFT = 512
WIN = 400
HOP = 160
N_MELS = 64
EMB_DIM = 512


@functools.lru_cache(maxsize=None)
def _hamming_window(win: int = WIN, n_fft: int = N_FFT) -> np.ndarray:
    n = np.arange(win)
    w = 0.54 - 0.46 * np.cos(2 * np.pi * n / win)  # periodic (torch default)
    pad = (n_fft - win) // 2
    return np.pad(w, (pad, n_fft - win - pad)).astype(np.float32)


def spk_mel_spectrogram(y: jnp.ndarray) -> jnp.ndarray:
    """(B, T) 16 kHz wave → (B, 64, frames) power mel (torchaudio semantics:
    center=True reflect pad, power 2, HTK mel, no norm)."""
    # pre-emphasis with 1-sample reflect pad (reference PreEmphasis :7-17)
    y = jnp.concatenate([y[:, 1:2], y], axis=1)
    y = y[:, 1:] - 0.97 * y[:, :-1]

    T = y.shape[-1]
    num_frames = 1 + T // HOP
    y = jnp.pad(y, ((0, 0), (N_FFT // 2, N_FFT // 2)), mode="reflect")
    # exact framing requirement: HOP does not divide N_FFT (512/160), so the
    # quotient form under-counts by N_FFT % HOP samples
    need = (num_frames - 1) * HOP + N_FFT
    if y.shape[-1] < need:
        y = jnp.pad(y, ((0, 0), (0, need - y.shape[-1])))
    frames = frame_signal(y, N_FFT, HOP, num_frames)
    win = jnp.asarray(_hamming_window())
    spec = jnp.fft.rfft((frames * win).astype(jnp.float32), n=N_FFT, axis=-1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2  # (B, F, 257)
    fb = jnp.asarray(
        mel_filterbank(SAMPLE_RATE, N_FFT, N_MELS, 0.0, SAMPLE_RATE / 2,
                       htk=True, norm=None)
    )
    return jnp.einsum("mf,btf->bmt", fb, power)


class SEBasicBlock(nn.Module):
    planes: int
    stride: int = 1
    reduction: int = 8

    @nn.compact
    def __call__(self, x):
        # x (B, H, W, C) — NHWC
        residual = x
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=1, use_bias=False)(x)
        out = nn.relu(out)
        out = nn.BatchNorm(use_running_average=True)(out)
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False)(out)
        out = nn.BatchNorm(use_running_average=True)(out)
        # squeeze-excite
        se = out.mean(axis=(1, 2))  # (B, C)
        se = nn.relu(nn.Dense(self.planes // self.reduction)(se))
        se = jax.nn.sigmoid(nn.Dense(self.planes)(se))
        out = out * se[:, None, None, :]
        if residual.shape[-1] != self.planes or self.stride != 1:
            residual = nn.Conv(self.planes, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False)(x)
            residual = nn.BatchNorm(use_running_average=True)(residual)
        return nn.relu(out + residual)


class ResNetSpeakerEncoder(nn.Module):
    layers: tuple = (3, 4, 6, 3)
    num_filters: tuple = (32, 64, 128, 256)
    proj_dim: int = EMB_DIM

    @nn.compact
    def __call__(self, wav: jnp.ndarray, l2_norm: bool = False,
                 *, spectrogram: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """wav (B, T) at 16 kHz → (B, 512). Pass ``spectrogram`` (B, 64, T')
        to skip the on-device mel frontend (reference use_torch_spec=False)."""
        if spectrogram is None:
            x = spk_mel_spectrogram(wav)  # (B, 64, T')
        else:
            x = spectrogram
        x = jnp.log(x + 1e-6)
        # instance norm over time per mel channel (affine-free)
        mean = x.mean(axis=2, keepdims=True)
        var = x.var(axis=2, keepdims=True)
        x = (x - mean) / jnp.sqrt(var + 1e-5)
        x = x[..., None]  # (B, 64, T', 1) NHWC (H=mel)

        x = nn.Conv(self.num_filters[0], (3, 3), padding=1)(x)
        x = nn.relu(x)
        x = nn.BatchNorm(use_running_average=True)(x)
        for i, (nf, nl) in enumerate(zip(self.num_filters, self.layers)):
            for j in range(nl):
                stride = 2 if (i > 0 and j == 0) else 1
                x = SEBasicBlock(nf, stride)(x)
        # (B, 8, T'', 256) NHWC → (B, T'', 256*8) with torch's (C-major, H)
        # flatten order: reference reshapes (B, C, H, T) to (B, C*H, T)
        # (main.py:204), so channel index = c*H + h.
        B, H, T2, C = x.shape
        x = x.transpose(0, 2, 3, 1).reshape(B, T2, C * H)

        # attentive statistics pooling over time
        w = nn.Conv(128, (1,))(x)
        w = nn.relu(w)
        w = nn.BatchNorm(use_running_average=True)(w)
        w = nn.Conv(C * H, (1,))(w)
        w = jax.nn.softmax(w, axis=1)
        mu = jnp.sum(x * w, axis=1)
        sg = jnp.sqrt(jnp.clip(jnp.sum(x**2 * w, axis=1) - mu**2, min=1e-5))
        pooled = jnp.concatenate([mu, sg], axis=1)
        emb = nn.Dense(self.proj_dim)(pooled)
        if l2_norm:
            emb = emb / jnp.maximum(jnp.linalg.norm(emb, axis=1, keepdims=True), 1e-8)
        return emb


class SpeakerEncoder:
    """Host-facing wrapper: init, 10-crop embedding (reference :226-261)."""

    def __init__(self, params=None, seed: int = 0,
                 weights_path: Optional[str] = None):
        import os

        self.model = ResNetSpeakerEncoder()
        weights_path = weights_path or os.environ.get("XVA_SPEAKER_REP")
        self.pretrained = params is not None
        if params is None and weights_path and os.path.exists(weights_path):
            from ...interop.pretrained import load_speaker_encoder

            params = load_speaker_encoder(weights_path)
            self.pretrained = True
        if params is None:
            wav = jnp.zeros((1, 16000))
            params = self.model.init(jax.random.PRNGKey(seed), wav)
        self.params = params
        self._embed = jax.jit(
            lambda p, w: self.model.apply(p, w, l2_norm=True)
        )

    @classmethod
    def from_pretrained(cls, path: str) -> "SpeakerEncoder":
        """Load the reference's speaker_rep.pt weights
        (reference speaker_representation/main.py:226-261)."""
        return cls(weights_path=path)

    def compute_embedding(
        self, wav16k: np.ndarray, num_frames: int = 250, num_eval: int = 10
    ) -> np.ndarray:
        """(T,) 16 kHz wave → (512,) mean of `num_eval` crop embeddings."""
        n = num_frames * HOP
        if len(wav16k) < n:
            wav16k = np.pad(wav16k, (0, n - len(wav16k)))
        offsets = np.linspace(0, len(wav16k) - n, num=num_eval).astype(int)
        crops = np.stack([wav16k[o : o + n] for o in offsets])
        embs = np.asarray(self._embed(self.params, jnp.asarray(crops)))
        emb = embs.mean(axis=0)
        return emb / max(np.linalg.norm(emb), 1e-8)
