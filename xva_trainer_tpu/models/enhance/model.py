"""Learned speech enhancement for the 'ass' tool — a complex-ratio-mask
denoiser (DCCRN-class role; reference python/audio_source_separation/model.py
loads a pretrained asteroid DCCRNet and calls model.separate).

TPU-first design instead of a complex-LSTM translation: a UNet of real convs
over the stacked (re, im) spectrogram that predicts a bounded complex ratio
mask; one jitted forward covers STFT → mask → iSTFT. Trains with negative
SI-SDR on (noisy, clean) pairs — users can fine-tune a denoiser on their own
data rather than depending on an unshippable third-party blob.
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.griffin_lim import istft
from ...ops.stft import MelConfig, frame_signal, hann_window


@dataclasses.dataclass(frozen=True)
class EnhanceConfig:
    n_fft: int = 512
    hop: int = 128
    base_channels: int = 24
    depth: int = 4
    sample_rate: int = 22050

    @property
    def n_freqs(self) -> int:
        return self.n_fft // 2 + 1


def _stft(y: jnp.ndarray, cfg: EnhanceConfig) -> jnp.ndarray:
    """(T,) → complex (F, frames), centered."""
    num_frames = 1 + len(y) // cfg.hop
    pad = cfg.n_fft // 2
    y = jnp.pad(y, (pad, pad), mode="reflect")
    need = (num_frames + cfg.n_fft // cfg.hop) * cfg.hop
    if y.shape[0] < need:
        y = jnp.pad(y, (0, need - y.shape[0]))
    frames = frame_signal(y[None], cfg.n_fft, cfg.hop, num_frames)[0]
    win = jnp.asarray(hann_window(cfg.n_fft, cfg.n_fft))
    return jnp.fft.rfft(frames * win, axis=-1).T  # (F, T)


class ComplexMaskNet(nn.Module):
    """(B, T, F, 2) re/im → bounded complex ratio mask (B, T, F, 2)."""

    cfg: EnhanceConfig = EnhanceConfig()

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        skips = []
        h = x
        ch = c.base_channels
        # encoder: conv at full res (skip) then downsample F by 2
        for d in range(c.depth):
            h = nn.Conv(ch * (2 ** d), (3, 5), padding="SAME")(h)
            h = nn.LayerNorm()(h)
            h = nn.gelu(h)
            skips.append(h)
            h = nn.Conv(ch * (2 ** d), (3, 5), strides=(1, 2), padding="SAME")(h)
            h = nn.gelu(h)
        # decoder: upsample F by 2, crop to the skip's F, fuse
        for d in reversed(range(c.depth)):
            h = nn.ConvTranspose(ch * (2 ** d), (3, 5), strides=(1, 2),
                                 padding="SAME")(h)
            s = skips[d]
            h = h[:, : s.shape[1], : s.shape[2]]
            if h.shape[2] < s.shape[2]:
                h = jnp.pad(h, ((0, 0), (0, 0), (0, s.shape[2] - h.shape[2]),
                                (0, 0)))
            h = nn.LayerNorm()(h + s)
            h = nn.gelu(h)
        h = nn.Conv(2, (3, 3), padding="SAME")(h)
        # bounded complex mask (tanh magnitude, preserved phase rotation)
        return jnp.tanh(h)


class SpeechEnhancer:
    """Host-facing wrapper: enhance a waveform chunk-by-chunk."""

    def __init__(self, params=None, cfg: EnhanceConfig = EnhanceConfig(),
                 seed: int = 0, chunk_seconds: float = 4.0):
        self.cfg = cfg
        self.model = ComplexMaskNet(cfg)
        self.chunk = int(chunk_seconds * cfg.sample_rate)
        self.chunk -= self.chunk % cfg.hop
        if params is None:
            params = self.model.init(
                jax.random.PRNGKey(seed), jnp.zeros((1, 8, cfg.n_freqs, 2))
            )
        self.params = params

        @jax.jit
        def _enhance(p, y):
            spec = _stft(y, cfg)  # (F, T)
            x = jnp.stack([spec.real, spec.imag], axis=-1).transpose(1, 0, 2)
            mask = self.model.apply(p, x[None])[0]  # (T, F, 2)
            mr, mi = mask[..., 0].T, mask[..., 1].T
            out = (spec.real * mr - spec.imag * mi) + 1j * (
                spec.real * mi + spec.imag * mr
            )
            return istft(out, MelConfig(n_fft=cfg.n_fft, hop_length=cfg.hop,
                                        win_length=cfg.n_fft))

        self._enhance = _enhance

    def enhance(self, y: np.ndarray) -> np.ndarray:
        """Chunked enhancement with overlap-add crossfade: the mask and the
        per-chunk STFT boundary conditions change at every seam, so butting
        independent chunks together clicks — linear crossfade over `ov`
        samples removes the discontinuity."""
        n = self.chunk
        ov = min(4096, n // 4)
        hopn = n - ov
        total = max(len(y), 1)
        acc = np.zeros(total + n, np.float64)
        wsum = np.zeros(total + n, np.float64)
        ramp = np.linspace(0.0, 1.0, ov, endpoint=False)
        win = np.ones(n)
        win[:ov] = ramp
        win[-ov:] = ramp[::-1]
        s = 0
        while s < total:
            seg = y[s:s + n]
            orig = len(seg)
            if orig < n:
                seg = np.pad(seg, (0, n - orig))
            out = np.asarray(self._enhance(self.params, jnp.asarray(seg)))
            w = win.copy()
            if s == 0:
                w[:ov] = 1.0  # no fade-in at the very start
            if s + n >= total:
                w[-ov:] = 1.0  # no fade-out at the very end
            acc[s:s + n] += out * w
            wsum[s:s + n] += w
            s += hopn
        return (acc[: len(y)] / np.maximum(wsum[: len(y)], 1e-8)).astype(
            np.float32
        )


def load_params_npz(path: str):
    """Load params saved by scripts/train_default_enhancer.py (flat
    'a/b/c' keys, fp16 values → fp32 pytree)."""
    from flax.traverse_util import unflatten_dict

    with np.load(path) as z:
        flat = {tuple(k.split("/")): jnp.asarray(z[k], jnp.float32)
                for k in z.files}
    return unflatten_dict(flat)


def si_sdr(est: jnp.ndarray, ref: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Scale-invariant SDR in dB (higher is better)."""
    ref = ref - ref.mean(axis=-1, keepdims=True)
    est = est - est.mean(axis=-1, keepdims=True)
    proj = (jnp.sum(est * ref, -1, keepdims=True)
            / (jnp.sum(ref * ref, -1, keepdims=True) + eps)) * ref
    noise = est - proj
    ratio = (jnp.sum(proj**2, -1) + eps) / (jnp.sum(noise**2, -1) + eps)
    return 10.0 * jnp.log10(ratio)


def train_enhancer(
    noisy: np.ndarray,
    clean: np.ndarray,
    cfg: EnhanceConfig = EnhanceConfig(),
    steps: int = 200,
    lr: float = 3e-4,
    seed: int = 0,
    batch: int = 4,
    segment: int = 32768,
):
    """Fit the denoiser on aligned (noisy, clean) waveform pairs with
    negative SI-SDR. Returns trained params."""
    import optax

    model = ComplexMaskNet(cfg)
    enh = SpeechEnhancer(None, cfg)
    params = enh.params
    tx = optax.adamw(lr)
    opt = tx.init(params)
    rng = np.random.default_rng(seed)
    segment -= segment % cfg.hop

    def fwd(p, y):
        spec = _stft(y, cfg)
        x = jnp.stack([spec.real, spec.imag], axis=-1).transpose(1, 0, 2)
        mask = model.apply(p, x[None])[0]
        mr, mi = mask[..., 0].T, mask[..., 1].T
        out = (spec.real * mr - spec.imag * mi) + 1j * (
            spec.real * mi + spec.imag * mr
        )
        return istft(out, MelConfig(n_fft=cfg.n_fft, hop_length=cfg.hop,
                                    win_length=cfg.n_fft))

    @jax.jit
    def step(p, opt, ny, cy):
        def loss_fn(p):
            est = jax.vmap(lambda y: fwd(p, y))(ny)
            L = min(est.shape[-1], cy.shape[-1])
            return -jnp.mean(si_sdr(est[..., :L], cy[..., :L]))

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, opt = tx.update(grads, opt, p)
        return optax.apply_updates(p, updates), opt, loss

    losses = []
    for _ in range(steps):
        starts = rng.integers(0, max(1, len(noisy) - segment), batch)
        ny = jnp.asarray(np.stack([noisy[s:s + segment] for s in starts]))
        cy = jnp.asarray(np.stack([clean[s:s + segment] for s in starts]))
        params, opt, loss = step(params, opt, ny, cy)
        losses.append(float(loss))
    return params, losses
