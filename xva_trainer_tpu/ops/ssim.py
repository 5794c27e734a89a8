"""SSIM over spectrogram images (reference python/xvapitch/util.py:601-640:
11x11 gaussian-window SSIM via grouped conv2d), in jax."""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _window(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.exp(-((np.arange(window_size) - window_size // 2) ** 2)
               / (2.0 * sigma**2))
    g = g / g.sum()
    w = np.outer(g, g).astype(np.float32)
    return w[None, None]  # (1, 1, k, k) — NCHW kernel for one channel


def _blur(x: jnp.ndarray, window_size: int) -> jnp.ndarray:
    """Depthwise 2D gaussian blur of (B, C, H, W)."""
    B, C, H, W = x.shape
    k = jnp.asarray(np.tile(_window(window_size), (C, 1, 1, 1)))  # (C,1,k,k)
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME",
        feature_group_count=C,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
         size_average: bool = True) -> jnp.ndarray:
    """img (B, C, H, W) in [0, 1]; returns scalar or per-item SSIM."""
    mu1 = _blur(img1, window_size)
    mu2 = _blur(img2, window_size)
    mu1_sq, mu2_sq, mu12 = mu1**2, mu2**2, mu1 * mu2
    s1 = _blur(img1 * img1, window_size) - mu1_sq
    s2 = _blur(img2 * img2, window_size) - mu2_sq
    s12 = _blur(img1 * img2, window_size) - mu12
    C1, C2 = 0.01**2, 0.03**2
    m = ((2 * mu12 + C1) * (2 * s12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2)
    )
    if size_average:
        return m.mean()
    return m.mean(axis=(1, 2, 3))
