"""Piecewise rational-quadratic spline transform (Durkan et al. 2019).

Used by the VITS stochastic duration predictor's ConvFlow (reference
python/xvapitch/sdp.py:116-178 + util.py:206-402). Same parameterization:
``num_bins`` widths/heights/derivatives, linear tails at ``tail_bound``,
min bin width/height 1e-3, min derivative 1e-3. Fully vectorized (no gather
loops) — bucket location via sum-of-comparisons, branchless inside/outside
select, so it jits cleanly on TPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

DEFAULT_MIN_BIN_WIDTH = 1e-3
DEFAULT_MIN_BIN_HEIGHT = 1e-3
DEFAULT_MIN_DERIVATIVE = 1e-3


def rational_quadratic_spline(
    inputs: jnp.ndarray,
    unnormalized_widths: jnp.ndarray,
    unnormalized_heights: jnp.ndarray,
    unnormalized_derivatives: jnp.ndarray,
    *,
    inverse: bool = False,
    tail_bound: float = 5.0,
    min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
    min_derivative: float = DEFAULT_MIN_DERIVATIVE,
):
    """Elementwise spline with linear tails.

    inputs: (...,); unnormalized_{widths,heights}: (..., K);
    unnormalized_derivatives: (..., K-1) — boundary derivatives are pinned so
    the tails join with unit slope (reference util.py:264-271).
    Returns (outputs, logabsdet) of the same shape as inputs.
    """
    K = unnormalized_widths.shape[-1]

    # Pad derivative params with the constant that makes edge slope 1.
    constant = jnp.log(jnp.exp(1.0 - min_derivative) - 1.0)
    pad = jnp.full(unnormalized_derivatives.shape[:-1] + (1,), constant,
                   unnormalized_derivatives.dtype)
    unnormalized_derivatives = jnp.concatenate([pad, unnormalized_derivatives, pad], axis=-1)

    widths = jax.nn.softmax(unnormalized_widths, axis=-1)
    widths = min_bin_width + (1 - min_bin_width * K) * widths
    cumwidths = jnp.cumsum(widths, axis=-1)
    cumwidths = jnp.pad(cumwidths, [(0, 0)] * (cumwidths.ndim - 1) + [(1, 0)])
    cumwidths = (2 * tail_bound) * cumwidths - tail_bound  # [-B, B]
    cumwidths = cumwidths.at[..., 0].set(-tail_bound)
    cumwidths = cumwidths.at[..., -1].set(tail_bound)
    widths = cumwidths[..., 1:] - cumwidths[..., :-1]

    derivatives = min_derivative + jax.nn.softplus(unnormalized_derivatives)

    heights = jax.nn.softmax(unnormalized_heights, axis=-1)
    heights = min_bin_height + (1 - min_bin_height * K) * heights
    cumheights = jnp.cumsum(heights, axis=-1)
    cumheights = jnp.pad(cumheights, [(0, 0)] * (cumheights.ndim - 1) + [(1, 0)])
    cumheights = (2 * tail_bound) * cumheights - tail_bound
    cumheights = cumheights.at[..., 0].set(-tail_bound)
    cumheights = cumheights.at[..., -1].set(tail_bound)
    heights = cumheights[..., 1:] - cumheights[..., :-1]

    inside = (inputs >= -tail_bound) & (inputs <= tail_bound)
    clipped = jnp.clip(inputs, -tail_bound, tail_bound)

    # Locate bin: count boundaries <= input (searchsorted, vectorized).
    ref = cumheights if inverse else cumwidths
    idx = jnp.sum((ref[..., 1:-1] <= clipped[..., None]).astype(jnp.int32), axis=-1)

    def take(t):
        return jnp.take_along_axis(t, idx[..., None], axis=-1)[..., 0]

    in_cw = take(cumwidths)
    in_w = take(widths)
    in_ch = take(cumheights)
    in_h = take(heights)
    d_k = take(derivatives[..., :-1])
    d_k1 = take(derivatives[..., 1:])
    delta = in_h / in_w  # s_k

    if inverse:
        y_rel = clipped - in_ch
        a = in_h * (delta - d_k) + y_rel * (d_k + d_k1 - 2 * delta)
        b = in_h * d_k - y_rel * (d_k + d_k1 - 2 * delta)
        c = -delta * y_rel
        disc = b**2 - 4 * a * c
        disc = jnp.maximum(disc, 0.0)
        root = (2 * c) / (-b - jnp.sqrt(disc) - 1e-12)
        outputs = root * in_w + in_cw
        theta_one_minus_theta = root * (1 - root)
        denom = delta + (d_k + d_k1 - 2 * delta) * theta_one_minus_theta
        deriv_num = delta**2 * (
            d_k1 * root**2 + 2 * delta * theta_one_minus_theta + d_k * (1 - root) ** 2
        )
        logabsdet = -(jnp.log(deriv_num + 1e-12) - 2 * jnp.log(jnp.abs(denom) + 1e-12))
    else:
        theta = (clipped - in_cw) / in_w
        theta_one_minus_theta = theta * (1 - theta)
        numerator = in_h * (delta * theta**2 + d_k * theta_one_minus_theta)
        denom = delta + (d_k + d_k1 - 2 * delta) * theta_one_minus_theta
        outputs = in_ch + numerator / denom
        deriv_num = delta**2 * (
            d_k1 * theta**2 + 2 * delta * theta_one_minus_theta + d_k * (1 - theta) ** 2
        )
        logabsdet = jnp.log(deriv_num + 1e-12) - 2 * jnp.log(jnp.abs(denom) + 1e-12)

    # Linear tails: identity transform, zero logdet.
    outputs = jnp.where(inside, outputs, inputs)
    logabsdet = jnp.where(inside, logabsdet, jnp.zeros_like(logabsdet))
    return outputs, logabsdet
