"""Monotonic Alignment Search (MAS) as an on-device JAX scan.

The reference runs MAS on host CPU every training step (numpy DP at
python/xvapitch/util.py:14-53, called from model.py:775-788 with a
GPU→CPU→GPU round trip each step; FastPitch uses a numba variant at
python/fastpitch1_1/fastpitch/alignment.py:79-118). On TPU a host round trip
would serialize the step through the tunnel, so the DP runs on device:

- Forward pass: ``lax.scan`` over mel frames (t_y); each step is a vectorized
  (B, t_x) max/where — O(t_y) sequential steps of pure VPU work, no host sync.
- Backtracking: a reverse scan carrying the current text index per batch
  element, emitting one-hot path columns.

Semantics match the reference DP: path moves through (x, y) with y advancing
every step and x either staying or advancing by one; maximizes the sum of
``value`` along the path; per-example lengths come from ``mask``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# true -inf like the reference numpy DP: a finite sentinel (-1e9) is
# outranked once legitimate cumulative log-likelihoods drop below it
# (long utterances during divergent training), which degenerates the path.
# The DP only adds/compares — no inf-minus-inf — so -inf is NaN-safe.
_NEG_INF = -jnp.inf


def maximum_path(value: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Best monotonic alignment path.

    Args:
      value: (B, t_x, t_y) log-likelihoods (text positions × mel frames).
      mask:  (B, t_x, t_y) validity mask (outer product of length masks).

    Returns:
      (B, t_x, t_y) float path matrix: path[b, x, y] = 1 on the best path.
    """
    B, t_x, t_y = value.shape
    # The DP accumulates log-likelihoods over up to ~900 frames; under bf16
    # mixed precision (train/amp.py) the inputs may arrive bf16, whose ~8-bit
    # mantissa would corrupt the cumulative scores — always accumulate fp32.
    out_dtype = value.dtype
    value = value.astype(jnp.float32)
    mask = mask.astype(jnp.float32)
    value = jnp.where(mask > 0, value, _NEG_INF)

    x_lengths = jnp.maximum(mask[:, :, 0].sum(axis=1).astype(jnp.int32), 1)
    y_lengths = jnp.maximum(mask[:, 0, :].sum(axis=1).astype(jnp.int32), 1)

    # ---- forward DP over y ----
    # q[b, x] = best cumulative score ending at text position x, current frame.
    init_q = jnp.where(
        jnp.arange(t_x)[None, :] == 0, value[:, :, 0], _NEG_INF
    )  # only x=0 reachable at y=0

    def fwd_step(q_prev, v_y):
        shifted = jnp.concatenate(
            [jnp.full((B, 1), _NEG_INF, q_prev.dtype), q_prev[:, :-1]], axis=1
        )
        from_diag = shifted >= q_prev  # came from x-1 (diagonal move)
        q = v_y + jnp.maximum(shifted, q_prev)
        return q, from_diag

    # scan over frames 1..t_y-1
    vs = jnp.moveaxis(value, 2, 0)  # (t_y, B, t_x)
    q_final, from_diag = jax.lax.scan(fwd_step, init_q, vs[1:])
    # from_diag: (t_y-1, B, t_x); prepend a dummy column for y=0.
    from_diag = jnp.concatenate(
        [jnp.zeros((1, B, t_x), bool), from_diag], axis=0
    )  # (t_y, B, t_x)

    # ---- backtracking (reverse scan over y) ----
    def bwd_step(x_idx, inputs):
        y, fd_y = inputs  # scalar frame index, (B, t_x) diag flags at frame y
        active = y < y_lengths  # padded frames emit nothing
        start = y == (y_lengths - 1)
        x_here = jnp.where(start, x_lengths - 1, x_idx)
        col = (jnp.arange(t_x)[None, :] == x_here[:, None]) & active[:, None]
        took_diag = jnp.take_along_axis(fd_y, x_here[:, None], axis=1)[:, 0]
        x_next = jnp.where(
            active & (y > 0), x_here - took_diag.astype(jnp.int32), x_here
        )
        return x_next, col

    ys = jnp.arange(t_y - 1, -1, -1)
    _, cols = jax.lax.scan(
        bwd_step, jnp.zeros((B,), jnp.int32), (ys, from_diag[ys])
    )
    # cols: (t_y, B, t_x) in reverse y order → (B, t_x, t_y)
    path = jnp.flip(cols, axis=0)
    return (jnp.moveaxis(path, 0, 2) * mask).astype(out_dtype)
