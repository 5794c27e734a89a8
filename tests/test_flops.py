"""utils/flops.py — the analytic MFU-numerator fallback (VERDICT r4 #1a).

Exact shape-math expectations for the primitives that dominate the train
steps (dot_general, conv, scan), plus a live check that the counter
produces a nonzero number on a real (tiny) train step without compiling.
"""
import jax
import jax.numpy as jnp
import numpy as np

from xva_trainer_tpu.utils.flops import fn_flops, jaxpr_flops


def test_matmul_exact():
    x = jnp.ones((8, 256))
    w = jnp.ones((256, 512))
    got = fn_flops(lambda a, b: a @ b, x, w)
    assert got == 2 * 8 * 256 * 512


def test_batched_dot_and_elementwise():
    x = jnp.ones((4, 8, 32))
    w = jnp.ones((4, 32, 16))
    got = fn_flops(lambda a, b: jnp.tanh(jnp.einsum("bij,bjk->bik", a, b)), x, w)
    assert got == 4 * 2 * 8 * 32 * 16 + 4 * 8 * 16  # matmul + tanh


def test_conv_exact():
    import flax.linen as nn

    conv = nn.Conv(features=16, kernel_size=(3,), padding="SAME")
    y = jnp.ones((2, 100, 8))
    p = conv.init(jax.random.PRNGKey(0), y)
    got = fn_flops(lambda p, y: conv.apply(p, y), p, y)
    # 2·B·T·Cout·Cin·K (conv) + B·T·Cout (bias add)
    assert got == 2 * 2 * 100 * 16 * 8 * 3 + 2 * 100 * 16


def test_grouped_conv():
    import flax.linen as nn

    conv = nn.Conv(features=16, kernel_size=(3,), padding="SAME",
                   feature_group_count=4, use_bias=False)
    y = jnp.ones((2, 50, 16))
    p = conv.init(jax.random.PRNGKey(0), y)
    got = fn_flops(lambda p, y: conv.apply(p, y), p, y)
    assert got == 2 * 2 * 50 * 16 * (16 // 4) * 3


def test_scan_multiplies_by_length():
    w = jnp.ones((64, 64))

    def g(x):
        def body(c, _):
            return c @ w, None

        out, _ = jax.lax.scan(body, x, None, length=10)
        return out

    assert fn_flops(g, jnp.ones((64, 64))) == 10 * 2 * 64**3


def test_grad_counts_backward_too():
    w = jnp.ones((32, 32))

    def loss(w, x):
        return jnp.sum(x @ w)

    fwd = fn_flops(loss, w, jnp.ones((8, 32)))
    both = fn_flops(jax.grad(loss), w, jnp.ones((8, 32)))
    assert both > fwd  # backward adds the dW matmul


def test_nonzero_on_real_train_step():
    """A tiny FastPitch step traces and yields a plausible count — this is
    the path bench_train falls back to when cost_analysis is unavailable."""
    from xva_trainer_tpu.models.fastpitch import FastPitch, FastPitchConfig
    from xva_trainer_tpu.train.fastpitch_trainer import (
        TrainState,
        make_stage_step,
    )
    from xva_trainer_tpu.train.optim import make_fastpitch_optimizer

    cfg = FastPitchConfig(symbols_embedding_dim=32, in_fft_n_layers=1,
                          in_fft_d_head=16, in_fft_filter_size=64,
                          out_fft_n_layers=1, out_fft_d_head=16,
                          out_fft_filter_size=64, predictor_filter_size=16)
    model = FastPitch(cfg)
    B, T_TEXT, T_MEL = 2, 12, 48
    rng = np.random.default_rng(0)
    batch = {
        "tokens": jnp.asarray(rng.integers(1, 50, (B, T_TEXT)).astype(np.int32)),
        "in_lens": jnp.full((B,), T_TEXT, jnp.int32),
        "mel": jnp.asarray(rng.standard_normal((B, T_MEL, 80)).astype(np.float32)),
        "mel_lens": jnp.full((B,), T_MEL, jnp.int32),
        "pitch": jnp.zeros((B, 1, T_MEL), jnp.float32),
        "energy": jnp.zeros((B, T_MEL), jnp.float32),
        "prior": jnp.full((B, T_MEL, T_TEXT), 1.0 / T_TEXT, jnp.float32),
        "durs": jnp.full((B, T_TEXT), T_MEL / T_TEXT, jnp.float32),
    }
    params = model.init(jax.random.PRNGKey(0), batch["tokens"],
                        batch["in_lens"], batch["mel"], batch["mel_lens"],
                        batch["pitch"], batch["energy"], batch["prior"])
    tx = make_fastpitch_optimizer(0.1, 1e-6, 10)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    step = make_stage_step(model, 4, tx, use_gt_durs=True)
    flops = fn_flops(step, state, batch, jnp.asarray(0.0), jax.random.PRNGKey(1))
    assert flops > 1e6  # tiny model, but matmuls alone clear a megaFLOP


def test_jaxpr_flops_handles_cond():
    def f(x):
        return jax.lax.cond(x.sum() > 0, lambda v: v @ v, lambda v: v * 2.0, x)

    jaxpr = jax.make_jaxpr(f)(jnp.ones((16, 16)))
    got = jaxpr_flops(jaxpr)
    assert got >= 2 * 16**3  # takes the max branch
