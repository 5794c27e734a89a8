"""Per-module device timings for the xVAPitch step at the bench shape.

Times each major module's forward and forward+backward as separate jitted
programs with scalar outputs (grad w.r.t. params, reduced to a norm), so the
tunnel transfer cost stays constant. Attribution for VERDICT r3 #3 (raise
MFU): finds which module family eats the 363ms step.

    python scripts/component_times.py
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xva_trainer_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=10, reps=3, label=""):
    import jax

    print(f"[component] compiling {label}...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    print(f"[component] {label} compiled in {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(out)[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    return round(best * 1e3, 2)  # ms


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench_train
    from xva_trainer_tpu.models.xvapitch.model import XVAPitch
    from xva_trainer_tpu.train import amp

    B, T_TEXT, T_SPEC = 128, 96, 384
    model, disc, g_tx, d_tx, state, batch = \
        bench_train._xvapitch_state_and_batch(B, T_TEXT, T_SPEC)
    rng = jax.random.PRNGKey(0)
    res = {"B": B, "platform": jax.devices()[0].platform}
    g_params = state.g_params
    d_params = state.d_params
    c = model.cfg
    latent = c.latent_size

    rnd = np.random.RandomState(0)
    linear = jnp.asarray(rnd.randn(B, T_SPEC, 513).astype(np.float32))
    slens = batch["slens"]
    dvec = batch["dvec"]
    z = jnp.asarray(rnd.randn(B, T_SPEC, latent).astype(np.float32))
    y_mask = jnp.ones((B, T_SPEC, 1), np.float32)
    seg = jnp.asarray(rnd.randn(
        B, c.spec_segment_size, latent).astype(np.float32))
    wav_seg = jnp.asarray(rnd.randn(
        B, c.spec_segment_size * c.hop_length, 1).astype(np.float32))
    tokens = batch["tokens"]
    tlens = batch["tlens"]

    def module_fns(name, method, *args, needs_rng=False, params=None):
        params = g_params if params is None else params
        apply_ = model.apply if params is g_params else disc.apply

        def fwd(p):
            kw = {"rngs": {"noise": rng, "dropout": rng,
                           "segments": rng}} if needs_rng else {}
            out = amp.amp_apply(
                apply_, p, *args, method=method,
                exclude=("duration_predictor",), **kw)
            return sum(jnp.vdot(x, x)
                       for x in jax.tree_util.tree_leaves(out)
                       if hasattr(x, "dtype")
                       and jnp.issubdtype(x.dtype, jnp.inexact))

        def fwdbwd(p):
            g = jax.grad(lambda q: fwd(q).real.astype(jnp.float32))(p)
            return sum(jnp.vdot(x, x) for x in jax.tree_util.tree_leaves(g))

        res[f"{name}_fwd_ms"] = timeit(jax.jit(fwd), params, label=name)
        res[f"{name}_fwdbwd_ms"] = timeit(
            jax.jit(fwdbwd), params, label=name + "+bwd")
        print(json.dumps(res), file=sys.stderr, flush=True)

    # posterior encoder: linear -> z
    def post_method(m, lin, sl, g):
        return m.posterior_encoder(lin, sl, g=g, deterministic=False)
    module_fns("posterior", post_method, linear, slens, dvec, needs_rng=True)

    # flow (fwd direction over full frames)
    def flow_method(m, zz, ym, g):
        return m.flow(zz, ym, g=g, deterministic=False)
    module_fns("flow", flow_method, z, y_mask, dvec, needs_rng=True)

    # text encoder + stats
    def text_method(m, tok, tl, lang):
        lang_emb = m.emb_l(lang) * m.cfg.lang_w
        x, x_emb, x_mask = m.text_encoder(
            tok, tl, lang_emb, deterministic=False)
        return m.text_encoder.stats(x, x_mask)
    module_fns("text", text_method, tokens, tlens, batch["lang"],
               needs_rng=True)

    # SDP (duration predictor) at text rate; its input width is whatever the
    # text encoder emits (latent + lang_emb) — read it off the actual param
    sdp_in = g_params["params"]["duration_predictor"]["pre"][
        "kernel"].shape[1]
    x_small = jnp.asarray(rnd.randn(B, T_TEXT, sdp_in).astype(np.float32))
    x_mask_s = jnp.ones((B, T_TEXT, 1), np.float32)
    durs = jnp.ones((B, T_TEXT, 1), np.float32)
    lang_e = jnp.zeros((B, c.lang_emb_dim), np.float32)

    def sdp_method(m, xx, xm, dr, g, le):
        return m.duration_predictor(
            xx, xm, dr=dr, g=g, lang_emb=le, deterministic=False)
    module_fns("sdp", sdp_method, x_small, x_mask_s, durs, dvec, lang_e,
               needs_rng=True)

    # HiFi-GAN decoder on segments
    def dec_method(m, zz, g):
        return m.waveform_decoder(zz, g)
    module_fns("decoder", dec_method, seg, dvec, needs_rng=True)

    # discriminator on segments (fake + real)
    fake = jnp.asarray(rnd.randn(
        B, c.spec_segment_size * c.hop_length, 1).astype(np.float32))

    def disc_method(m, f, r):
        return m(f, r)
    module_fns("disc", disc_method, fake, wav_seg, params=d_params)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
