"""Torch->flax pretrained-checkpoint import parity (xVAPitch).

Instantiates the reference torch xVAPitch (random init), maps its
``state_dict()`` through interop.xvapitch_map, and checks (a) every torch key
is consumed, (b) every mapped leaf lands on a real flax param with the right
shape, (c) forward parity <1e-3 L1 on each deterministic submodule.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from xva_trainer_tpu.interop.mapping import apply_import, apply_export
from xva_trainer_tpu.interop.xvapitch_map import (
    UNUSED_TORCH_DEFAULTS,
    vits_disc_rules,
    xvapitch_generator_rules,
)
from xva_trainer_tpu.models.xvapitch import XVAPitch, XVAPitchConfig

from ref_loader import ref_xvapitch

CFG = XVAPitchConfig(mltts_rc=False)


@pytest.fixture(scope="module")
def ref_model():
    torch.manual_seed(0)
    m = ref_xvapitch()
    m.eval()
    return m


@pytest.fixture(scope="module")
def ref_sd(ref_model):
    return {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}


@pytest.fixture(scope="module")
def flax_template():
    m = XVAPitch(CFG)
    B, Tt, Ts = 1, 16, 48
    rngs = {
        k: jax.random.PRNGKey(i)
        for i, k in enumerate(["params", "noise", "segments", "dropout"])
    }
    args = (
        jnp.zeros((B, Tt), jnp.int32), jnp.full((B,), Tt),
        jnp.zeros((B, Ts, 513)), jnp.full((B,), Ts),
        jnp.zeros((B, 1, Ts)), jnp.zeros((B, Ts)),
        jnp.zeros((B, Ts * 256, 1)), jnp.zeros((B, 512)),
        jnp.zeros((B,), jnp.int32),
    )
    return jax.eval_shape(XVAPitch(CFG).init, rngs, *args)


@pytest.fixture(scope="module")
def imported(ref_sd):
    return apply_import(ref_sd, xvapitch_generator_rules(), strict=True)


@pytest.fixture(scope="module")
def flax_params(flax_template, imported):
    """Full tree: imported leaves; zeros for anything not in the checkpoint."""

    def fill(t, i, path=()):
        if isinstance(t, dict):
            return {
                k: fill(v, i.get(k, {}) if isinstance(i, dict) else {},
                        path + (k,))
                for k, v in t.items()
            }
        if isinstance(i, np.ndarray):
            assert tuple(i.shape) == tuple(t.shape), (path, i.shape, t.shape)
            return jnp.asarray(i)
        raise AssertionError(f"flax param not imported: {'/'.join(path)}")

    return fill(flax_template, imported)


def test_all_generator_keys_consumed(ref_sd):
    rules = xvapitch_generator_rules()
    used = set()
    for r in rules:
        if r.kind.startswith("wn_"):
            used |= {r.torch_key + ".weight_g", r.torch_key + ".weight_v"}
            used.add(r.torch_key + ".bias")
        else:
            used.add(r.torch_key)
    remaining = set(ref_sd) - used
    disc = {k for k in remaining if k.startswith("disc.")}
    leftovers = remaining - disc - set(UNUSED_TORCH_DEFAULTS)
    assert not leftovers, sorted(leftovers)[:10]
    # and no rule references a nonexistent torch key (strict import passed)
    apply_import(ref_sd, rules, strict=True)


def test_disc_keys_consumed(ref_sd):
    rules = vits_disc_rules()
    used = set()
    for r in rules:
        used |= {r.torch_key + ".weight_g", r.torch_key + ".weight_v",
                 r.torch_key + ".bias"}
    disc_keys = {k for k in ref_sd if k.startswith("disc.")}
    assert disc_keys == used & disc_keys
    assert not (disc_keys - used)
    apply_import(ref_sd, rules, strict=True)


def test_export_roundtrip_key_set(ref_sd, flax_params):
    """Exported state dict key set == the reference generator key set."""
    exported = apply_export(flax_params, xvapitch_generator_rules())
    for k, (kind, shape) in UNUSED_TORCH_DEFAULTS.items():
        exported[k] = (np.ones if kind == "ones" else np.zeros)(shape, np.float16)
    gen_keys = {k for k in ref_sd if not k.startswith("disc.")}
    assert set(exported) == gen_keys
    for k in exported:
        assert tuple(exported[k].shape) == tuple(ref_sd[k].shape), k
    # effective values survive the round trip (fp16 quantization aside)
    for k in ("text_encoder.proj.weight", "emb_l.weight",
              "posterior_encoder.pre.weight"):
        np.testing.assert_allclose(
            exported[k].astype(np.float32), ref_sd[k], atol=2e-3
        )


def _t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def test_text_encoder_parity(ref_model, flax_params):
    B, T = 1, 12
    rng = np.random.default_rng(0)
    tokens = rng.integers(1, 500, (B, T))
    lengths = np.array([T])
    lang = np.array([5])

    with torch.no_grad():
        lang_emb = ref_model.emb_l(torch.from_numpy(lang)).unsqueeze(-1)
        x_t, _, xm_t = ref_model.text_encoder(
            torch.from_numpy(tokens), torch.from_numpy(lengths),
            lang_emb=lang_emb, stats=False,
        )
        m_t, logs_t = ref_model.text_encoder(
            x_t, torch.from_numpy(lengths), lang_emb=lang_emb, stats=True,
            x_mask=xm_t,
        )

    def fwd(mdl, tokens, lengths, lang_ids):
        lang_emb = mdl.emb_l(lang_ids) * mdl.cfg.lang_w
        x, _, x_mask = mdl.text_encoder(tokens, lengths, lang_emb,
                                        deterministic=True)
        m, logs = mdl.text_encoder.stats(x, x_mask)
        return x, m, logs

    x_f, m_f, logs_f = XVAPitch(CFG).apply(
        flax_params, jnp.asarray(tokens), jnp.asarray(lengths),
        jnp.asarray(lang), method=fwd,
    )
    np.testing.assert_allclose(
        np.asarray(x_f), x_t.numpy().transpose(0, 2, 1), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(m_f), m_t.numpy().transpose(0, 2, 1), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(logs_f), logs_t.numpy().transpose(0, 2, 1), atol=1e-3
    )


def test_waveform_decoder_parity(ref_model, flax_params):
    rng = np.random.default_rng(1)
    z = rng.standard_normal((1, 256, 32)).astype(np.float32)
    g = rng.standard_normal((1, 512, 1)).astype(np.float32)
    with torch.no_grad():
        o_t = ref_model.waveform_decoder(_t(z), g=_t(g)).numpy()

    def fwd(mdl, zf, gf):
        return mdl.waveform_decoder(zf, gf)

    o_f = XVAPitch(CFG).apply(
        flax_params, jnp.asarray(z.transpose(0, 2, 1)),
        jnp.asarray(g[:, :, 0]), method=fwd,
    )
    np.testing.assert_allclose(
        np.asarray(o_f)[..., 0], o_t[:, 0, :], atol=1e-3
    )


def test_flow_parity(ref_model, flax_params):
    rng = np.random.default_rng(2)
    T = 40
    z = rng.standard_normal((1, 256, T)).astype(np.float32)
    g = rng.standard_normal((1, 512, 1)).astype(np.float32)
    mask = np.ones((1, 1, T), np.float32)
    with torch.no_grad():
        zp_t = ref_model.flow(_t(z), _t(mask), g=_t(g)).numpy()
        zrev_t = ref_model.flow(_t(zp_t), _t(mask), g=_t(g), reverse=True).numpy()

    def fwd(mdl, zf, maskf, gf):
        zp = mdl.flow(zf, maskf, g=gf, deterministic=True)
        zrev = mdl.flow(zp, maskf, g=gf, reverse=True, deterministic=True)
        return zp, zrev

    zp_f, zrev_f = XVAPitch(CFG).apply(
        flax_params, jnp.asarray(z.transpose(0, 2, 1)),
        jnp.asarray(mask.transpose(0, 2, 1)), jnp.asarray(g[:, :, 0]),
        method=fwd,
    )
    np.testing.assert_allclose(
        np.asarray(zp_f), zp_t.transpose(0, 2, 1), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(zrev_f), zrev_t.transpose(0, 2, 1), atol=1e-3
    )
    np.testing.assert_allclose(np.asarray(zrev_f), z.transpose(0, 2, 1),
                               atol=1e-2)


def test_sdp_reverse_parity(ref_model, flax_params):
    """noise_scale=0 makes the SDP reverse path deterministic."""
    rng = np.random.default_rng(3)
    B, T = 1, 12
    x = rng.standard_normal((B, 268, T)).astype(np.float32)
    mask = np.ones((B, 1, T), np.float32)
    g = rng.standard_normal((B, 512, 1)).astype(np.float32)
    lang = np.array([5])
    with torch.no_grad():
        lang_emb = ref_model.emb_l(torch.from_numpy(lang)).unsqueeze(-1)
        logw_t = ref_model.duration_predictor(
            _t(x), _t(mask), g=_t(g), reverse=True, noise_scale=0.0,
            lang_emb=lang_emb,
        ).numpy()

    def fwd(mdl, xf, maskf, gf, lang_ids):
        lang_emb = mdl.emb_l(lang_ids) * mdl.cfg.lang_w
        return mdl.duration_predictor(
            xf, maskf, g=gf, lang_emb=lang_emb, reverse=True, noise_scale=0.0,
            deterministic=True,
        )

    logw_f = XVAPitch(CFG).apply(
        flax_params, jnp.asarray(x.transpose(0, 2, 1)),
        jnp.asarray(mask.transpose(0, 2, 1)), jnp.asarray(g[:, :, 0]),
        jnp.asarray(lang), method=fwd,
        rngs={"noise": jax.random.PRNGKey(0)},
    )
    np.testing.assert_allclose(
        np.asarray(logw_f)[..., 0], logw_t[:, 0, :], atol=1e-3
    )


def test_pitch_predictor_parity(ref_model, flax_params):
    rng = np.random.default_rng(4)
    B, T = 1, 12
    x = rng.standard_normal((B, 268, T)).astype(np.float32)
    lengths = np.array([T])
    g = rng.standard_normal((B, 512, 1)).astype(np.float32)
    with torch.no_grad():
        p_t = ref_model.pitch_predictor(
            _t(x).permute(0, 2, 1), torch.from_numpy(lengths),
            speaker_emb=_t(g), stats=False,
        ).numpy()

    def fwd(mdl, xf, lengths, gf):
        return mdl.pitch_predictor(xf, lengths, speaker_emb=gf,
                                   deterministic=True)

    p_f = XVAPitch(CFG).apply(
        flax_params, jnp.asarray(x.transpose(0, 2, 1)),
        jnp.asarray(lengths), jnp.asarray(g[:, :, 0]), method=fwd,
    )
    assert np.asarray(p_f).size == p_t.size
    np.testing.assert_allclose(
        np.asarray(p_f).reshape(-1), p_t.reshape(-1), atol=1e-3
    )


def test_posterior_encoder_parity(ref_model, flax_params):
    rng = np.random.default_rng(5)
    B, T = 1, 40
    y = rng.standard_normal((B, 513, T)).astype(np.float32)
    lengths = np.array([T])
    g = rng.standard_normal((B, 512, 1)).astype(np.float32)
    with torch.no_grad():
        _, m_t, logs_t, _ = ref_model.posterior_encoder(
            _t(y), torch.from_numpy(lengths), g=_t(g)
        )

    def fwd(mdl, yf, lengths, gf):
        _, m, logs, _ = mdl.posterior_encoder(yf, lengths, g=gf,
                                              deterministic=True)
        return m, logs

    m_f, logs_f = XVAPitch(CFG).apply(
        flax_params, jnp.asarray(y.transpose(0, 2, 1)), jnp.asarray(lengths),
        jnp.asarray(g[:, :, 0]), method=fwd,
        rngs={"noise": jax.random.PRNGKey(0)},
    )
    np.testing.assert_allclose(np.asarray(m_f), m_t.numpy().transpose(0, 2, 1),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(logs_f),
                               logs_t.numpy().transpose(0, 2, 1), atol=1e-3)
