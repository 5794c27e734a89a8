"""Device-side linear-spec feed (XvaTrainConfig.device_spec) parity tests.

The host ships int16 audio only; the v3 train step dequantizes and recomputes
the 513-ch linear spec on device (train/xvapitch_trainer._materialize_spec).
Reference ships the host-computed f32 spec every step
(python/xvapitch/dataset.py:223-275).
"""

import pytest

pytestmark = pytest.mark.slow  # numerics-parity tier: run via `make test-all`
import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xva_trainer_tpu.data import save_wav
from xva_trainer_tpu.data.dataset import Bucket
from xva_trainer_tpu.data.text.xva_processor import XvaTextProcessor
from xva_trainer_tpu.data.xva_dataset import XvaBatcher, XvaFeatureCache
from xva_trainer_tpu.train.xvapitch_trainer import _materialize_spec


@pytest.fixture(scope="module")
def batch_pair(tmp_path_factory):
    """(host_batch, device_batch) collated from the same tiny cache.

    One wav is longer than the bucket (sl truncated mid-audio — the case
    where the final frame's 256-sample lookahead differs), one fits inside.
    """
    tmp = tmp_path_factory.mktemp("dsds")
    ds = tmp / "en_test"
    (ds / "wavs").mkdir(parents=True)
    lines = []
    for i, dur in enumerate([0.9, 2.2]):  # 2.2 s > 128-frame bucket
        t = np.arange(int(22050 * dur)) / 22050
        y = (0.5 * np.sin(2 * np.pi * (150 + 60 * i) * t)
             + 0.1 * np.sin(2 * np.pi * 1307.0 * t)).astype(np.float32)
        save_wav(str(ds / "wavs" / f"u{i}.wav"), y)
        lines.append(f"u{i}.wav|test line number {i}")
    (ds / "metadata.csv").write_text("\n".join(lines))
    cache = XvaFeatureCache(str(ds), XvaTextProcessor(), use_pallas=False)
    cache.build()
    dvec = np.random.default_rng(1).standard_normal(512).astype(np.float32) * 0.1
    out = []
    for device_spec in (False, True):
        b = XvaBatcher([cache], batch_size=2, d_vector=dvec,
                       buckets=[Bucket(64, 128)], seed=0)
        b.device_spec = device_spec
        out.append(next(b.epoch(shuffle=False)))
    return out


def test_collate_shapes_and_dtypes(batch_pair):
    host, dev = batch_pair
    assert host["wav"].dtype == np.float32 and "linear" in host
    assert dev["wav"].dtype == np.int16 and "linear" not in dev
    assert dev["wav"].shape == host["wav"].shape
    np.testing.assert_array_equal(host["slens"], dev["slens"])
    # int16 round-trip of the f32 wav: ≤ one quantization step
    back = dev["wav"].astype(np.float32) / 32767.0
    assert np.abs(back - host["wav"]).max() <= 1.0 / 32767.0 + 1e-7


def test_device_spec_matches_host_linear(batch_pair):
    host, dev = batch_pair
    lin_dev, wav_f = _materialize_spec(
        {"wav": jnp.asarray(dev["wav"])}, hop=256
    )
    lin_dev = np.asarray(lin_dev)
    assert lin_dev.shape == host["linear"].shape
    assert wav_f.dtype == jnp.float32
    for i, sl in enumerate(host["slens"]):
        sl = int(sl)
        # frames 0..sl-2 read only samples < sl*hop → exact up to the int16
        # dequant noise (spec magnitudes reach ~50 here; noise ~1e-3)
        np.testing.assert_allclose(
            lin_dev[i, : sl - 1], host["linear"][i, : sl - 1], atol=2e-2
        )
        # the final valid frame reads ≤256 samples past the truncation point
        # (zeros on device vs real audio/reflect on the host) — bounded, not
        # exact
        assert np.abs(lin_dev[i, sl - 1] - host["linear"][i, sl - 1]).max() < 30.0


def test_v3_step_device_spec_equivalence(batch_pair):
    """One fp32 GAN step fed int16-audio/device-spec vs f32/host-spec batches
    must produce near-identical losses — proving the full wiring."""
    import optax

    from xva_trainer_tpu.models.xvapitch import (
        VitsDiscriminator, XVAPitch, XVAPitchConfig,
    )
    from xva_trainer_tpu.train.xvapitch_trainer import V3State, make_v3_step

    host, dev = batch_pair
    cfg = XVAPitchConfig(
        n_vocab=524, big=False, upsample_initial_channel=32,
        resblock_kernel_sizes=(3,), spec_segment_size=8, mltts_rc=False,
        text_layers=2, posterior_layers=3, flow_wn_layers=2, num_flows=2,
        sdp_flows=2, pitch_layers=1,
    )
    model, disc = XVAPitch(cfg), VitsDiscriminator()
    rngs = {k: jax.random.PRNGKey(i) for i, k in enumerate(
        ["params", "noise", "segments", "dropout"])}
    lin0, wav0 = _materialize_spec(
        {k: jnp.asarray(v) for k, v in host.items() if k != "ids"},
        hop=cfg.hop_length,
    )
    g_params = model.init(
        rngs, jnp.asarray(host["tokens"]), jnp.asarray(host["tlens"]), lin0,
        jnp.asarray(host["slens"]), jnp.asarray(host["pitch"]),
        jnp.asarray(host["energy"]), wav0, jnp.asarray(host["dvec"]),
        jnp.asarray(host["lang"]),
    )
    seg = jnp.zeros((2, cfg.spec_segment_size * cfg.hop_length, 1))
    d_params = disc.init(jax.random.PRNGKey(9), seg, seg)
    g_tx = optax.sgd(1e-4)
    d_tx = optax.sgd(1e-4)
    step = make_v3_step(model, disc, g_tx, d_tx, freeze_post_dec=False,
                        use_amp=False)

    losses = {}
    for name, b in (("host", host), ("dev", dev)):
        state = V3State(
            g_params=copy.deepcopy(g_params),
            d_params=copy.deepcopy(d_params),
            g_opt=g_tx.init(g_params), d_opt=d_tx.init(d_params),
            step=jnp.zeros((), jnp.int32),
        )
        bj = {k: jnp.asarray(v) for k, v in b.items() if k != "ids"}
        _, meta = step(state, bj, jax.random.PRNGKey(3))
        losses[name] = (float(meta["loss"]), float(meta["loss_disc"]))
    for lh, ld in zip(losses["host"], losses["dev"]):
        assert np.isfinite(lh) and np.isfinite(ld)
        # same rngs → same segments; differences are int16 dequant noise and
        # the single final-frame spec deviation per item
        assert abs(lh - ld) < 0.02 * max(1.0, abs(lh)), (losses,)
