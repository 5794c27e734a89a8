"""v2 HiFi-GAN g_/do_ checkpoint import parity.

Builds the reference torch Generator/MPD/MSD (random init), writes real
torch.save g_/do_ archives, loads them through the torch-free
interop.torch_io reader + rule maps, and checks forward parity.
"""

import pytest

pytestmark = pytest.mark.slow  # numerics-parity tier: run via `make test-all`
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from xva_trainer_tpu.interop.pretrained import (
    load_hifigan_discriminators,
    load_hifigan_generator,
)
from xva_trainer_tpu.models.hifigan.models import (
    Generator,
    HifiganConfig,
    HifiganDiscriminator,
)

from ref_loader import load_ref_module


class H:
    resblock = "1"
    upsample_rates = [8, 8, 2, 2]
    upsample_kernel_sizes = [16, 16, 4, 4]
    upsample_initial_channel = 512
    resblock_kernel_sizes = [3, 7, 11]
    resblock_dilation_sizes = [[1, 3, 5], [1, 3, 5], [1, 3, 5]]
    USE_EMB_CONDITIONING = False


V2_CFG = HifiganConfig(cond_channels=0, conv_pre_weight_norm=True,
                       conv_post_weight_norm=True, conv_post_bias=True)


@pytest.fixture(scope="module")
def ref_mod():
    return load_ref_module("hifigan/models.py", "ref_hifigan_models")


@pytest.fixture(scope="module")
def ckpts(tmp_path_factory, ref_mod):
    torch.manual_seed(0)
    d = tmp_path_factory.mktemp("hifigan_ckpts")
    gen = ref_mod.Generator(H()).eval()
    mpd = ref_mod.MultiPeriodDiscriminator().eval()
    msd = ref_mod.MultiScaleDiscriminator()
    # converge the spectral-norm u/v power iteration (train-mode forwards),
    # as they would be in a real pretrained do_ checkpoint — torch eval uses
    # the stored estimate while flax refines it by one step, so an
    # unconverged random u would diverge between frameworks
    with torch.no_grad():
        probe = torch.randn(1, 1, 8192) * 0.1
        for _ in range(50):
            msd(probe, probe)
    msd = msd.eval()
    g_path = os.path.join(d, "g_00000001")
    do_path = os.path.join(d, "do_00000001")
    torch.save({"generator": gen.state_dict()}, g_path)
    torch.save(
        {"mpd": mpd.state_dict(), "msd": msd.state_dict(), "steps": 7,
         "epoch": 2},
        do_path,
    )
    return {"gen": gen, "mpd": mpd, "msd": msd, "g": g_path, "do": do_path}


def test_generator_parity(ckpts):
    params = load_hifigan_generator(ckpts["g"])
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((1, 80, 32)).astype(np.float32)
    with torch.no_grad():
        y_t = ckpts["gen"](torch.from_numpy(mel)).numpy()
    m = Generator(V2_CFG)
    y_f = m.apply(params, jnp.asarray(mel.transpose(0, 2, 1)))
    assert np.asarray(y_f).shape == (1, 32 * 256, 1)
    np.testing.assert_allclose(
        np.asarray(y_f)[0, :, 0], y_t[0, 0, :], atol=1e-3
    )


def test_discriminator_parity(ckpts):
    variables, meta = load_hifigan_discriminators(ckpts["do"])
    assert meta == {"steps": 7, "epoch": 2}
    rng = np.random.default_rng(1)
    y = rng.standard_normal((1, 1, 8192)).astype(np.float32) * 0.5
    yh = rng.standard_normal((1, 1, 8192)).astype(np.float32) * 0.5
    with torch.no_grad():
        p_rs, p_gs, p_fr, p_fg = ckpts["mpd"](torch.from_numpy(y),
                                              torch.from_numpy(yh))
        s_rs, s_gs, s_fr, s_fg = ckpts["msd"](torch.from_numpy(y),
                                              torch.from_numpy(yh))
    m = HifiganDiscriminator()
    outs_r, outs_g, fmaps_r, fmaps_g = m.apply(
        m_variables(variables),
        jnp.asarray(y.transpose(0, 2, 1)), jnp.asarray(yh.transpose(0, 2, 1)),
        update_sn_stats=False,
    )
    # order: 5 MPD then 3 MSD
    t_outs_r = [o.numpy() for o in p_rs] + [o.numpy() for o in s_rs]
    for i, (f, t) in enumerate(zip(outs_r, t_outs_r)):
        fa = np.asarray(f).reshape(-1)
        ta = t.reshape(-1)
        assert fa.size == ta.size, (i, fa.shape, ta.shape)
        np.testing.assert_allclose(fa, ta, atol=2e-3, err_msg=f"disc {i}")
    t_outs_g = [o.numpy() for o in p_gs] + [o.numpy() for o in s_gs]
    for i, (f, t) in enumerate(zip(outs_g, t_outs_g)):
        np.testing.assert_allclose(
            np.asarray(f).reshape(-1), t.reshape(-1), atol=2e-3,
            err_msg=f"disc fake {i}",
        )


def m_variables(variables):
    return {k: v for k, v in variables.items()}
