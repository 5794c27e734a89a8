"""HiFi-GAN model smoke tests (tiny config on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from xva_trainer_tpu.models.hifigan import (
    Generator,
    HifiganConfig,
    HifiganDiscriminator,
    discriminator_loss,
    feature_matching_loss,
    generator_adv_loss,
)

TINY = HifiganConfig(
    upsample_rates=(8, 8, 2, 2),
    upsample_kernel_sizes=(16, 16, 4, 4),
    upsample_initial_channel=32,
    resblock_kernel_sizes=(3, 7),
    resblock_dilation_sizes=((1, 3), (1, 3)),
)


def test_generator_shape_and_range():
    g = Generator(TINY)
    mel = jnp.asarray(np.random.default_rng(0).standard_normal((2, 32, 80)), jnp.float32)
    params = g.init(jax.random.PRNGKey(0), mel)
    wav = g.apply(params, mel)
    assert wav.shape == (2, 32 * 256, 1)  # hop = prod(upsample_rates) = 256
    w = np.asarray(wav)
    assert (w >= -1).all() and (w <= 1).all()


def test_generator_conditioned():
    cfg = HifiganConfig(
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
        cond_channels=512,
    )
    g = Generator(cfg)
    mel = jnp.zeros((1, 8, 80))
    emb = jnp.ones((1, 512))
    params = g.init(jax.random.PRNGKey(0), mel, emb)
    wav = g.apply(params, mel, emb)
    assert wav.shape == (1, 8 * 256, 1)


@pytest.mark.slow
def test_discriminator_and_losses():
    d = HifiganDiscriminator()
    T = 8192
    y = jnp.asarray(np.random.default_rng(1).standard_normal((2, T, 1)) * 0.1, jnp.float32)
    y_hat = jnp.asarray(np.random.default_rng(2).standard_normal((2, T, 1)) * 0.1, jnp.float32)
    variables = d.init(jax.random.PRNGKey(0), y, y_hat)
    (outs_r, outs_g, fmaps_r, fmaps_g), updates = d.apply(
        variables, y, y_hat, update_sn_stats=True, mutable=["batch_stats"]
    )
    assert len(outs_r) == 5 + 3  # MPD(5 periods) + MSD(3 scales)
    dl = float(discriminator_loss(outs_r, outs_g))
    gl = float(generator_adv_loss(outs_g))
    fl = float(feature_matching_loss(fmaps_r, fmaps_g))
    assert np.isfinite(dl) and np.isfinite(gl) and np.isfinite(fl)
    assert dl > 0 and gl > 0 and fl > 0


def test_segment_sampler_data_multiplier(tmp_path):
    """An epoch is ~1000 items regardless of dataset size (reference
    get_dataset_filelist dm, meldataset.py:296-302)."""
    import os

    from xva_trainer_tpu.data.audio_io import save_wav
    from xva_trainer_tpu.train.hifigan_trainer import SEGMENT_SIZE, SegmentSampler

    ds = tmp_path / "ds"
    (ds / "wavs").mkdir(parents=True)
    lines = []
    for i in range(4):
        y = np.zeros(SEGMENT_SIZE + 100, np.float32)
        save_wav(str(ds / "wavs" / f"w{i}.wav"), y)
        lines.append(f"w{i}.wav|text {i}")
    (ds / "metadata.csv").write_text("\n".join(lines))

    s = SegmentSampler(str(ds), batch_size=16, seed=0)
    assert s.data_mult == 250  # round(1000/4)
    assert len(s) == (4 * 250) // 16
    n = sum(1 for _ in s.epoch())
    assert n == len(s)
    # explicit override wins
    s1 = SegmentSampler(str(ds), batch_size=2, seed=0, data_mult=1)
    assert s1.data_mult == 1 and len(s1) == 2
