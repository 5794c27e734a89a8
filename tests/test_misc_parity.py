"""SSIM + LanguageManager inventory items."""
import numpy as np

from xva_trainer_tpu.data.language_manager import LanguageManager
from xva_trainer_tpu.ops.ssim import ssim


def test_ssim_identity_and_ordering():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.random((2, 1, 32, 48), np.float32))
    same = float(ssim(a, a))
    assert abs(same - 1.0) < 1e-4
    b = a + 0.1 * jnp.asarray(rng.random((2, 1, 32, 48), np.float32))
    c = a + 0.5 * jnp.asarray(rng.random((2, 1, 32, 48), np.float32))
    assert float(ssim(a, b)) > float(ssim(a, c))
    per = ssim(a, b, size_average=False)
    assert per.shape == (2,)


def test_ssim_matches_torch_reference():
    import jax.numpy as jnp
    import pytest

    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    a = rng.random((1, 1, 24, 36)).astype(np.float32)
    b = (a + 0.2 * rng.random((1, 1, 24, 36))).astype(np.float32)

    # torch reference computation (reference util.py:601-640 math)
    g = np.exp(-((np.arange(11) - 5) ** 2) / (2 * 1.5**2))
    g = (g / g.sum()).astype(np.float32)
    w = torch.from_numpy(np.outer(g, g)[None, None])
    ta, tb = torch.from_numpy(a), torch.from_numpy(b)
    mu1 = F.conv2d(ta, w, padding=5)
    mu2 = F.conv2d(tb, w, padding=5)
    s1 = F.conv2d(ta * ta, w, padding=5) - mu1**2
    s2 = F.conv2d(tb * tb, w, padding=5) - mu2**2
    s12 = F.conv2d(ta * tb, w, padding=5) - mu1 * mu2
    C1, C2 = 0.01**2, 0.03**2
    ref = (((2 * mu1 * mu2 + C1) * (2 * s12 + C2))
           / ((mu1**2 + mu2**2 + C1) * (s1 + s2 + C2))).mean().item()
    ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    assert abs(ours - ref) < 1e-4


def test_language_manager(tmp_path):
    lm = LanguageManager()
    assert lm.num_languages == 31
    assert lm.lang_id("en") == lm.language_id_mapping["en"]
    assert lm.lang_id("??") == lm.lang_id("en")
    groups = lm.group_datasets(["/p/de_voice1", "/p/de_voice2", "/p/ro_x", "/p/plain"])
    assert len(groups["de"]) == 2 and len(groups["ro"]) == 1
    assert "/p/plain" in groups["en"]
    w = lm.sampling_weights(["de", "de", "ro"])
    assert w[2] > w[0]
    p = tmp_path / "langs.json"
    lm.save_ids_to_file(str(p))
    lm2 = LanguageManager(str(p))
    assert lm2.language_id_mapping == lm.language_id_mapping
