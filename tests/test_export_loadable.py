"""xVASynth-loadability of exports: the emitted .pt files must round-trip
through ``torch.load`` + ``reference_model.load_state_dict(..., strict=True)``.

This is the export contract (reference xva_train.py:984-1022 /
fastpitch1_1/xva_train.py:1030-1047 / hifigan/xva_train.py:600-601).
"""

import pytest

pytestmark = pytest.mark.slow  # full-size/e2e tier: run via `make test-all`
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from xva_trainer_tpu.interop.mapping import apply_import
from xva_trainer_tpu.interop.xvapitch_map import (
    vits_disc_rules,
    xvapitch_generator_rules,
)
from xva_trainer_tpu.train.checkpoints import xvapitch_state_dict
from xva_trainer_tpu.train.torch_save import torch_save_compatible

from ref_loader import ref_xvapitch


def test_v3_export_loads_into_reference(tmp_path):
    torch.manual_seed(0)
    rm = ref_xvapitch()
    sd = {k: v.detach().numpy() for k, v in rm.state_dict().items()}
    g = apply_import(sd, xvapitch_generator_rules(), strict=True)
    d = apply_import(sd, vits_disc_rules(), strict=True)

    out = xvapitch_state_dict(g, d)
    path = os.path.join(tmp_path, "voice.pt")
    torch_save_compatible(out, path)

    loaded = torch.load(path, map_location="cpu", weights_only=True)
    tensors = {k: torch.as_tensor(np.asarray(v)).float() for k, v in loaded.items()}
    missing, unexpected = rm.load_state_dict(tensors, strict=False)
    assert not missing, missing[:10]
    assert not unexpected, unexpected[:10]
    # strict load must also succeed
    rm.load_state_dict(tensors, strict=True)
    # round-trip preserves values (fp16 quantization tolerance)
    for k in ("text_encoder.proj.weight", "waveform_decoder.conv_pre.weight",
              "disc.nets.0.convs.0.weight_v"):
        np.testing.assert_allclose(
            tensors[k].numpy(), sd[k], atol=3e-3,
        )


def test_v2_export_loads_into_reference(tmp_path):
    import importlib.util
    import sys

    from ref_loader import REF, install_stubs
    from xva_trainer_tpu.interop.fastpitch_map import (
        fastpitch_state_dict,
        load_fastpitch_checkpoint,
    )

    install_stubs()
    for dd in (f"{REF}/fastpitch1_1", f"{REF}/fastpitch1_1/fastpitch"):
        if dd not in sys.path:
            sys.path.insert(0, dd)
    spec = importlib.util.spec_from_file_location(
        "ref_fp_model2", f"{REF}/fastpitch1_1/fastpitch/model.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    torch.manual_seed(0)
    fp = m.FastPitch()

    ckpt_path = os.path.join(tmp_path, "FastPitch_10.pt")
    torch.save({"state_dict": fp.state_dict()}, ckpt_path)
    params, meta = load_fastpitch_checkpoint(ckpt_path)

    sd_out = fastpitch_state_dict(params)
    path = os.path.join(tmp_path, "voice_v2.pt")
    torch_save_compatible(sd_out, path)

    loaded = torch.load(path, map_location="cpu", weights_only=True)
    tensors = {k: torch.as_tensor(np.asarray(v)).float() for k, v in loaded.items()}
    fp.load_state_dict(tensors, strict=True)


def test_hg_export_loads_into_reference(tmp_path):
    from ref_loader import load_ref_module
    from xva_trainer_tpu.interop.hifigan_map import v2_generator_rules
    from xva_trainer_tpu.interop.mapping import apply_export
    from xva_trainer_tpu.interop.pretrained import load_hifigan_generator

    ref = load_ref_module("hifigan/models.py", "ref_hifigan_models2")

    class H:
        resblock = "1"
        upsample_rates = [8, 8, 2, 2]
        upsample_kernel_sizes = [16, 16, 4, 4]
        upsample_initial_channel = 512
        resblock_kernel_sizes = [3, 7, 11]
        resblock_dilation_sizes = [[1, 3, 5], [1, 3, 5], [1, 3, 5]]
        USE_EMB_CONDITIONING = False

    torch.manual_seed(0)
    gen = ref.Generator(H())
    g_path = os.path.join(tmp_path, "g_00000001")
    torch.save({"generator": gen.state_dict()}, g_path)

    params = load_hifigan_generator(g_path)
    sd_out = apply_export(params, v2_generator_rules(), dtype=np.float32)
    path = os.path.join(tmp_path, "voice.hg.pt")
    torch_save_compatible({"generator": sd_out}, path)

    loaded = torch.load(path, map_location="cpu", weights_only=True)
    tensors = {k: torch.as_tensor(np.asarray(v)) for k, v in loaded["generator"].items()}
    gen.load_state_dict(tensors, strict=True)
