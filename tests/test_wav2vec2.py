"""Flax wav2vec2 CTC parity vs transformers' torch Wav2Vec2ForCTC."""

import pytest

pytestmark = pytest.mark.slow  # full-size/e2e tier: run via `make test-all`
import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from xva_trainer_tpu.models.wav2vec2 import (
    Wav2Vec2CTC,
    Wav2Vec2Model,
    ctc_greedy_decode,
)


@pytest.fixture(scope="module")
def hf_dir(tmp_path_factory):
    from transformers import Wav2Vec2Config as HFConfig
    from transformers import Wav2Vec2ForCTC

    torch.manual_seed(0)
    hc = HFConfig(
        vocab_size=32, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=128,
        conv_dim=[32, 32, 32], conv_stride=[5, 2, 2], conv_kernel=[10, 3, 3],
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=False, feat_extract_norm="group",
    )
    hf = Wav2Vec2ForCTC(hc).eval()
    d = tmp_path_factory.mktemp("w2v2")
    torch.save(hf.state_dict(), os.path.join(d, "pytorch_model.bin"))
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(hc.to_dict(), f)
    vocab = {"<pad>": 0, "|": 4}
    for i, ch in enumerate("abcdefghijklmnopqrstuvwxyz"):
        vocab[ch] = 5 + i
    with open(os.path.join(d, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    return hf, str(d)


def test_forward_parity(hf_dir):
    hf, d = hf_dir
    asr = Wav2Vec2CTC.from_hf_dir(d)
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(8000) * 0.2).astype(np.float32)
    with torch.no_grad():
        logits_t = hf(torch.from_numpy(wav)[None]).logits.numpy()
    logits_f = np.asarray(asr._logits(asr.params, jnp.asarray(wav)[None]))
    assert logits_f.shape == logits_t.shape
    np.testing.assert_allclose(logits_f, logits_t, atol=2e-3)


def test_transcribe_smoke(hf_dir):
    _, d = hf_dir
    asr = Wav2Vec2CTC.from_hf_dir(d)
    wav = (np.random.default_rng(1).standard_normal(16000) * 0.1).astype(np.float32)
    text = asr.transcribe(wav)
    assert isinstance(text, str)


def test_ctc_greedy_decode():
    # blank=0; "c a a t" with repeats and blanks → "caat"? no: repeats collapse
    vocab = {0: "", 1: "c", 2: "a", 3: "t", 4: "|"}
    T = np.full((8, 5), -10.0, np.float32)
    for i, tid in enumerate([1, 1, 0, 2, 2, 0, 4, 3]):
        T[i, tid] = 10.0
    assert ctc_greedy_decode(T, vocab) == "ca t"
