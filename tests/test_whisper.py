"""Flax Whisper parity vs torch (transformers WhisperModel) + decode smoke."""

import pytest

pytestmark = pytest.mark.slow  # full-size/e2e tier: run via `make test-all`
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from xva_trainer_tpu.interop.whisper_map import hf_to_openai_keys, load_whisper
from xva_trainer_tpu.models.whisper import (
    BpeDecoder,
    Whisper,
    WhisperASR,
    WhisperConfig,
    log_mel_spectrogram,
)


@pytest.fixture(scope="module")
def tiny_pair(tmp_path_factory):
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperModel as HFModel

    torch.manual_seed(0)
    hf_cfg = HFConfig(
        vocab_size=1000, d_model=64, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_ffn_dim=256, decoder_ffn_dim=256,
        max_source_positions=1500, max_target_positions=448,
        num_mel_bins=80, pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=1,
    )
    hf = HFModel(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    sd = hf_to_openai_keys(sd)
    d = tmp_path_factory.mktemp("whisper")
    path = os.path.join(d, "tiny_test.pt")
    dims = dict(n_vocab=1000, n_audio_ctx=1500, n_audio_state=64,
                n_audio_head=2, n_audio_layer=2, n_text_ctx=448,
                n_text_state=64, n_text_head=2, n_text_layer=2)
    torch.save({"dims": dims,
                "model_state_dict": {k: torch.from_numpy(np.asarray(v))
                                     for k, v in sd.items()}}, path)
    return hf, path


def test_import_and_forward_parity(tiny_pair):
    hf, path = tiny_pair
    params, cfg = load_whisper(path)
    assert cfg.n_audio_state == 64 and cfg.n_text_layer == 2

    rng = np.random.default_rng(0)
    mel = rng.standard_normal((1, 80, 3000)).astype(np.float32) * 0.3
    tokens = rng.integers(0, 1000, (1, 8)).astype(np.int64)

    with torch.no_grad():
        out_t = hf(
            input_features=torch.from_numpy(mel),
            decoder_input_ids=torch.from_numpy(tokens),
        )
        enc_t = out_t.encoder_last_hidden_state.numpy()
        dec_t = out_t.last_hidden_state.numpy()

    m = Whisper(cfg)
    enc_f = m.apply(params, jnp.asarray(mel), method=Whisper.encode)
    np.testing.assert_allclose(np.asarray(enc_f), enc_t, atol=2e-3)

    logits_f = m.apply(params, jnp.asarray(tokens.astype(np.int32)),
                       enc_f, method=Whisper.decode_logits)
    # compare pre-logits hidden state via projecting torch's with our emb
    emb = np.asarray(params["params"]["decoder"]["token_embedding"])
    logits_t = dec_t @ emb.T
    np.testing.assert_allclose(np.asarray(logits_f), logits_t, atol=5e-3)


def test_log_mel_shape():
    wav = np.sin(2 * np.pi * 440 * np.arange(16000) / 16000).astype(np.float32)
    mel = log_mel_spectrogram(wav)
    assert mel.shape == (80, 3000)
    assert np.isfinite(mel).all()
    assert mel.max() <= 2.0  # (log10+4)/4 normalization, 8 dB range
    assert mel.max() - mel.min() <= 2.01  # dynamic range clamp


def test_greedy_decode_smoke(tiny_pair):
    _, path = tiny_pair
    params, cfg = load_whisper(path)
    asr = WhisperASR(params, cfg, max_tokens=16)
    wav = (np.random.default_rng(1).standard_normal(16000) * 0.1).astype(np.float32)
    ids = asr.transcribe_tokens(wav, lang="en")
    assert isinstance(ids, list) and len(ids) <= 16


def test_language_autodetect(tiny_pair):
    """lang=None → detect_language picks the argmax language token from the
    first decode step (reference whisper.decode autodetect,
    transcribe/model.py:144-171)."""
    _, path = tiny_pair
    params, cfg = load_whisper(path)
    asr = WhisperASR(params, cfg, max_tokens=16)
    wav = (np.random.default_rng(2).standard_normal(16000) * 0.1).astype(np.float32)
    lang = asr.detect_language(wav)
    assert lang in asr.st.langs
    # detection is deterministic and autodetected decode runs end-to-end
    assert asr.detect_language(wav) == lang
    ids = asr.transcribe_tokens(wav, lang=None)
    assert isinstance(ids, list)


def test_transcribe_tool_with_native_whisper(tiny_pair, tmp_path):
    """VERDICT #8 done-criterion: the transcribe tool produces metadata.csv
    from a local whisper .pt with no external backend registration."""
    import asyncio
    import base64

    from xva_trainer_tpu.data.audio_io import save_wav
    from xva_trainer_tpu.tools.text_tools import TranscribeTool

    _, ckpt_path = tiny_pair
    # tokenizer assets beside the checkpoint
    lines = []
    for i in range(1000):
        lines.append(base64.b64encode(f"w{i} ".encode()) + b" " + str(i).encode())
    with open(os.path.join(os.path.dirname(ckpt_path),
                           "multilingual.tiktoken"), "wb") as f:
        f.write(b"\n".join(lines))

    wav_dir = os.path.join(tmp_path, "clips")
    os.makedirs(wav_dir)
    t = np.arange(22050) / 22050
    for i in range(2):
        save_wav(os.path.join(wav_dir, f"c{i}.wav"),
                 (0.2 * np.sin(2 * np.pi * (200 + 100 * i) * t)).astype(np.float32))

    TranscribeTool._asr_backend = None
    tool = TranscribeTool()
    asyncio.run(
        tool.run({"inPath": wav_dir, "outputDirectory": str(tmp_path),
                  "toolSettings": {"modelPath": ckpt_path}})
    )
    TranscribeTool._asr_backend = None
    meta = os.path.join(tmp_path, "metadata.csv")
    assert os.path.exists(meta)
    content = open(meta, encoding="utf8").read()
    assert "c0.wav|" in content and "c1.wav|" in content


def test_bpe_decoder_tiktoken(tmp_path):
    import base64

    lines = []
    for i, word in enumerate([b"hello", b" world", b"!"]):
        lines.append(base64.b64encode(word) + b" " + str(i).encode())
    p = os.path.join(tmp_path, "multilingual.tiktoken")
    with open(p, "wb") as f:
        f.write(b"\n".join(lines))
    dec = BpeDecoder.find(str(tmp_path))
    assert dec is not None
    assert dec.decode([0, 1, 2]) == "hello world!"


def test_special_token_canonical_ids():
    """The multilingual vocab's special ids must match openai/whisper's
    tokenizer exactly — off-by-N breaks decoding on real checkpoints."""
    from xva_trainer_tpu.models.whisper.model import SpecialTokens

    st = SpecialTokens(51865)
    assert st.eot == 50257          # <|endoftext|>
    assert st.sot == 50258          # <|startoftranscript|>
    assert st.lang_id("en") == 50259
    assert st.transcribe == 50359
    assert st.no_timestamps == 50363
    assert SpecialTokens(51864).eot == 50256  # English-only models


def test_import_whisper_cli_roundtrip(tiny_pair, tmp_path):
    """`cli import-whisper` (VERDICT r3 missing #3): both accepted source
    layouts — an OpenAI-style .pt and a HuggingFace checkpoint dir — convert
    to a whisper.pt the transcribe tool loads, with tokenizer assets carried
    along."""
    import json

    from xva_trainer_tpu.interop.whisper_map import import_whisper_checkpoint
    from xva_trainer_tpu.tools.text_tools import TranscribeTool

    hf, ckpt_path = tiny_pair

    # (a) OpenAI-style .pt
    out_a = import_whisper_checkpoint(ckpt_path, str(tmp_path / "a"))
    assert os.path.basename(out_a) == "whisper.pt"
    params, cfg = load_whisper(out_a)
    assert cfg.n_audio_layer == 2 and cfg.n_vocab == 1000

    # (b) HuggingFace dir: config.json + pytorch_model.bin (HF keys) + vocab
    hf_dir = tmp_path / "hf"
    hf_dir.mkdir()
    c = hf.config
    json.dump({
        "model_type": "whisper", "vocab_size": c.vocab_size,
        "d_model": c.d_model, "encoder_layers": c.encoder_layers,
        "decoder_layers": c.decoder_layers,
        "encoder_attention_heads": c.encoder_attention_heads,
        "decoder_attention_heads": c.decoder_attention_heads,
        "max_source_positions": c.max_source_positions,
        "max_target_positions": c.max_target_positions,
        "num_mel_bins": c.num_mel_bins,
    }, open(hf_dir / "config.json", "w"))
    torch.save(hf.state_dict(), hf_dir / "pytorch_model.bin")
    json.dump({"hello": 5, "world": 7}, open(hf_dir / "vocab.json", "w"))
    out_b = import_whisper_checkpoint(str(hf_dir), str(tmp_path / "b"))
    params_b, cfg_b = load_whisper(out_b)
    assert cfg_b.n_text_layer == 2
    assert os.path.exists(tmp_path / "b" / "vocab.json")  # tokenizer carried

    # both sources import to numerically identical flax params
    la = jax.tree_util.tree_leaves(params)
    lb = jax.tree_util.tree_leaves(params_b)
    assert len(la) == len(lb)
    for xa, xb in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))

    # the transcribe tool loads the converted checkpoint directly
    TranscribeTool._asr_backend = None
    fn = TranscribeTool()._load_backend(out_b, lang="en")
    assert fn is not None
    text = fn(np.zeros(16000, np.float32))
    assert isinstance(text, str)
