"""Whisper ASR in flax — the shipped transcription backend.

Replaces the reference's vendored OpenAI whisper (reference
python/transcribe/model.py:144-257: load local {size}.pt, 30 s log-mel,
``whisper.decode`` greedy). TPU-first: the encoder runs once per clip; the
decoder is ONE jitted fixed-shape step over a static token buffer (no
KV-cache shape churn, no per-step recompiles).

Weights come from the user's local whisper checkpoint via
interop.whisper_map (OpenAI .pt or HuggingFace naming).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.mel import mel_filterbank

SAMPLE_RATE = 16000
N_FFT = 400
HOP = 160
N_MELS = 80
CHUNK_SECONDS = 30
N_SAMPLES = SAMPLE_RATE * CHUNK_SECONDS   # 480000
N_FRAMES = N_SAMPLES // HOP               # 3000


@dataclasses.dataclass(frozen=True)
class WhisperConfig:
    n_vocab: int = 51865
    n_audio_ctx: int = 1500
    n_audio_state: int = 384
    n_audio_head: int = 6
    n_audio_layer: int = 4
    n_text_ctx: int = 448
    n_text_state: int = 384
    n_text_head: int = 6
    n_text_layer: int = 4
    n_mels: int = 80  # large-v3 / v3-turbo use 128

    @property
    def multilingual(self) -> bool:
        return self.n_vocab >= 51865


# "tiny" through "large" dims (OpenAI ModelDimensions)
WHISPER_SIZES = {
    "tiny": WhisperConfig(51865, 1500, 384, 6, 4, 448, 384, 6, 4),
    "base": WhisperConfig(51865, 1500, 512, 8, 6, 448, 512, 8, 6),
    "small": WhisperConfig(51865, 1500, 768, 12, 12, 448, 768, 12, 12),
    "medium": WhisperConfig(51865, 1500, 1024, 16, 24, 448, 1024, 16, 24),
    "large": WhisperConfig(51865, 1500, 1280, 20, 32, 448, 1280, 20, 32),
}


def log_mel_spectrogram(audio: np.ndarray, n_mels: int = N_MELS) -> np.ndarray:
    """OpenAI whisper log-mel: 400/160 hann STFT → slaney mel → log10,
    8-dB dynamic range, (x+4)/4 (whisper/audio.py semantics)."""
    x = np.asarray(audio, np.float32)
    if len(x) > N_SAMPLES:
        x = x[:N_SAMPLES]
    else:
        x = np.pad(x, (0, N_SAMPLES - len(x)))
    window = np.hanning(N_FFT + 1)[:-1].astype(np.float32)
    frames = 1 + N_SAMPLES // HOP
    xp = np.pad(x, (N_FFT // 2, N_FFT // 2), mode="reflect")
    idx = np.arange(N_FFT)[None, :] + HOP * np.arange(frames)[:, None]
    stft = np.fft.rfft(xp[idx] * window, axis=1)
    mag2 = (np.abs(stft[:-1]) ** 2).T  # drop the final frame like whisper
    fb = mel_filterbank(SAMPLE_RATE, N_FFT, n_mels, 0.0, SAMPLE_RATE / 2)
    mel = fb @ mag2
    log_spec = np.log10(np.maximum(mel, 1e-10))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).astype(np.float32)  # (80, 3000)


def _sinusoids(length: int, channels: int) -> np.ndarray:
    log_timescale = np.log(10000) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    t = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1).astype(np.float32)


class MHA(nn.Module):
    n_state: int
    n_head: int

    @nn.compact
    def __call__(self, x, xa=None, mask=None):
        """x (B, T, C) queries; xa (B, S, C) cross keys (None = self)."""
        q = nn.Dense(self.n_state, name="query")(x)
        src = x if xa is None else xa
        k = nn.Dense(self.n_state, use_bias=False, name="key")(src)
        v = nn.Dense(self.n_state, name="value")(src)
        B, T, C = q.shape
        S = k.shape[1]
        H = self.n_head
        d = C // H
        scale = d ** -0.25
        qh = (q.reshape(B, T, H, d) * scale).transpose(0, 2, 1, 3)
        kh = (k.reshape(B, S, H, d) * scale).transpose(0, 2, 3, 1)
        vh = v.reshape(B, S, H, d).transpose(0, 2, 1, 3)
        qk = qh @ kh  # (B,H,T,S)
        if mask is not None:
            qk = qk + mask[:T, :S]
        w = jax.nn.softmax(qk, axis=-1)
        out = (w @ vh).transpose(0, 2, 1, 3).reshape(B, T, C)
        return nn.Dense(self.n_state, name="out")(out)


class ResidualBlock(nn.Module):
    n_state: int
    n_head: int
    cross: bool = False

    @nn.compact
    def __call__(self, x, xa=None, mask=None):
        x = x + MHA(self.n_state, self.n_head, name="attn")(
            nn.LayerNorm(epsilon=1e-5, name="attn_ln")(x), mask=mask
        )
        if self.cross:
            x = x + MHA(self.n_state, self.n_head, name="cross_attn")(
                nn.LayerNorm(epsilon=1e-5, name="cross_attn_ln")(x), xa=xa
            )
        h = nn.LayerNorm(epsilon=1e-5, name="mlp_ln")(x)
        h = nn.Dense(self.n_state * 4, name="mlp_0")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.n_state, name="mlp_2")(h)
        return x + h


class AudioEncoder(nn.Module):
    cfg: WhisperConfig

    @nn.compact
    def __call__(self, mel):
        """mel (B, 80, 3000) → (B, 1500, C)."""
        c = self.cfg
        x = jnp.swapaxes(mel, 1, 2)  # (B, T, 80)
        x = nn.Conv(c.n_audio_state, (3,), padding=1, name="conv1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Conv(c.n_audio_state, (3,), strides=(2,), padding=1,
                    name="conv2")(x)
        x = nn.gelu(x, approximate=False)
        x = x + _sinusoids(c.n_audio_ctx, c.n_audio_state)[None]
        for i in range(c.n_audio_layer):
            x = ResidualBlock(c.n_audio_state, c.n_audio_head,
                              name=f"block_{i}")(x)
        return nn.LayerNorm(epsilon=1e-5, name="ln_post")(x)


class TextDecoder(nn.Module):
    cfg: WhisperConfig

    @nn.compact
    def __call__(self, tokens, audio_feats):
        """tokens (B, T) int32; audio_feats (B, 1500, C) → logits (B, T, V)."""
        c = self.cfg
        emb = self.param(
            "token_embedding",
            nn.initializers.normal(0.02), (c.n_vocab, c.n_text_state),
        )
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.02), (c.n_text_ctx, c.n_text_state),
        )
        T = tokens.shape[1]
        x = emb[tokens] + pos[:T]
        mask = jnp.triu(
            jnp.full((c.n_text_ctx, c.n_text_ctx), -jnp.inf), k=1
        )
        for i in range(c.n_text_layer):
            x = ResidualBlock(c.n_text_state, c.n_text_head, cross=True,
                              name=f"block_{i}")(x, xa=audio_feats, mask=mask)
        x = nn.LayerNorm(epsilon=1e-5, name="ln")(x)
        return x @ emb.T


class Whisper(nn.Module):
    cfg: WhisperConfig = WhisperConfig()

    def setup(self):
        self.encoder = AudioEncoder(self.cfg)
        self.decoder = TextDecoder(self.cfg)

    def encode(self, mel):
        return self.encoder(mel)

    def decode_logits(self, tokens, audio_feats):
        return self.decoder(tokens, audio_feats)

    def __call__(self, mel, tokens):
        return self.decoder(tokens, self.encoder(mel))


# ---------------- special-token layout (OpenAI multilingual vocab) ----------

WHISPER_LANGS = (
    "en zh de es ru ko fr ja pt tr pl ca nl ar sv it id hi fi vi he uk el ms "
    "cs ro da hu ta no th ur hr bg lt la mi ml cy sk te fa lv bn sr az sl kn "
    "et mk br eu is hy ne mn bs kk sq sw gl mr pa si km sn yo so af oc ka be "
    "tg sd gu am yi lo uz fo ht ps tk nn mt sa lb my bo tl mg as tt haw ln ha "
    "ba jw su"
).split()


class SpecialTokens:
    """Token-id layout of the multilingual whisper vocab."""

    def __init__(self, n_vocab: int = 51865):
        # canonical layout (openai/whisper tokenizer): ... text tokens | eot |
        # sot | langs | translate | transcribe | sot_lm | sot_prev |
        # no_speech | no_timestamps | 1501 timestamp tokens.
        # multilingual (51865, 99 langs): eot = 50257; large-v3 (51866,
        # 100 langs incl. yue): eot = 50257; English-only (51864): eot = 50256.
        self.langs = list(WHISPER_LANGS)
        if n_vocab >= 51866:
            self.langs.append("yue")
        n_timestamps = 1501 if n_vocab > 2000 else 0
        specials = 8  # eot..no_timestamps incl. sot_lm
        base = n_vocab - n_timestamps - len(self.langs) - specials
        if base < 0:  # tiny test vocabs: same order, packed at the top
            base = max(0, n_vocab - len(self.langs) - specials)
        self.eot = base
        self.sot = base + 1
        self.lang_base = base + 2
        self.translate = self.lang_base + len(self.langs)
        self.transcribe = self.translate + 1
        sot_lm = self.transcribe + 1
        self.sot_prev = sot_lm + 1
        self.no_speech = self.sot_prev + 1
        self.no_timestamps = self.no_speech + 1

    def lang_id(self, lang: str) -> int:
        return self.lang_base + self.langs.index(lang)


class WhisperASR:
    """Host-facing greedy decoder (the role of whisper.decode in the
    reference transcribe tool)."""

    def __init__(self, params, cfg: WhisperConfig, max_tokens: int = 224):
        self.cfg = cfg
        self.params = params
        self.model = Whisper(cfg)
        self.st = SpecialTokens(cfg.n_vocab)
        self.max_tokens = max_tokens
        self._encode = jax.jit(
            lambda p, mel: self.model.apply(p, mel, method=Whisper.encode)
        )

        @jax.jit
        def next_token(p, tokens_buf, idx, feats):
            logits = self.model.apply(p, tokens_buf, feats,
                                      method=Whisper.decode_logits)
            # logits at the current position; suppress blank/notimestamp range
            row = logits[0, idx]
            return jnp.argmax(row[: self.st.eot + 1])

        self._next = next_token

        @jax.jit
        def lang_logits(p, feats):
            # one decode step after SOT; probability mass over the language
            # tokens is the detector (reference whisper.detect_language,
            # transcribe/model.py:144-171 → whisper/decoding.py)
            buf = jnp.zeros((1, self.max_tokens), jnp.int32)
            buf = buf.at[0, 0].set(self.st.sot)
            logits = self.model.apply(p, buf, feats,
                                      method=Whisper.decode_logits)
            row = logits[0, 0]
            n = len(self.st.langs)
            return row[self.st.lang_base: self.st.lang_base + n]

        self._lang_logits = lang_logits

    def detect_language(self, audio16k_or_feats, is_feats: bool = False) -> str:
        """Most-probable language code from the first decode step (the
        reference's whisper.decode language autodetect path)."""
        if not self.cfg.multilingual:
            return "en"
        if is_feats:
            feats = audio16k_or_feats
        else:
            mel = log_mel_spectrogram(audio16k_or_feats, self.cfg.n_mels)[None]
            feats = self._encode(self.params, jnp.asarray(mel))
        probs = np.asarray(self._lang_logits(self.params, feats))
        return self.st.langs[int(np.argmax(probs))]

    def transcribe_tokens(self, audio16k: np.ndarray,
                          lang: Optional[str] = "en") -> list:
        mel = log_mel_spectrogram(audio16k, self.cfg.n_mels)[None]
        feats = self._encode(self.params, jnp.asarray(mel))
        st = self.st
        prefix = [st.sot]
        if self.cfg.multilingual:
            # lang=None/"" → autodetect (reference whisper_lang "detect")
            if not lang:
                lang = self.detect_language(feats, is_feats=True)
            prefix += [st.lang_id(lang), st.transcribe]
        prefix.append(st.no_timestamps)
        buf = np.zeros((1, self.max_tokens), np.int32)
        buf[0, : len(prefix)] = prefix
        out = []
        idx = len(prefix) - 1
        for _ in range(self.max_tokens - len(prefix)):
            nxt = int(self._next(self.params, jnp.asarray(buf), idx, feats))
            if nxt == st.eot:
                break
            idx += 1
            buf[0, idx] = nxt
            out.append(nxt)
        return out
