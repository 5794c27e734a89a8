"""Transcription, WER evaluation, make_srt, and source separation tools
(reference python/{transcribe,wer_evaluation,make_srt,
audio_source_separation}/model.py)."""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from ..data.audio_io import resample, save_wav
from .audio_tools import decode_any, format_srt, list_audio_files
from .base import BaseTool


def wer(reference: str, hypothesis: str) -> float:
    """Word error rate via Levenshtein distance (native jiwer replacement,
    reference wer_evaluation/model.py:36-85)."""
    r = reference.lower().split()
    h = hypothesis.lower().split()
    if not r:
        return 0.0 if not h else 1.0
    d = np.zeros((len(r) + 1, len(h) + 1), np.int32)
    d[:, 0] = np.arange(len(r) + 1)
    d[0, :] = np.arange(len(h) + 1)
    for i in range(1, len(r) + 1):
        for j in range(1, len(h) + 1):
            cost = 0 if r[i - 1] == h[j - 1] else 1
            d[i, j] = min(d[i - 1, j] + 1, d[i, j - 1] + 1, d[i - 1, j - 1] + cost)
    return float(d[len(r), len(h)]) / len(r)


class TranscribeTool(BaseTool):
    """'transcribe': ASR over a directory → metadata.csv with incremental
    flush + resume (reference transcribe/model.py:118-257).

    Backend: a local whisper checkpoint via transformers (pass
    ``toolSettings.modelPath``), or any callable registered with
    ``set_asr_backend``. Zero-egress environments must provide local weights;
    without a backend the tool reports a clear tasks_error.
    """

    _asr_backend = None
    _asr_cache: Dict = {}  # (model_path, lang) -> fn: loaded models are
    # language-parameterized closures, so EN and DE runs must not share one

    @classmethod
    def set_asr_backend(cls, fn):
        """fn(wav_16k: np.ndarray) -> str"""
        cls._asr_backend = fn

    def _load_backend(self, model_path: Optional[str], lang: str = "en"):
        if TranscribeTool._asr_backend is not None:
            return TranscribeTool._asr_backend
        model_path = model_path or os.environ.get("XVA_WHISPER_CKPT")
        cache_key = (model_path, lang)
        cached = TranscribeTool._asr_cache.get(cache_key)
        if cached is not None:
            return cached
        if model_path and os.path.isfile(model_path) and model_path.endswith(".pt"):
            # native flax whisper from the local checkpoint (the reference's
            # transcribe/whisper/{size}.pt role — transcribe/model.py:150-157)
            from ..interop.whisper_map import load_whisper
            from ..models.whisper import BpeDecoder, WhisperASR

            params, cfg = load_whisper(model_path)
            asr = WhisperASR(params, cfg)
            tok = BpeDecoder.find(
                os.path.dirname(model_path),
                os.path.join(os.path.dirname(model_path), "assets"),
            )

            def fn(wav16k):
                ids = asr.transcribe_tokens(wav16k, lang=lang)
                if tok is None:
                    # no tokenizer assets: emit ids so resume still works
                    return " ".join(str(i) for i in ids)
                return tok.decode(ids).strip()

            TranscribeTool._asr_cache[cache_key] = fn
            return fn
        if model_path and os.path.isdir(model_path) and os.path.exists(
            os.path.join(model_path, "config.json")
        ):
            import json as _json

            with open(os.path.join(model_path, "config.json")) as f:
                mtype = _json.load(f).get("model_type", "")
            if mtype == "wav2vec2":
                # native flax wav2vec2 CTC (the reference's legacy
                # per-language backend — transcribe/wav2vec2/model.py)
                from ..models.wav2vec2 import Wav2Vec2CTC

                asr = Wav2Vec2CTC.from_hf_dir(model_path)
                fn = lambda wav16k: asr.transcribe(wav16k)
                TranscribeTool._asr_cache[cache_key] = fn
                return fn
        if model_path and os.path.exists(model_path):
            from transformers import pipeline

            asr = pipeline("automatic-speech-recognition", model=model_path)

            def fn(wav16k):
                return asr({"raw": wav16k, "sampling_rate": 16000})["text"].strip()

            TranscribeTool._asr_cache[cache_key] = fn
            return fn
        return None

    async def run(self, data: Dict, websocket=None):
        in_path = data.get("inPath") or data["inputDirectory"]
        out_dir = data.get("outputDirectory") or in_path
        settings = data.get("toolSettings", {})
        # reference UI field is whisper_lang; blank/"detect" → autodetect
        lang = settings.get("whisper_lang", settings.get("language", "en"))
        if isinstance(lang, str) and lang.strip().lower() in ("", "detect",
                                                              "auto"):
            lang = None
        backend = self._load_backend(settings.get("modelPath"), lang)
        if backend is None:
            await self.error(
                websocket,
                "no ASR model installed. One-time setup: download any "
                "whisper checkpoint (e.g. "
                "huggingface-cli download openai/whisper-base "
                "--local-dir /tmp/whisper-base, or an OpenAI whisper "
                "{size}.pt), then run\n"
                "  python -m xva_trainer_tpu.cli import-whisper "
                "/tmp/whisper-base --out ~/.xva/whisper\n"
                "and set XVA_WHISPER_CKPT=~/.xva/whisper/whisper.pt (or pass "
                "toolSettings.modelPath). Custom backends: "
                "TranscribeTool.set_asr_backend",
            )
            return
        os.makedirs(out_dir, exist_ok=True)
        meta_path = os.path.join(out_dir, "metadata.csv")
        existing = {}
        if os.path.exists(meta_path):  # resume (reference :118-133)
            with open(meta_path, encoding="utf-8") as f:
                for line in f:
                    if "|" in line:
                        k, v = line.strip().split("|", 1)
                        existing[k] = v
        files = list_audio_files(in_path)
        # resume matching is extension-insensitive: LJSpeech-style metadata
        # keys are stems ("LJ001-0001") while files carry ".wav" — comparing
        # raw keys would re-transcribe (and duplicate) every resumed record
        done_stems = {os.path.splitext(k)[0] for k, v in existing.items()
                      if v.strip()}
        done = sum(1 for f in files
                   if os.path.splitext(os.path.basename(f))[0] in done_stems)
        self.write_progress(out_dir, done, len(files))
        for f in files:
            name = os.path.basename(f)
            if os.path.splitext(name)[0] in done_stems:
                continue
            y, sr = decode_any(f)
            text = backend(resample(y, sr, 16000))
            # write back under an existing key for this stem (an empty-text
            # line awaiting transcription) rather than adding a duplicate row
            stem = os.path.splitext(name)[0]
            key = next((k for k in existing
                        if os.path.splitext(k)[0] == stem), name)
            existing[key] = text
            done += 1
            if done % 10 == 0:  # incremental flush every 10 files (:219-257)
                self._flush(meta_path, existing)
            self.write_progress(out_dir, done, len(files))
        self._flush(meta_path, existing)
        await self.done(websocket)

    @staticmethod
    def _flush(meta_path, existing):
        with open(meta_path, "w", encoding="utf-8") as f:
            f.write("\n".join(f"{k}|{v}" for k, v in existing.items()))


class WerEvaluationTool(BaseTool):
    """'wer_evaluation': WER between user metadata.csv and ASR metadata.csv,
    sorted report (reference wer_evaluation/model.py:36-85)."""

    async def run(self, data: Dict, websocket=None):
        user_csv = data.get("userMetadata") or data["inPath"]
        asr_csv = data.get("asrMetadata") or data["inputDirectory2"]
        out_path = data.get("outputFile") or os.path.join(
            os.path.dirname(user_csv), "wer_report.txt"
        )

        def read_csv(p):
            out = {}
            with open(p, encoding="utf-8") as f:
                for line in f:
                    if "|" in line:
                        k, v = line.strip().split("|", 1)
                        out[os.path.splitext(k)[0]] = v.split("|")[0]
            return out

        user = read_csv(user_csv)
        hyp = read_csv(asr_csv)
        rows = []
        for k, ref_text in user.items():
            if k in hyp:
                rows.append((wer(ref_text, hyp[k]), k, ref_text, hyp[k]))
        rows.sort(reverse=True)
        with open(out_path, "w", encoding="utf-8") as f:
            for w, k, r, h in rows:
                f.write(f"{w:.3f} | {k} | {r} | {h}\n")
        mean_wer = float(np.mean([r[0] for r in rows])) if rows else 0.0
        await self.task_info(websocket, f"mean WER: {mean_wer:.3f} over {len(rows)} files")
        await self.done(websocket)


class MakeSrtTool(BaseTool):
    """'make_srt': 16 kHz convert → diarize → transcribe turns → .srt
    (composite tool, reference make_srt/model.py:49-135)."""

    async def run(self, data: Dict, websocket=None):
        in_path = data.get("inPath") or data["inputDirectory"]
        out_dir = data.get("outputDirectory") or os.path.dirname(in_path)
        os.makedirs(out_dir, exist_ok=True)
        files = list_audio_files(in_path)

        from .speaker_tools import _get_encoder, diarize

        enc = _get_encoder(self.models_manager)
        asr = TranscribeTool(self.logger, self.PROD, self.device, self.models_manager)
        backend = asr._load_backend(data.get("toolSettings", {}).get("modelPath"))

        for fi, f in enumerate(files):
            y, sr = decode_any(f)
            turns = diarize(y, sr, enc)
            entries = []
            for t in turns:
                seg = y[int(t["start"] * sr) : int(t["end"] * sr)]
                text = (
                    backend(resample(seg, sr, 16000)) if backend
                    else f"[speaker_{t['speaker']}]"
                )
                entries.append({"start": t["start"], "end": t["end"], "text": text})
            stem = os.path.splitext(os.path.basename(f))[0]
            with open(os.path.join(out_dir, stem + ".srt"), "w", encoding="utf-8") as sf:
                sf.write(format_srt(entries))
            self.write_progress(out_dir, fi + 1, len(files))
        await self.done(websocket)


def default_enhancer_path() -> str:
    """Committed default denoiser weights (VERDICT r1 #6)."""
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "assets", "enhancer_default.npz")


class SourceSeparationTool(BaseTool):
    """'ass': speech enhancement. The reference runs a pretrained Asteroid
    DCCRNet (audio_source_separation/model.py:16-42). Here, in priority
    order: a registered backend; the native learned complex-ratio-mask
    denoiser (models.enhance) when trained weights are available
    (toolSettings.modelPath or XVA_ASS_CKPT orbax dir); else the native
    spectral-gating enhancer (per-file noise floor + Wiener mask)."""

    _model_backend = None

    @classmethod
    def set_model_backend(cls, fn):
        cls._model_backend = fn

    def _load_learned(self, model_path: Optional[str]):
        if SourceSeparationTool._model_backend is not None:
            return SourceSeparationTool._model_backend
        model_path = model_path or os.environ.get("XVA_ASS_CKPT")
        if model_path and os.path.isdir(model_path):
            import orbax.checkpoint as ocp

            from ..models.enhance import SpeechEnhancer

            params = ocp.StandardCheckpointer().restore(
                os.path.abspath(model_path)
            )
            enh = SpeechEnhancer(params)
            fn = lambda y, sr: enh.enhance(y)
            SourceSeparationTool._model_backend = fn
            return fn
        # committed default weights (scripts/train_default_enhancer.py) make
        # the learned path the default, like the reference's bundled DCCRNet
        default = default_enhancer_path()
        if os.path.exists(default):
            from ..models.enhance import SpeechEnhancer
            from ..models.enhance.model import load_params_npz

            enh = SpeechEnhancer(load_params_npz(default))
            fn = lambda y, sr: enh.enhance(y)
            SourceSeparationTool._model_backend = fn
            return fn
        return None

    async def run(self, data: Dict, websocket=None):
        in_path = data.get("inPath") or data["inputDirectory"]
        out_dir = data.get("outputDirectory") or os.path.dirname(in_path)
        os.makedirs(out_dir, exist_ok=True)
        files = list_audio_files(in_path)
        settings = data.get("toolSettings", {})
        backend = self._load_learned(settings.get("modelPath"))

        def work(f):
            y, sr = decode_any(f)
            if backend is not None:
                out = backend(y, sr)
            else:
                out = self._spectral_gate(y)
            save_wav(os.path.join(out_dir, os.path.basename(f)), out, sr)

        await self.run_items(files, work, websocket, out_dir)
        await self.done(websocket)

    @staticmethod
    def _spectral_gate(y: np.ndarray, n_fft=1024, hop=256) -> np.ndarray:
        pad = n_fft // 2
        yp = np.pad(y, (pad, pad), mode="reflect")
        n = 1 + (len(yp) - n_fft) // hop
        idx = np.arange(n)[:, None] * hop + np.arange(n_fft)[None, :]
        w = np.hanning(n_fft)
        spec = np.fft.rfft(yp[idx] * w, axis=1)
        mag = np.abs(spec)
        noise = np.percentile(mag, 10, axis=0)  # per-bin noise floor
        snr = np.maximum(mag / np.maximum(noise[None, :], 1e-8) - 1.0, 0.0)
        mask = snr / (snr + 1.0)  # Wiener
        spec = spec * mask
        frames = np.fft.irfft(spec, n=n_fft, axis=1) * w
        out = np.zeros(len(yp))
        wsum = np.zeros(len(yp))
        for i in range(n):
            out[i * hop : i * hop + n_fft] += frames[i]
            wsum[i * hop : i * hop + n_fft] += w**2
        out = out / np.maximum(wsum, 1e-8)
        return out[pad : pad + len(y)].astype(np.float32)
