"""Full v2 training pipeline: FastPitch stages 1-4 → HiFi-GAN stage 5 → export,
plus the text→mel→waveform inference path (the reference's /exportWav flow).

Reference: stage hand-off "move to hifi" (python/fastpitch1_1/xva_train.py:160-162),
inference wrapper FastPitch1_1.infer (:1172-1233).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.audio_io import save_wav
from ..data.dataset import BucketBatcher, FeatureCache
from ..data.text import TextProcessor
from ..models.fastpitch import FastPitch, FastPitchConfig
from ..models.hifigan import Generator, HifiganConfig
from .fastpitch_trainer import FastPitchTrainConfig, FastPitchTrainer
from .hifigan_trainer import HifiganTrainConfig, HifiganTrainer
from .metrics import TrainingLogger


@dataclasses.dataclass
class PipelineConfig:
    dataset_path: str = ""
    output_path: str = "out"
    batch_size: int = 32
    target_bs: int = 256
    max_fp_epochs: int = 10**6
    max_hifi_epochs: int = 10**6
    voice_name: str = "voice"
    # bf16 compute / fp32 masters (train/amp.py); reference AMP default-on
    use_amp: bool = True
    # per-queue-item config parity (reference javascript/train.js:711-747)
    force_stage: int = 0          # 0 = auto; 1-4 FastPitch, 5 = HiFi-GAN only
    epochs_per_checkpoint: int = 1  # the reference's bkp_every_x
    # background compile warming (train/precompile.py): overlap every later
    # stage's + HiFi-GAN's XLA compiles with stage-1 training instead of
    # paying them serially at each stage's first dispatch
    precompile: bool = True


STAGE_BS_MULT = {1: 1.5, 2: 12.0, 3: 3.5, 4: 4.0}


def stage_batch_size(base: int, stage: int, max_file_len_sec: float,
                     n_devices: int = 1, divisor: int = 1) -> int:
    """Per-stage batch sizing (reference fastpitch1_1/xva_train.py:387-404):
    stage multiplier ×1.5/12/3.5/4, × device count, × (10 / max clip
    seconds). The result is rounded to a multiple of ``divisor`` (the mesh's
    data-axis size — shard_batch requires batch % n_data == 0)."""
    mult = STAGE_BS_MULT.get(stage, 1.0)
    file_mult = 10.0 / max(max_file_len_sec, 1e-6)
    bs = max(1, int(base * mult * n_devices * file_mult))
    d = max(1, divisor)
    return max(d, (bs // d) * d)


def _is_oom(err: Exception) -> bool:
    s = str(err)
    return "RESOURCE_EXHAUSTED" in s or "out of memory" in s.lower()


def train_v2_pipeline(
    cfg: PipelineConfig,
    model_cfg: FastPitchConfig = FastPitchConfig(),
    gen_cfg: HifiganConfig = HifiganConfig(),
    mesh=None,
    max_iters: Optional[int] = None,
    _attempt: int = 0,
    on_trainer=None,
) -> Dict:
    """The reference's stage 1→5 schedule as one call, with the OOM
    batch-size retreat (reference handleTrainer:131-145: on device OOM, drop
    batch_size by 3 and restart from the last checkpoint).

    on_trainer(trainer) is called as each stage's trainer comes alive, so a
    server session can reach pause/stop flags mid-pipeline."""
    try:
        return _train_v2_pipeline(cfg, model_cfg, gen_cfg, mesh, max_iters,
                                  on_trainer)
    except Exception as e:
        if _is_oom(e) and cfg.batch_size > 3 and _attempt < 8:
            cfg = dataclasses.replace(cfg, batch_size=cfg.batch_size - 3)
            return train_v2_pipeline(cfg, model_cfg, gen_cfg, mesh,
                                     max_iters, _attempt + 1, on_trainer)
        raise


def _train_v2_pipeline(cfg, model_cfg, gen_cfg, mesh, max_iters,
                       on_trainer=None) -> Dict:
    logger = TrainingLogger(cfg.output_path)
    tp = TextProcessor()
    cache = FeatureCache(cfg.dataset_path, tp.encode)
    cache.build()
    max_len_sec = cache.max_file_len_sec()
    if mesh is None:
        # build it here so batch sizing sees the real device count (the
        # trainers would otherwise build an all-device mesh themselves and
        # shard_batch would reject undividable batches)
        from ..parallel.mesh import make_mesh

        mesh = make_mesh()
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    n_data = int(mesh.shape.get("data", 1))

    fp_cfg = FastPitchTrainConfig(
        output_dir=cfg.output_path,
        batch_size=cfg.batch_size,
        target_bs=cfg.target_bs,
        use_amp=cfg.use_amp,
        force_stage=min(cfg.force_stage, 4),
        epochs_per_checkpoint=cfg.epochs_per_checkpoint,
    )
    fp = FastPitchTrainer(cache, fp_cfg, model_cfg, mesh=mesh, logger=logger)
    if on_trainer:
        on_trainer(fp)

    # ARPAbet p=0.3 training mix when a CMUdict is available
    # (reference xva_train.py:307)
    arpabet_tp = None
    cmu = os.environ.get("XVA_CMUDICT") or os.path.join(
        cfg.dataset_path, "cmudict.txt"
    )
    if os.path.exists(cmu):
        arpabet_tp = TextProcessor(p_arpabet=0.3, cmudict_path=cmu)

    def batcher_for(stage: int) -> BucketBatcher:
        bs = stage_batch_size(cfg.batch_size, stage, max_len_sec, n_dev,
                              divisor=n_data)
        # stage 2 with pre-extracted durations never reads the attention
        # prior — skip the per-item betabinomial collate work at its 12x
        # batch multiplier. device_prior steps (the default) compute it on
        # device from lengths, so the host never collates it at all.
        with_prior = (not fp_cfg.device_prior
                      and not (stage == 2 and cache.has_durations()))
        b = BucketBatcher(cache, batch_size=bs, with_prior=with_prior,
                          device_prior=fp_cfg.device_prior)
        b.arpabet_encoder = arpabet_tp
        # pre-extracted durations survive batcher swaps (see fp.train)
        b.use_durs = cache.has_durations()
        return b

    hifi_cfg = HifiganTrainConfig(
        output_dir=os.path.join(cfg.output_path, "hifi"),
        batch_size=min(16, cfg.batch_size),
        use_amp=cfg.use_amp,
    )
    pre = None
    hifi_holder: Dict = {}

    def _build_hifi():
        # commit=False: built on a background thread while FastPitch trains —
        # the G+D params + optimizer states stay host-resident so they don't
        # occupy HBM through FastPitch's 12x-batch stage 2 (ADVICE r4
        # medium); hifi.train() commits at the hand-off
        h = HifiganTrainer(cfg.dataset_path, hifi_cfg, gen_cfg, mesh=mesh,
                           logger=logger)
        h.setup(commit=False)
        h.precompile()
        hifi_holder["trainer"] = h

    if cfg.force_stage == 5:
        # per-queue-item "stage 5": straight to the vocoder (reference
        # force_stage semantics, javascript/train.js:711-747)
        fp_result, fp_path = {"skipped": True}, None
        logger.log("[pipeline] force_stage=5: skipping FastPitch stages 1-4")
    else:
        batcher = batcher_for(fp.stage)
        fp.setup(batcher)
        if cfg.precompile and os.environ.get("XVA_PRECOMPILE", "1") != "0":
            # warm every compile the schedule will ever need, in parallel,
            # while stage 1 (and the user's wall-clock) is already training.
            # Gated on the start stage's first dispatch: the warmers' tracing
            # is GIL-bound Python, and letting it race the critical-path
            # compile starved stage-1 warmup ~15x on a 1-CPU host (the r4
            # "warm runs recompile" finding — the XLA cache was hitting).
            import threading as _threading

            from .precompile import Precompiler

            gate = _threading.Event()
            fp.first_dispatch_event = gate
            pre = Precompiler(gate=gate)
            occupied = [b for b, items in batcher.assignment.items() if items]
            start_stage = fp.stage
            for stage in range(start_stage, 5):
                bs = stage_batch_size(cfg.batch_size, stage, max_len_sec,
                                      n_dev, divisor=n_data)
                use_gt = None
                if stage == start_stage and stage >= 2:
                    use_gt = cache.has_durations()
                pre.submit(f"fp_stage{stage}", fp.precompile_stage, stage,
                           bs, occupied, use_gt)
            if start_stage == 1:
                bs1 = stage_batch_size(cfg.batch_size, 1, max_len_sec, n_dev,
                                       divisor=n_data)
                pre.submit("fp_align", fp.precompile_align, bs1, occupied)
            pre.submit("hifigan", _build_hifi)
        fp_result = fp.train(batcher, max_epochs=cfg.max_fp_epochs,
                             max_iters=max_iters, batcher_factory=batcher_for)
        fp_path = fp.export(cfg.voice_name)
        logger.log(f"[pipeline] FastPitch done: {fp_result} → {fp_path}")

    if pre is not None:
        # bounded wait: a hung background compile (e.g. a stalled
        # remote-compile tunnel) must not block the hand-off forever — every
        # precompile is a pure optimization with a first-dispatch fallback
        # (ADVICE r4 low). 1200s covers the slowest observed cold task
        # (fp_stage3 504s) with margin.
        if not pre.wait(timeout=float(os.environ.get(
                "XVA_PRECOMPILE_WAIT_S", "1200"))):
            unfinished = [n for n in ("fp_align", "fp_stage1", "fp_stage2",
                                      "fp_stage3", "fp_stage4", "hifigan")
                          if n not in pre.timings
                          and n not in [e[0] for e in pre.errors]]
            logger.log(f"[precompile] wait timed out; proceeding — unfinished "
                       f"tasks pay first-dispatch compiles: {unfinished}")
        if pre.errors:
            logger.log(f"[precompile] background errors (falling back to "
                       f"first-dispatch compiles): {pre.errors}")
        if pre.timings:
            logger.log(f"[precompile] wall per task: {pre.timings}")
        pre.close()
    hifi = hifi_holder.get("trainer")
    if hifi is None:
        hifi = HifiganTrainer(cfg.dataset_path, hifi_cfg, gen_cfg, mesh=mesh,
                              logger=logger)
        hifi.setup()
    if on_trainer:
        on_trainer(hifi)
    hifi_result = hifi.train(max_epochs=cfg.max_hifi_epochs, max_iters=max_iters)
    hg_path = hifi.export(cfg.voice_name, cfg.output_path)
    logger.log(f"[pipeline] HiFi-GAN done: {hifi_result} → {hg_path}")
    return {"fastpitch": fp_result, "hifigan": hifi_result,
            "exports": [p for p in (fp_path, hg_path) if p]}


class V2InferenceModel:
    """text → FastPitch mel → HiFi-GAN waveform (reference /exportWav flow,
    server.py:313-330 → FastPitch1_1.infer fastpitch1_1/xva_train.py:1172-1233)."""

    def __init__(
        self,
        fp_params,
        gen_params,
        model_cfg: FastPitchConfig = FastPitchConfig(),
        gen_cfg: HifiganConfig = HifiganConfig(),
        mel_max_len: int = 1024,
    ):
        self.model = FastPitch(model_cfg)
        self.gen = Generator(gen_cfg)
        self.fp_params = fp_params
        self.gen_params = gen_params
        self.tp = TextProcessor()
        self.mel_max_len = mel_max_len

        @jax.jit
        def _infer(params, gparams, tokens):
            out = self.model.apply(
                params, tokens, method=FastPitch.infer, mel_max_len=mel_max_len
            )
            mel = jnp.swapaxes(out["mel_out"], 1, 2)  # (B, T, 80)
            wav = self.gen.apply(gparams, mel)  # (B, T*256, 1)
            return wav[..., 0], out["dec_lens"]

        self._infer = _infer

    def tts(self, text: str, pad_to: Optional[int] = 256) -> np.ndarray:
        ids = self.tp.encode(text)
        if pad_to:
            ids = np.pad(ids, (0, max(0, pad_to - len(ids))))[:pad_to]
        wav, dec_lens = self._infer(
            self.fp_params, self.gen_params, jnp.asarray(ids)[None]
        )
        n = int(dec_lens[0]) * 256
        return np.asarray(wav[0][:n])

    def export_wav(self, text: str, out_path: str) -> str:
        wav = self.tts(text)
        save_wav(out_path, wav)
        return out_path
