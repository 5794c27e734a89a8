"""FastPitch multi-stage trainer: jit step factories + the 4-stage schedule.

Reference behavior being reproduced (python/fastpitch1_1/xva_train.py):
- 4 stages — 1 aligner, 2 duration, 3 pitch/energy, 4 mel — with per-stage
  parameter freezing (:589-672) and loss-delta early stopping (:915-976);
- LAMB lr 0.1 Noam warmup 1000 (:697-705, :1252-1261);
- gradient accumulation to effective batch 256 (:407);
- checkpoint rolling window 2 + auto-resume (:986-990, last ckpt scan);
- NaN-loss skip (:825-832);
- per-step frames/s metric (:867,897), training.log + graphs.json channels.

TPU-first deltas: one compiled step per (stage, bucket-shape); MAS runs on
device inside the step; params replicated + batch sharded over the mesh's
"data" axis (DP grads all-reduce over ICI via pjit); no GradScaler (bf16 on
TPU needs no loss scaling — SURVEY.md §7 hard part 2).
"""
from __future__ import annotations

import dataclasses
import functools
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..data.dataset import BucketBatcher, FeatureCache
from ..models.fastpitch import FastPitch, FastPitchConfig, loss as fp_loss
from ..parallel.mesh import commit_replicated, make_mesh, shard_batch
from .checkpoints import CheckpointManager, export_fastpitch_v2
from .early_stop import EarlyStopState, fastpitch_min_epochs, fastpitch_target_delta
from .metrics import GraphsWriter, ThroughputMeter, TrainingLogger
from . import amp
from .optim import fastpitch_stage_mask, make_fastpitch_optimizer


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    step: jnp.ndarray


@dataclasses.dataclass
class FastPitchTrainConfig:
    output_dir: str = "out"
    batch_size: int = 32
    target_bs: int = 256  # effective batch via grad accum (reference :407)
    base_lr: float = 0.1
    weight_decay: float = 1e-6
    warmup_steps: int = 1000
    epochs_per_checkpoint: int = 1
    force_stage: int = 0  # 0 = auto
    seed: int = 0
    kl_warmup_epochs: float = 100.0
    # bf16 compute / fp32 masters (train/amp.py); reference AMP default-on
    use_amp: bool = True
    # compute the beta-binomial attention prior on device from lengths
    # (ops/attn_prior.py) instead of shipping the host-collated (B, mel_len,
    # text_len) f32 tensor every step — cuts the largest H2D transfer and the
    # per-item ndimage.zoom from the collate
    device_prior: bool = True

    @property
    def grad_accum(self) -> int:
        return max(1, int(np.ceil(self.target_bs / self.batch_size)))


def batch_keys_for(stage: int, use_gt: bool, device_prior: bool):
    """Which collated-batch keys a stage's step actually reads (H2D filter).

    Stage 2 runs at a 12x batch multiplier (pipeline.STAGE_BS_MULT) but its
    gt-durs step reads only tokens/in_lens/durs — shipping the unused
    (B, mel_len, 80) mel and (B, mel_len, text_len) prior wastes most of the
    transfer. With device_prior the prior never ships in any stage.
    Returns None for "full batch".
    """
    if stage == 1:
        keys = {"tokens", "in_lens", "mel", "mel_lens", "prior"}
    elif stage == 2 and use_gt:
        keys = {"tokens", "in_lens", "durs"}
    else:
        keys = None
    if device_prior:
        if keys is None:
            keys = {"tokens", "in_lens", "mel", "mel_lens", "pitch",
                    "energy", "durs"}
        keys = keys - {"prior"}
    return keys


def make_align_step(model: FastPitch, device_prior: bool):
    """Jitted aligner forward used by extract_durations (one per trainer so
    precompile and the real extraction share a single jit cache)."""

    @functools.partial(jax.jit)
    def align(params, tokens, in_lens, mel, mel_lens, prior):
        mel = mel.astype(jnp.float32)  # f16 host feed → f32 on device
        if prior is None:  # device_prior: materialize from lengths
            from ..ops.attn_prior import beta_binomial_attn_prior

            prior = beta_binomial_attn_prior(
                in_lens, mel_lens, t_x=tokens.shape[1], t_y=mel.shape[1]
            )
        out = model.apply(
            params, tokens, in_lens, mel, mel_lens, prior,
            method=FastPitch.stage1,
        )
        return out["durations"]

    return align


def make_stage_step(model: FastPitch, stage: int, tx: optax.GradientTransformation,
                    use_gt_durs: bool = False, use_amp: bool = True,
                    device_prior: bool = False):
    """Build the jitted train step for a stage. kl_weight is a traced scalar.

    use_gt_durs: stages ≥2 read pre-extracted durations from the batch instead
    of re-running the aligner+MAS each step (the reference pre-extracts durs
    to npy dirs after stage 1 — fastpitch1_1/xva_train.py:1120-1168).

    use_amp: bf16 compute / fp32 masters+losses (train/amp.py), the TPU
    analogue of the reference's default-on torch.cuda.amp; losses (CTC,
    binarization KL, staged MSEs) always accumulate fp32 on the cast-up
    outputs, and MAS accumulates fp32 inside ops/mas.py.

    device_prior: materialize the beta-binomial attention prior on device
    from in_lens/mel_lens (ops/attn_prior.py) instead of reading the
    host-collated ``batch["prior"]`` — drops the largest H2D tensor
    (~8 MB/step at B=32) from the feed."""
    _apply = (functools.partial(amp.amp_apply, model.apply)
              if use_amp else model.apply)

    def _alignment_free(out_batch):
        return dict(durs_gt=out_batch["durs"], run_aligner=False)

    def _prior(batch):
        if not device_prior and "prior" in batch:
            return batch["prior"]
        from ..ops.attn_prior import beta_binomial_attn_prior

        return beta_binomial_attn_prior(
            batch["in_lens"], batch["mel_lens"],
            t_x=batch["tokens"].shape[1], t_y=batch["mel"].shape[1],
        )

    def loss_fn(params, batch, kl_weight, rng):
        common = dict(deterministic=False)
        rngs = {"dropout": rng}
        if stage == 1:
            out = _apply(
                params, batch["tokens"], batch["in_lens"], batch["mel"],
                batch["mel_lens"], _prior(batch), method=FastPitch.stage1,
                rngs=rngs, **common,
            )
            return fp_loss.stage1_loss(out, batch["in_lens"], batch["mel_lens"], kl_weight)
        if stage == 2:
            if use_gt_durs and "durs" in batch:
                out = _apply(
                    params, batch["tokens"], batch["in_lens"], batch["durs"],
                    method=FastPitch.stage2_from_durs, rngs=rngs, **common,
                )
            else:
                out = _apply(
                    params, batch["tokens"], batch["in_lens"], batch["mel"],
                    batch["mel_lens"], _prior(batch), method=FastPitch.stage2,
                    rngs=rngs, **common,
                )
            return fp_loss.stage2_loss(out, batch["in_lens"])
        kw = _alignment_free(batch) if (use_gt_durs and "durs" in batch) else {}
        out = _apply(
            params, batch["tokens"], batch["in_lens"], batch["mel"],
            batch["mel_lens"], batch["pitch"], batch["energy"], _prior(batch),
            method=FastPitch.full, rngs=rngs, **kw, **common,
        )
        if stage == 3:
            return fp_loss.stage3_loss(out, batch["mel"], batch["in_lens"])
        return fp_loss.stage4_loss(out, batch["mel"])

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch, kl_weight, rng):
        # the host feed ships dense features as float16 (half the H2D bytes,
        # BucketBatcher.half_feed); cast back up on device before any math
        batch = {k: (v.astype(jnp.float32)
                     if hasattr(v, "dtype") and v.dtype == jnp.float16 else v)
                 for k, v in batch.items()}
        (loss, meta), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, kl_weight, rng
        )
        # NaN-loss skip (reference :825-832): zero the update, keep state.
        ok = jnp.isfinite(loss)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params, opt_state=new_opt, step=state.step + 1
        )
        meta = dict(meta)
        meta["skipped_nan"] = (~ok).astype(jnp.float32)
        return new_state, meta

    return step


class FastPitchTrainer:
    """Stage scheduler + host loop around the jitted steps."""

    def __init__(
        self,
        cache: FeatureCache,
        cfg: FastPitchTrainConfig,
        model_cfg: FastPitchConfig = FastPitchConfig(),
        mesh=None,
        logger: Optional[TrainingLogger] = None,
    ):
        self.cache = cache
        self.cfg = cfg
        self.model_cfg = model_cfg
        self.model = FastPitch(model_cfg)
        self.mesh = mesh or make_mesh()
        self.logger = logger or TrainingLogger(cfg.output_dir)
        self.num_lines = len(cache.items)
        self.target_deltas = {
            s: fastpitch_target_delta(s, self.num_lines) for s in (1, 2, 3, 4)
        }
        self.graphs = GraphsWriter(cfg.output_dir, (1, 2, 3, 4), self.target_deltas)
        self.ckpt = CheckpointManager(cfg.output_dir, prefix="FastPitch")
        self.meter = ThroughputMeter()
        self.stage = cfg.force_stage or 1
        # (stage, use_gt_durs) → (tx, jitted step): the SAME callable objects
        # serve precompile_stage and the training loop, so a background
        # precompile dispatch is a direct in-process jit cache hit later
        self._stage_memo: Dict = {}
        import threading

        # precompile worker threads and the training loop both resolve stage
        # objects; without the lock they could build two distinct jitted
        # callables for one key and the loop's first dispatch would recompile
        self._memo_lock = threading.Lock()
        self._align_fn = None
        # set by run_epoch after the FIRST training dispatch returns (its
        # compile done): the pipeline gates background precompile threads on
        # it so their GIL-bound tracing never races the critical-path compile
        self.first_dispatch_event: Optional[threading.Event] = None
        self.epoch = 0
        self.total_iter = 0
        self.stop_requested = False
        self.paused = False   # warm pause: jitted step + state stay resident
        from .metrics import make_tensorboard

        self.tb = make_tensorboard(cfg.output_dir)  # torch-free (tb_writer.py)
        self._stage_objects()

    # ---- lifecycle ----

    def _init_params(self, batcher: BucketBatcher):
        batch = next(batcher.epoch(shuffle=False))
        rng = jax.random.PRNGKey(self.cfg.seed)
        prior = batch.get("prior")
        if prior is None:
            # a with_prior=False batcher (stage 2 + pre-extracted durations,
            # pipeline.batcher_for) omits the attention prior; init still
            # traces the full graph, so feed zeros of the right shape
            prior = np.zeros(
                (batch["mel"].shape[0], batch["mel"].shape[1],
                 batch["tokens"].shape[1]), np.float32)
        # B=1 slice on the host CPU: param shapes depend only on feature
        # dims, so there is no reason to compile the init graph for the
        # accelerator (parallel/mesh.cpu_init_device) or at full batch
        from ..parallel.mesh import cpu_init_device

        with cpu_init_device():
            params = self.model.init(
                rng,
                jnp.asarray(batch["tokens"][:1]),
                jnp.asarray(batch["in_lens"][:1]),
                jnp.asarray(batch["mel"][:1], jnp.float32),
                jnp.asarray(batch["mel_lens"][:1]),
                jnp.asarray(batch["pitch"][:1], jnp.float32),
                jnp.asarray(batch["energy"][:1], jnp.float32),
                jnp.asarray(prior[:1]),
            )
        return params

    def _get_stage_objects(self, stage: int, use_gt: bool):
        """Memoized (tx, step) for a stage — shared between the training loop
        and precompile_stage so both dispatch the same jitted callable."""
        key = (stage, use_gt)
        with self._memo_lock:
            if key not in self._stage_memo:
                tx = make_fastpitch_optimizer(
                    self.cfg.base_lr,
                    self.cfg.weight_decay,
                    self.cfg.warmup_steps,
                    grad_accum=self.cfg.grad_accum,
                    freeze_mask=fastpitch_stage_mask(stage),
                )
                step = make_stage_step(self.model, stage, tx,
                                       use_gt_durs=use_gt,
                                       use_amp=self.cfg.use_amp,
                                       device_prior=self.cfg.device_prior)
                self._stage_memo[key] = (tx, step)
            return self._stage_memo[key]

    def _stage_objects(self):
        self.early = EarlyStopState(
            target_delta=self.target_deltas[self.stage],
            min_epochs=fastpitch_min_epochs(self.stage),
        )
        use_gt = self.stage >= 2 and self.cache.has_durations()
        self.tx, self._step_fn = self._get_stage_objects(self.stage, use_gt)
        self._batch_keys = batch_keys_for(self.stage, use_gt,
                                          self.cfg.device_prior)

    def _get_align_fn(self):
        with self._memo_lock:
            if self._align_fn is None:
                self._align_fn = make_align_step(self.model,
                                                 self.cfg.device_prior)
            return self._align_fn

    # ---- compile warming (train/precompile.py) ----

    def _state_sds(self, tx):
        """Abstract (ShapeDtypeStruct) TrainState with the exact avals +
        replicated shardings of the live committed state — ``tx.init`` runs
        under ``jax.eval_shape`` so nothing allocates anywhere."""
        from ..parallel.mesh import sds_replicated

        p_avals = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(jnp.shape(x), x.dtype),
            self.state.params)
        state = TrainState(params=p_avals,
                           opt_state=jax.eval_shape(tx.init, p_avals),
                           step=jax.ShapeDtypeStruct((), jnp.int32))
        return sds_replicated(self.mesh, state)

    def precompile_stage(self, stage: int, batch_size: int, buckets,
                         use_gt: Optional[bool] = None) -> int:
        """Compile-warm one stage: ``step.lower(...).compile()`` on the REAL
        memoized jitted callable (`_get_stage_objects` hands the training
        loop the same object) once per occupied bucket shape, over abstract
        ShapeDtypeStruct state/batch mirrors — so the stage's first training
        epoch reuses the compiled executable with zero recompile.

        Meant to run on a train/precompile.py worker thread, overlapping the
        compiles with the feature-cache build and earlier stages' training
        (the north-star's 1,871s one-time wall was ~80% these compiles, paid
        serially at first dispatch — VERDICT r3). Returns the number of
        shapes compiled.

        AOT-on-abstract-avals is load-bearing for memory: the first (r4)
        design dispatched real steps with throwaway zeros states, and N
        worker threads × ~one TrainState + activations each OOM'd the chip
        mid-run (RESOURCE_EXHAUSTED at the stage-3 epoch of the north-star
        measurement). Lower+compile allocates nothing on device; reuse was
        validated on both TPU and CPU backends (first real dispatch after a
        same-callable AOT compile: ~0.1s vs a cold multi-second compile)."""
        from ..data.dataset import zero_batch
        from ..parallel.mesh import sds_batch

        if use_gt is None:
            # durations are extracted at the stage 1→2 hand-off, before any
            # stage ≥2 step runs — warm the path that will actually execute
            use_gt = stage >= 2
        tx, step = self._get_stage_objects(stage, use_gt)
        keys = batch_keys_for(stage, use_gt, self.cfg.device_prior)
        state_sds = self._state_sds(tx)
        # rng/kl built exactly as run_epoch builds them (same avals)
        _, sub = jax.random.split(jax.random.PRNGKey(0))
        kl = jnp.asarray(0.0)
        n_mels = self.cache.mel_cfg.n_mels
        n = 0
        with self.mesh:
            for b in buckets:
                batch = zero_batch(
                    b, batch_size, n_mels=n_mels,
                    with_prior=not self.cfg.device_prior, with_durs=use_gt,
                )
                sel = (batch if keys is None
                       else {k: v for k, v in batch.items() if k in keys})
                step.lower(state_sds, sds_batch(self.mesh, sel),
                           kl, sub).compile()
                n += 1
        return n

    def precompile_align(self, batch_size: int, buckets) -> int:
        """Compile-warm the duration-extraction forward (stage 1→2 hand-off)
        for every bucket shape at the stage-1 batch size (AOT, see
        precompile_stage — no device memory touched)."""
        from ..data.dataset import zero_batch
        from ..parallel.mesh import sds_batch, sds_replicated

        align = self._get_align_fn()
        params_sds = sds_replicated(self.mesh, self.state.params)
        n_mels = self.cache.mel_cfg.n_mels
        n = 0
        with self.mesh:
            for b in buckets:
                batch = zero_batch(b, batch_size, n_mels=n_mels,
                                   with_prior=not self.cfg.device_prior)
                dev = sds_batch(self.mesh, batch)
                prior = None if self.cfg.device_prior else dev.get("prior")
                align.lower(params_sds, dev["tokens"], dev["in_lens"],
                            dev["mel"], dev["mel_lens"], prior).compile()
                n += 1
        return n

    def extract_durations(self, batcher: BucketBatcher) -> int:
        """After stage 1: run the aligner once over the dataset, caching
        per-item durations (reference extract_durations :1120-1168), so
        stages ≥2 skip the aligner+MAS in every step."""
        align = self._get_align_fn()
        count = 0
        with self.mesh:
            for batch in batcher.epoch(shuffle=False):
                dev = shard_batch(self.mesh, batch)
                prior = (None if self.cfg.device_prior
                         else dev.get("prior"))
                durs = np.asarray(
                    align(self.state.params, dev["tokens"], dev["in_lens"],
                          dev["mel"], dev["mel_lens"], prior)
                )
                for i, item_id in enumerate(batch["ids"]):
                    tl = int(batch["in_lens"][i])
                    self.cache.save_durations(item_id, durs[i, :tl])
                    count += 1
        batcher.use_durs = True
        self.logger.log(f"[durations] extracted for {count} items")
        return count

    def setup(self, batcher: BucketBatcher, resume: bool = True,
              pretrained_ckpt: Optional[str] = None):
        """Init; resume from orbax if present, else warm-start from a
        reference torch FastPitch checkpoint (the v2 base model role,
        reference fastpitch1_1/xva_train.py:1054-1079)."""
        params = self._init_params(batcher)
        # warm-start whenever no orbax checkpoint exists — an explicit
        # resume=False fresh run from the base model must still load it
        # (same semantics as XVAPitchTrainer/HifiganTrainer)
        if pretrained_ckpt and self.ckpt.latest_step() is None:
            from ..interop.fastpitch_map import load_fastpitch_checkpoint

            loaded, meta = load_fastpitch_checkpoint(
                pretrained_ckpt, template=params
            )
            params = loaded
            if "training_stage" in meta:
                self.stage = int(meta["training_stage"])
                self._stage_objects()
            self.logger.log(
                f"[warm start] {os.path.basename(pretrained_ckpt)} "
                f"(stage {self.stage})"
            )
        # tx.init on the host CPU too (matches hifigan/xvapitch setup): the
        # params here are uncommitted, so a bare init could compile on the
        # accelerator before commit_replicated below
        from ..parallel.mesh import cpu_init_device

        with cpu_init_device():
            state = TrainState(
                params=params,
                opt_state=self.tx.init(params),
                step=jnp.zeros((), jnp.int32),
            )
        if resume:
            step, state2, host = self.ckpt.restore_latest(state)
            if step is not None:
                state = state2
                self.total_iter = int(step)
                if host:
                    self.stage = host.get("stage", self.stage)
                    self.epoch = host.get("epoch", 0)
                    self._stage_objects()
                    if "early" in host:
                        self.early = EarlyStopState.from_dict(host["early"])
                    # re-init optimizer for the restored stage if shape-mismatch
                    try:
                        jax.tree_util.tree_structure(state.opt_state)
                    except Exception:
                        state = state.replace(opt_state=self.tx.init(state.params))
                self.logger.log(f"[resume] stage {self.stage} iter {self.total_iter}")
        # commit replicated over the mesh: one jit cache entry per batch shape
        self.state = commit_replicated(state, self.mesh)
        return self.state

    # ---- training ----

    def kl_weight(self) -> float:
        """Stage-1 binarization warmup (reference :792-798)."""
        if self.stage != 1:
            return 0.0
        return min(self.epoch / self.cfg.kl_warmup_epochs, 1.0)

    def run_epoch(self, batcher: BucketBatcher, rng: jax.Array):
        epoch_losses = []
        pending = None  # previous step's device loss — read one step late so
        # the loss readback never serializes dispatch with device compute
        from ..data.prefetch import Prefetcher

        # collate + H2D run on the prefetch worker thread; the loop below only
        # dequeues ready device batches and dispatches steps (VERDICT r1 #2)
        keys = self._batch_keys

        def _prep(b):
            sel = b if keys is None else {k: v for k, v in b.items()
                                          if k in keys}
            return (shard_batch(self.mesh, sel),
                    int(np.sum(b["mel_lens"])))

        pf = Prefetcher(batcher.epoch(), _prep)
        try:
            with self.mesh:
                self.meter.start()
                for dev_batch, frames in pf:
                    while self.paused and not self.stop_requested:
                        time.sleep(0.2)
                    if self.stop_requested:
                        break
                    rng, sub = jax.random.split(rng)
                    t_disp = time.perf_counter()
                    self.state, meta = self._step_fn(
                        self.state, dev_batch, jnp.asarray(self.kl_weight()), sub
                    )
                    t_disp = time.perf_counter() - t_disp
                    if (self.first_dispatch_event is not None
                            and not self.first_dispatch_event.is_set()):
                        self.first_dispatch_event.set()
                    if t_disp > 5.0:
                        # dispatch is async; a multi-second call means the
                        # step compiled right here — i.e. this (stage, shape)
                        # missed every warmed cache. Silent before (ADVICE r4
                        # low): precompile signature drift looked like an
                        # unexplained stage-start stall.
                        self.logger.log(
                            f"[compile] stage {self.stage} shape "
                            f"{tuple(dev_batch['mel'].shape)} compiled at "
                            f"dispatch ({t_disp:.0f}s) — precompiled "
                            f"executable missed")
                    self.total_iter += 1
                    if pending is not None:
                        loss = float(pending)
                        epoch_losses.append(loss)
                        fps = self.meter.step()
                        self.logger.set_status(
                            f"Stage: {self.stage} | Epoch: {self.epoch} | "
                            f"Iter: {self.total_iter - 1} | Loss: {loss:.5f} | "
                            f"frames/s: {int(fps)}"
                        )
                    pending = meta["loss"]
                    self.meter.add_frames(frames)
                if pending is not None:
                    epoch_losses.append(float(pending))
        finally:
            pf.close()
        return epoch_losses, rng

    def finish_epoch(self, epoch_losses) -> bool:
        """Returns True when the current stage just finished."""
        self.epoch += 1
        if not epoch_losses:
            return False
        avg = float(np.mean(epoch_losses))
        self.graphs.add_loss(self.stage, self.total_iter, avg)
        if getattr(self, "tb", None):
            self.tb.add_scalar(f"loss/stage{self.stage}", avg, self.total_iter)
            self.tb.add_scalar("meta/frames/s", self.meter.mean(), self.total_iter)
        done = self.early.push_epoch(avg)
        if self.early.last_delta_avg is not None:
            self.graphs.add_delta(self.stage, self.total_iter, self.early.last_delta_avg)
        if self.epoch % self.cfg.epochs_per_checkpoint == 0 or done:
            self.save_checkpoint()
        line = (
            f"Stage: {self.stage} | Epoch: {self.epoch} | Loss: {avg:.5f} | "
            f"Target: {self.early.target_delta:.5f}"
        )
        if self.early.last_delta_avg is not None:
            line += f" | Delta: {self.early.last_delta_avg:.5f}"
        if self.early.patience_count:
            line += f" | Hit: {self.early.patience_count}/{self.early.patience}"
        self.logger.log(line)
        if done:
            self.logger.log(f"[Trainer] Stage {self.stage} finished")
            if self.stage < 4:
                # advance and KEEP TRAINING — the new stage must run from
                # epoch 0 (returning True here would skip it entirely)
                self.stage += 1
                self._stage_objects()
                self.reset_opt_state()
                return False
            return True  # stage 4 done → hand off to HiFi-GAN
        return False

    def reset_opt_state(self):
        """Re-init the optimizer state for the current stage AND re-commit it
        over the mesh. The commit is load-bearing: a bare ``tx.init(...)``
        yields uncommitted default-device arrays, which give every
        already-compiled (stage, bucket-shape) step a *different* jit cache
        key than the committed arrays the step outputs — so the first epoch
        after a stage advance silently recompiled every bucket shape
        (~50-70s each over a remote-compile tunnel; measured as the entire
        208s/epoch "steady state" of the north-star's stage 2)."""
        self.state = self.state.replace(
            opt_state=commit_replicated(self.tx.init(self.state.params),
                                        self.mesh))

    def save_checkpoint(self):
        host = {
            "stage": self.stage,
            "epoch": self.epoch,
            "early": self.early.to_dict(),
            "frames_s": self.meter.mean(),
        }
        self.ckpt.save(self.total_iter, self.state, host)

    def train(self, batcher: BucketBatcher, max_epochs: int = 10**6,
              max_iters: Optional[int] = None, batcher_factory=None) -> Dict:
        """Run stages until stage 4 completes (or budget is hit).

        batcher_factory(stage) -> BucketBatcher lets callers apply the
        reference's per-stage batch-size multipliers (xva_train.py:387-404)
        when the stage changes."""
        rng = jax.random.PRNGKey(self.cfg.seed + 1)
        if not hasattr(self, "state"):
            self.setup(batcher)
        start = time.perf_counter()
        for _ in range(max_epochs):
            prev_stage = self.stage
            losses, rng = self.run_epoch(batcher, rng)
            all_done = self.finish_epoch(losses)
            if prev_stage == 1 and self.stage == 2:
                self.extract_durations(batcher)
                self._stage_objects()  # rebuild step with use_gt_durs
            if self.stage != prev_stage and batcher_factory is not None:
                batcher = batcher_factory(self.stage)
                # a fresh batcher must keep serving pre-extracted durations —
                # otherwise the use_gt_durs step silently falls back to the
                # live aligner+MAS path every step
                if self.stage >= 2 and self.cache.has_durations():
                    batcher.use_durs = True
            if all_done or self.stop_requested:
                break
            if max_iters and self.total_iter >= max_iters:
                break
        self.ckpt.wait()  # join any in-flight async checkpoint write
        return {
            "stage": self.stage,
            "epoch": self.epoch,
            "total_iter": self.total_iter,
            "wall_s": time.perf_counter() - start,
            "frames_s": self.meter.mean(),
        }

    def export(self, voice_name: str, out_dir: Optional[str] = None):
        out_dir = out_dir or self.cfg.output_dir
        path = os.path.join(out_dir, f"{voice_name}.pt")
        try:
            st = self.cache.pitch_stats()
            pitch_stats = (float(st.get("mean", 0.0)), float(st.get("std", 1.0)))
        except Exception:
            pitch_stats = None
        export_fastpitch_v2(
            self.state.params["params"], path, voice_name,
            model_cfg=self.model_cfg, pitch_stats=pitch_stats,
        )
        return path

    def output_samples(self, sentences, out_dir: Optional[str] = None,
                       mel_max_len: int = 512):
        """Viz sample wavs from predicted mels via Griffin-Lim
        (reference output_samples, xva_train.py:1323-1365)."""
        import jax.numpy as jnp

        from ..data.audio_io import save_wav
        from ..data.text import TextProcessor
        from ..models.fastpitch import FastPitch
        from ..ops.griffin_lim import mel_to_wav

        out_dir = out_dir or os.path.join(self.cfg.output_dir, "viz",
                                          str(self.total_iter))
        os.makedirs(out_dir, exist_ok=True)
        tp = TextProcessor()
        paths = []
        for i, text in enumerate(sentences):
            ids = tp.encode(text)
            tokens = jnp.asarray(np.pad(ids, (0, max(0, 128 - len(ids))))[:128])[None]
            out = self.model.apply(self.state.params, tokens,
                                   method=FastPitch.infer, mel_max_len=mel_max_len)
            n = int(out["dec_lens"][0])
            wav = np.asarray(mel_to_wav(out["mel_out"][0][:, :n], n_iter=16))
            p = os.path.join(out_dir, f"sample_{i}.wav")
            save_wav(p, wav)
            paths.append(p)
        return paths
