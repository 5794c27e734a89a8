"""HiFi-GAN stage-5 trainer: one jitted step runs D-update then G-update.

Reference behavior (python/hifigan/xva_train.py:451-567):
- per iteration: G forward on a random 8192-sample segment → D step (LSGAN on
  real/fake) → G step (mel L1 ×45 on full-band mel + MPD/MSD adversarial +
  feature-matching ×2);
- AdamW lr 2e-4, betas (0.8, 0.99), ExponentialLR γ=0.999 per epoch;
- epoch loss-delta early stop: target 1e-4, patience 3, ≥25 epochs
  (:268-270, 639);
- fine-tunes from pretrained g_/do_ checkpoints, never from scratch (:276-277).

TPU-first design: the whole pipeline — segment mel (input, 0-8kHz), generator,
both mels for the L1 loss (full band, fmax_for_loss=null in config_v1.json),
discriminators, both optimizer updates — is ONE compiled XLA program per step;
fakes are generated once and reused for the D pass via stop_gradient (the
reference's y_disc_cache trick, SURVEY.md §7 hard part 2). No GradScaler.
"""
from __future__ import annotations

import dataclasses
import functools
import os
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..data.audio_io import load_wav
from ..data.dataset import read_metadata
from ..models.hifigan import (
    Generator,
    HifiganConfig,
    HifiganDiscriminator,
    discriminator_loss,
    feature_matching_loss,
    generator_adv_loss,
)
from ..ops.stft import LOSS_MEL, MelConfig, mel_spectrogram_hifigan
from ..parallel.mesh import commit_replicated, make_mesh, shard_batch
from . import amp
from .checkpoints import CheckpointManager
from .early_stop import (
    EarlyStopState,
    HIFIGAN_MIN_EPOCHS,
    HIFIGAN_SPAN,
    HIFIGAN_TARGET_DELTA,
)
from .metrics import GraphsWriter, ThroughputMeter, TrainingLogger
from .torch_save import torch_save_compatible

SEGMENT_SIZE = 8192  # config_v1.json segment_size
MEL_WEIGHT = 45.0    # reference xva_train.py:504 (mel L1 ×45)


class GanState(struct.PyTreeNode):
    g_params: Any
    d_params: Any
    d_stats: Any  # spectral-norm power-iteration state
    g_opt: Any
    d_opt: Any
    step: jnp.ndarray


@dataclasses.dataclass
class HifiganTrainConfig:
    output_dir: str = "out_hifi"
    batch_size: int = 16
    lr: float = 2e-4
    lr_decay: float = 0.999  # per epoch
    adam_betas = (0.8, 0.99)
    seed: int = 0
    steps_per_epoch_hint: int = 200  # lr decay granularity
    # bf16 compute / fp32 masters (train/amp.py); reference AMP default-on
    use_amp: bool = True
    # reference-parity D-first update ordering (one extra G forward/step);
    # default False — A/B'd equivalent, see make_gan_step docstring
    d_first: bool = False
    # epoch-size multiplier; None = reference semantics (an "epoch" is ~1000
    # items regardless of dataset size, meldataset.py:296-302). Smoke/bench
    # runs set 1 for a single-pass epoch.
    data_mult: Optional[int] = None


def make_gan_step(
    gen: Generator,
    disc: HifiganDiscriminator,
    g_tx: optax.GradientTransformation,
    d_tx: optax.GradientTransformation,
    mel_cfg: MelConfig,
    use_amp: bool = True,
    d_first: bool = False,
):
    """Fused adversarial step with two orderings:

    - default (d_first=False): G step against the current D, then D step on
      the stop-gradient-cached fakes — the generator runs exactly ONCE per
      step (the reference's y_disc_cache trick, xvapitch/xva_train.py:648-667).
    - d_first=True: reference v2 parity (hifigan/xva_train.py:451-567) — D
      steps first on this G's fakes, then G steps against the UPDATED D.
      Costs one extra no-grad generator forward. A/B'd on the demo dataset
      (see README "HiFi-GAN update ordering"): both orderings converge to the
      same mel-L1 within noise, so the cheaper ordering stays the default.

    use_amp: bf16 compute / fp32 masters (train/amp.py); both loss mels are
    computed on fp32-cast waveforms (FFTs stay fp32).
    """
    loss_mel_cfg = LOSS_MEL  # full band (fmax None)
    _g_apply = (functools.partial(amp.amp_apply, gen.apply)
                if use_amp else gen.apply)
    _d_apply = (functools.partial(amp.amp_apply, disc.apply)
                if use_amp else disc.apply)

    def mel_of(wav):  # (B, T, 1) → (B, 80, T/256)
        return mel_spectrogram_hifigan(wav[..., 0], loss_mel_cfg)

    def g_loss_fn(g_params, d_params, d_stats, mel_in_t, wav_real):
        y_g = _g_apply(g_params, mel_in_t)  # (B, SEGMENT, 1)
        mel_l1 = jnp.mean(jnp.abs(mel_of(y_g) - mel_of(wav_real)))
        (outs_r, outs_g, fmaps_r, fmaps_g), _ = _d_apply(
            {"params": d_params["params"], "batch_stats": d_stats},
            wav_real, y_g, update_sn_stats=False, mutable=["batch_stats"],
        )
        adv = generator_adv_loss(outs_g)
        fm = feature_matching_loss(fmaps_r, fmaps_g)
        total = MEL_WEIGHT * mel_l1 + adv + fm
        meta = {"mel_l1": mel_l1, "adv": adv, "fm": fm,
                "y_hat": jax.lax.stop_gradient(y_g)}
        return total, meta

    def d_loss_fn(d_params, d_stats, wav_real, y_hat_sg):
        (outs_r, outs_g, _, _), new_stats = _d_apply(
            {"params": d_params["params"], "batch_stats": d_stats},
            wav_real, y_hat_sg, update_sn_stats=True, mutable=["batch_stats"],
        )
        return discriminator_loss(outs_r, outs_g), new_stats["batch_stats"]

    def d_step(state, wav_real, y_hat_sg):
        (d_loss, new_stats), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.d_params, state.d_stats,
                                     wav_real, y_hat_sg)
        d_updates, new_d_opt = d_tx.update(d_grads, state.d_opt, state.d_params)
        new_d_params = optax.apply_updates(state.d_params, d_updates)
        return d_loss, new_d_params, new_stats, new_d_opt

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: GanState, wav_real):
        # wav_real: (B, SEGMENT, 1) in [-1, 1]
        mel_in = mel_spectrogram_hifigan(wav_real[..., 0], mel_cfg)  # (B,80,32)
        mel_in_t = jnp.swapaxes(mel_in, 1, 2)  # channels-last

        if d_first:
            # reference ordering: D on this G's fakes, then G vs updated D
            y_hat_sg = jax.lax.stop_gradient(
                _g_apply(state.g_params, mel_in_t))
            d_loss, new_d_params, new_stats, new_d_opt = d_step(
                state, wav_real, y_hat_sg)
            (g_loss, meta), g_grads = jax.value_and_grad(
                g_loss_fn, has_aux=True)(state.g_params, new_d_params,
                                         new_stats, mel_in_t, wav_real)
            meta.pop("y_hat")
            g_updates, new_g_opt = g_tx.update(g_grads, state.g_opt,
                                               state.g_params)
            new_g_params = optax.apply_updates(state.g_params, g_updates)
        else:
            # ---- G step (one generator forward; fakes cached for D) ----
            (g_loss, meta), g_grads = jax.value_and_grad(
                g_loss_fn, has_aux=True)(state.g_params, state.d_params,
                                         state.d_stats, mel_in_t, wav_real)
            g_updates, new_g_opt = g_tx.update(g_grads, state.g_opt,
                                               state.g_params)
            new_g_params = optax.apply_updates(state.g_params, g_updates)
            y_hat_sg = meta.pop("y_hat")

            # ---- D step (on the cached fakes) ----
            d_loss, new_d_params, new_stats, new_d_opt = d_step(
                state, wav_real, y_hat_sg)

        new_state = GanState(
            g_params=new_g_params,
            d_params=new_d_params,
            d_stats=new_stats,
            g_opt=new_g_opt,
            d_opt=new_d_opt,
            step=state.step + 1,
        )
        meta = dict(meta)
        meta["d_loss"] = d_loss
        meta["g_loss"] = g_loss
        return new_state, meta

    return step


class SegmentSampler:
    """Random fixed-size waveform segments (reference meldataset.py MelDataset).

    Wavs are memory-cached once; every epoch yields random 8192-sample crops,
    keeping all shapes static.
    """

    def __init__(self, dataset_path: str, batch_size: int, seed: int = 0,
                 sample_rate: int = 22050, data_mult: Optional[int] = None):
        self.items = read_metadata(dataset_path)
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        self.wavs: List[np.ndarray] = []
        for it in self.items:
            y, _ = load_wav(it.wav_path, target_sr=sample_rate)
            if len(y) < SEGMENT_SIZE:
                y = np.pad(y, (0, SEGMENT_SIZE - len(y)))
            self.wavs.append(y.astype(np.float32))
        # data multiplier: an "epoch" is ~1000 items regardless of dataset
        # size (reference get_dataset_filelist, meldataset.py:296-302) — the
        # per-epoch lr decay and early-stop patience depend on this scale
        if data_mult is None:
            data_mult = max(1, round(1000 / max(1, len(self.wavs))))
        self.data_mult = int(data_mult)

    def __len__(self):
        return max(1, (len(self.wavs) * self.data_mult) // self.batch_size)

    def epoch(self):
        order = np.concatenate(
            [self.rng.permutation(len(self.wavs)) for _ in range(self.data_mult)]
        )
        for s in range(0, len(order) - self.batch_size + 1, self.batch_size):
            idx = order[s : s + self.batch_size]
            seg = np.zeros((self.batch_size, SEGMENT_SIZE, 1), np.float32)
            for j, i in enumerate(idx):
                y = self.wavs[i]
                start = self.rng.integers(0, max(1, len(y) - SEGMENT_SIZE + 1))
                seg[j, :, 0] = y[start : start + SEGMENT_SIZE]
            yield seg
        if len(order) < self.batch_size:  # tiny datasets still yield one batch
            idx = self.rng.choice(len(self.wavs), self.batch_size)
            seg = np.zeros((self.batch_size, SEGMENT_SIZE, 1), np.float32)
            for j, i in enumerate(idx):
                y = self.wavs[i]
                start = self.rng.integers(0, max(1, len(y) - SEGMENT_SIZE + 1))
                seg[j, :, 0] = y[start : start + SEGMENT_SIZE]
            yield seg


class HifiganTrainer:
    def __init__(
        self,
        dataset_path: str,
        cfg: HifiganTrainConfig,
        gen_cfg: HifiganConfig = HifiganConfig(),
        mesh=None,
        mel_cfg: MelConfig = MelConfig(),
        logger: Optional[TrainingLogger] = None,
    ):
        self.cfg = cfg
        self.gen = Generator(gen_cfg)
        self.disc = HifiganDiscriminator()
        self.mesh = mesh or make_mesh()
        self.mel_cfg = mel_cfg
        self.logger = logger or TrainingLogger(cfg.output_dir)
        self.sampler = SegmentSampler(dataset_path, cfg.batch_size, cfg.seed,
                                      data_mult=cfg.data_mult)
        # true epoch-boundary ExponentialLR: the lr lives in the optimizer
        # state (inject_hyperparams) and is stepped by finish_epoch, matching
        # the reference's per-epoch scheduler (xva_train.py:306-307) instead
        # of a steps-per-epoch approximation
        # torch.optim.AdamW default decoupled weight decay 0.01 — the
        # reference constructs AdamW without a weight_decay arg (:298-299)
        self.g_tx = optax.inject_hyperparams(optax.adamw)(
            learning_rate=cfg.lr, b1=0.8, b2=0.99, weight_decay=0.01
        )
        self.d_tx = optax.inject_hyperparams(optax.adamw)(
            learning_rate=cfg.lr, b1=0.8, b2=0.99, weight_decay=0.01
        )
        self._step_fn = make_gan_step(self.gen, self.disc, self.g_tx, self.d_tx,
                                      mel_cfg, use_amp=cfg.use_amp,
                                      d_first=cfg.d_first)
        self.early = EarlyStopState(
            target_delta=HIFIGAN_TARGET_DELTA,
            span=HIFIGAN_SPAN,
            min_epochs=HIFIGAN_MIN_EPOCHS,
        )
        self.graphs = GraphsWriter(cfg.output_dir, (5,), {5: HIFIGAN_TARGET_DELTA})
        self.ckpt = CheckpointManager(cfg.output_dir, prefix="HiFiGAN")
        self.meter = ThroughputMeter()
        self.epoch = 0
        self._max_iters: Optional[int] = None
        self.total_iter = 0
        self.stop_requested = False
        self.paused = False   # warm pause: jitted step + state stay resident
        from .metrics import make_tensorboard

        self.tb = make_tensorboard(cfg.output_dir)  # torch-free (tb_writer.py)

    def setup(self, resume: bool = True, pretrained_g: Optional[str] = None,
              pretrained_do: Optional[str] = None, commit: bool = True):
        """Init params; resume from orbax if present, else warm-start from the
        reference's torch g_/do_ checkpoints ("never from scratch",
        reference hifigan/xva_train.py:276-296).

        commit=False keeps the state host-resident (no HBM): the pipeline
        builds this trainer on a background thread while FastPitch trains,
        and a committed G+D params + double optimizer state would sit in
        device memory through FastPitch's 12x-batch stage 2 (ADVICE r4
        medium). precompile() only needs ShapeDtypeStruct avals; train()
        commits on entry."""
        rng = jax.random.PRNGKey(self.cfg.seed)
        # B=1 on the host CPU: param shapes depend only on feature dims —
        # no accelerator compile of the init graph (parallel/mesh.
        # cpu_init_device); commit_replicated below moves onto the mesh
        from ..parallel.mesh import cpu_init_device

        with cpu_init_device():
            seg = jnp.zeros((1, SEGMENT_SIZE, 1), jnp.float32)
            mel = jnp.zeros((1, SEGMENT_SIZE // 256, 80), jnp.float32)
            g_params = self.gen.init(rng, mel)
            d_vars = self.disc.init(rng, seg, seg)
            state = GanState(
                g_params=g_params,
                d_params={"params": d_vars["params"]},
                d_stats=d_vars.get("batch_stats", {}),
                g_opt=self.g_tx.init(g_params),
                d_opt=self.d_tx.init({"params": d_vars["params"]}),
                step=jnp.zeros((), jnp.int32),
            )
        resumed = False
        if resume:
            step, state2, host = self.ckpt.restore_latest(state)
            if step is not None:
                state = state2
                resumed = True
                self.total_iter = int(step)
                if host:
                    self.epoch = host.get("epoch", 0)
                    if "early" in host:
                        self.early = EarlyStopState.from_dict(host["early"])
                self.logger.log(f"[resume] HiFi-GAN iter {self.total_iter}")
        if not resumed and pretrained_g:
            from ..interop.pretrained import (
                load_hifigan_discriminators,
                load_hifigan_generator,
            )

            gp = load_hifigan_generator(pretrained_g, template=state.g_params)
            state = state.replace(g_params={"params": gp["params"]})
            if pretrained_do:
                dv, meta = load_hifigan_discriminators(
                    pretrained_do, template=state.d_params
                )
                state = state.replace(
                    d_params={"params": dv["params"]},
                    d_stats=dv.get("batch_stats", state.d_stats),
                )
                self.epoch = int(meta.get("epoch", -1)) + 1
                self.total_iter = int(meta.get("steps", 0))
            self.logger.log(
                f"[warm start] pretrained g_={os.path.basename(pretrained_g)}"
                + (f" do_={os.path.basename(pretrained_do)}"
                   if pretrained_do else "")
            )
        # commit replicated over the mesh: one jit cache entry per batch shape
        self._committed = commit
        self.state = commit_replicated(state, self.mesh) if commit else state
        return self.state

    def commit(self):
        """Move a host-resident state (setup(commit=False)) onto the mesh."""
        if not getattr(self, "_committed", True):
            self.state = commit_replicated(self.state, self.mesh)
            self._committed = True

    def precompile(self) -> None:
        """Compile-warm the fused G+D step (one shape: the 8192-sample
        segment batch) via AOT ``.lower().compile()`` on abstract
        ShapeDtypeStruct mirrors of the live state — no device memory is
        touched (see FastPitchTrainer.precompile_stage for why dispatch-based
        warming was replaced: concurrent throwaway states OOM'd the chip).

        Run on a train/precompile.py worker thread during the FastPitch
        stages so the vocoder hand-off pays no first-dispatch compile
        (the north-star's hifi warmup was 290s of exactly this)."""
        from ..parallel.mesh import sds_batch, sds_replicated

        state_sds = sds_replicated(self.mesh, self.state)
        seg = np.zeros((self.cfg.batch_size, SEGMENT_SIZE, 1), np.float32)
        dev = sds_batch(self.mesh, {"wav": seg})["wav"]
        with self.mesh:
            self._step_fn.lower(state_sds, dev).compile()

    def load_generator_params(self, g_params):
        """Warm-start from a pretrained generator (the [male]/[female] g_ ckpt
        role, reference :276-277)."""
        self.state = self.state.replace(g_params=g_params)

    def run_epoch(self):
        losses = []
        pending = None  # previous step's device loss — read one step late so
        # the loss readback never serializes dispatch with device compute
        from ..data.prefetch import Prefetcher

        # segment crop + H2D on the worker thread (VERDICT r1 #2)
        bs = self.cfg.batch_size
        pf = Prefetcher(
            self.sampler.epoch(),
            lambda seg: shard_batch(self.mesh, {"wav": seg})["wav"],
        )
        try:
            with self.mesh:
                self.meter.start()
                for dev in pf:
                    while self.paused and not self.stop_requested:
                        time.sleep(0.2)
                    if self.stop_requested:
                        break
                    if self._max_iters and self.total_iter >= self._max_iters:
                        break
                    t_disp = time.perf_counter()
                    self.state, meta = self._step_fn(self.state, dev)
                    t_disp = time.perf_counter() - t_disp
                    if t_disp > 5.0:
                        self.logger.log(
                            f"[compile] hifigan step compiled at dispatch "
                            f"({t_disp:.0f}s) — precompiled executable missed")
                    self.total_iter += 1
                    if pending is not None:
                        mel_l1 = float(pending)
                        losses.append(mel_l1)
                        fps = self.meter.step()
                        self.logger.set_status(
                            f"Stage: 5 | Epoch: {self.epoch} | "
                            f"Iter: {self.total_iter - 1} | mel L1: {mel_l1:.5f} | "
                            f"its/s: {fps / (bs * 32):.2f}"
                        )
                    pending = meta["mel_l1"]
                    self.meter.add_frames(bs * (SEGMENT_SIZE // 256))
                if pending is not None:
                    losses.append(float(pending))
        finally:
            pf.close()
        return losses

    def _set_lr(self, lr: float):
        def upd(opt_state):
            try:
                opt_state.hyperparams["learning_rate"] = jnp.asarray(
                    lr, jnp.float32
                )
            except Exception:
                pass
            return opt_state

        self.state = self.state.replace(
            g_opt=upd(self.state.g_opt), d_opt=upd(self.state.d_opt)
        )

    def finish_epoch(self, losses) -> bool:
        self.epoch += 1
        # ExponentialLR γ per epoch (reference :306-307)
        self._set_lr(self.cfg.lr * self.cfg.lr_decay ** self.epoch)
        if not losses:
            return False
        avg = float(np.mean(losses))
        self.graphs.add_loss(5, self.total_iter, avg)
        if getattr(self, "tb", None):
            self.tb.add_scalar("loss/mel_l1", avg, self.total_iter)
            self.tb.add_scalar("meta/frames/s", self.meter.mean(),
                               self.total_iter)
        done = self.early.push_epoch(avg)
        if self.early.last_delta_avg is not None:
            self.graphs.add_delta(5, self.total_iter, self.early.last_delta_avg)
        self.ckpt.save(self.total_iter, self.state, {
            "epoch": self.epoch, "early": self.early.to_dict(),
        })
        self.logger.log(
            f"Stage: 5 | Epoch: {self.epoch} | mel L1: {avg:.5f}"
            + (f" | Delta: {self.early.last_delta_avg:.5f}"
               if self.early.last_delta_avg is not None else "")
        )
        return done

    def train(self, max_epochs: int = 10**6, max_iters: Optional[int] = None) -> Dict:
        if not hasattr(self, "state"):
            self.setup()
        self.commit()  # no-op unless setup(commit=False) deferred HBM use
        self._max_iters = max_iters
        start = time.perf_counter()
        for _ in range(max_epochs):
            losses = self.run_epoch()
            if self.finish_epoch(losses) or self.stop_requested:
                break
            if max_iters and self.total_iter >= max_iters:
                break
        self.ckpt.wait()  # join any in-flight async checkpoint write
        return {
            "epoch": self.epoch,
            "total_iter": self.total_iter,
            "wall_s": time.perf_counter() - start,
        }

    def export(self, voice_name: str, out_dir: Optional[str] = None) -> str:
        """{voice}.hg.pt vocoder export: {'generator': <flat torch-named
        fp32 state dict>} exactly as the reference writes it (:600-601), so
        xVASynth's HiFi-GAN loader consumes it directly."""
        from ..interop.hifigan_map import v2_generator_rules
        from ..interop.mapping import apply_export

        out_dir = out_dir or self.cfg.output_dir
        path = os.path.join(out_dir, f"{voice_name}.hg.pt")
        gc = self.gen.cfg
        sd = apply_export(
            self.state.g_params,
            v2_generator_rules(num_ups=len(gc.upsample_rates),
                               num_kernels=len(gc.resblock_kernel_sizes),
                               num_dilations=len(gc.resblock_dilation_sizes[0])),
            dtype=np.float32,
        )
        torch_save_compatible({"generator": sd}, path)
        return path
