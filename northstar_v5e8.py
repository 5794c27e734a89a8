"""Measured v5e-8 composition for the north-star estimate.

Replaces bench_northstar's old bare ``scale = 1/8`` (VERDICT r3 weak #1) with
quantities that are actually measured on the available single chip:

- ``t_step(B/8)``: each stage's REAL jitted train step (the same memoized
  callable the trainer dispatches) timed at per-chip batch B/8 — under 8-way
  DP the global batch and steps/epoch are unchanged and each chip runs B/8.
  Timed per occupied bucket (chained donated-state dispatches, best-of-3)
  and weighted by that bucket's batches/epoch.
- host-collate floor: a v5e-8 is ONE host with 8 chips, so the host still
  collates the full global batch every step; the measured collate-only epoch
  wall is a floor that does not scale with chips (the prefetch thread
  overlaps it with device work, so the epoch estimate is max(device, host)).
- ring all-reduce: the one term a single chip cannot measure — the per-step
  fp32 gradient all-reduce over ICI. Estimated analytically as
  2·bytes·(N-1)/N ÷ 9e10 B/s and reported separately so the label
  "estimated" is attached to exactly the unmeasured part.

All derived schedule numbers carry an ``_est`` suffix upstream.
"""
from __future__ import annotations

import time
from typing import Callable, Dict

import numpy as np

ICI_BYTES_PER_S = 9e10   # v5e per-chip ICI (aggregate, conservative)
N_CHIPS = 8


def _time_step_chain(step, state, args, iters=8, reps=3) -> float:
    """Best-of-``reps`` mean seconds per dispatch: ``iters`` steps chained
    through the donated state, one blocking readback per rep."""
    import jax

    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, meta = step(state, *args)
        jax.block_until_ready(state.step)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best, state


def _throwaway_fp_state(tr, tx):
    import jax
    import jax.numpy as jnp

    from xva_trainer_tpu.parallel.mesh import commit_replicated, cpu_init_device
    from xva_trainer_tpu.train.fastpitch_trainer import TrainState

    with cpu_init_device():
        params = jax.tree_util.tree_map(
            lambda x: jnp.zeros(x.shape, x.dtype), tr.state.params)
        state = TrainState(params=params, opt_state=tx.init(params),
                           step=jnp.zeros((), jnp.int32))
    return commit_replicated(state, tr.mesh)


def probe_v5e8(tr, hifi, batcher_for: Callable, base_bs: int,
               max_len_sec: float, n_dev: int) -> Dict:
    """tr: FastPitchTrainer after all stages ran; hifi: HifiganTrainer after
    its epochs. Returns the measured composition dict."""
    import jax
    import jax.numpy as jnp

    from xva_trainer_tpu.data.dataset import zero_batch
    from xva_trainer_tpu.parallel.mesh import commit_replicated, shard_batch
    from xva_trainer_tpu.train.fastpitch_trainer import batch_keys_for
    from xva_trainer_tpu.train.pipeline import stage_batch_size
    from xva_trainer_tpu.train.precompile import Precompiler

    out: Dict = {"n_chips": N_CHIPS, "ici_bytes_per_s": ICI_BYTES_PER_S}

    # per-step fp32 grad all-reduce estimate (the only unmeasured term)
    p_bytes = sum(np.prod(x.shape) * 4
                  for x in jax.tree_util.tree_leaves(tr.state.params))
    t_ar = 2.0 * float(p_bytes) * (N_CHIPS - 1) / N_CHIPS / ICI_BYTES_PER_S
    out["grad_bytes_mb"] = round(p_bytes / 1e6, 1)
    out["allreduce_est_ms"] = round(t_ar * 1e3, 3)

    # warm every (stage, bucket) shape at B/8 in parallel before timing
    pre = Precompiler()
    plans = {}
    for stage in (1, 2, 3, 4):
        bs = stage_batch_size(base_bs, stage, max_len_sec, n_dev)
        bs8 = max(1, bs // N_CHIPS)
        batcher = batcher_for(stage)
        occupied = [(b, len(items)) for b, items in batcher.assignment.items()
                    if items]
        use_gt = stage >= 2 and tr.cache.has_durations()
        plans[stage] = (bs, bs8, batcher, occupied, use_gt)
        pre.submit(f"warm_s{stage}", tr.precompile_stage, stage, bs8,
                   [b for b, _ in occupied], use_gt)
    pre.wait()
    if pre.errors:
        out["warm_errors"] = [f"{n}: {e}" for n, e in pre.errors]
    pre.close()

    stage_epoch_est, stage_host_s, stage_step8_ms = {}, {}, {}
    kl = jnp.asarray(0.0)
    _, sub = jax.random.split(jax.random.PRNGKey(0))
    for stage in (1, 2, 3, 4):
        bs, bs8, batcher, occupied, use_gt = plans[stage]
        tx, step = tr._get_stage_objects(stage, use_gt)
        keys = batch_keys_for(stage, use_gt, tr.cfg.device_prior)
        state = _throwaway_fp_state(tr, tx)
        dev_epoch = 0.0
        w_ms, w_n = 0.0, 0
        with tr.mesh:
            for b, n_items in occupied:
                n_batches = int(np.ceil(n_items / bs))
                batch = zero_batch(b, bs8, n_mels=tr.cache.mel_cfg.n_mels,
                                   with_prior=not tr.cfg.device_prior,
                                   with_durs=use_gt)
                sel = (batch if keys is None else
                       {k: v for k, v in batch.items() if k in keys})
                dev = shard_batch(tr.mesh, sel)
                dt, state = _time_step_chain(step, state, (dev, kl, sub))
                dev_epoch += n_batches * (dt + t_ar)
                w_ms += dt * 1e3 * n_batches
                w_n += n_batches
        del state
        # host floor: collate-only epoch at the GLOBAL batch size
        t0 = time.perf_counter()
        for _ in batcher.epoch(shuffle=False):
            pass
        host_s = time.perf_counter() - t0
        stage_host_s[str(stage)] = round(host_s, 1)
        stage_step8_ms[str(stage)] = round(w_ms / max(w_n, 1), 2)
        stage_epoch_est[str(stage)] = round(max(dev_epoch, host_s), 1)
        print(f"[v5e8] stage {stage}: step@B/8 "
              f"{stage_step8_ms[str(stage)]}ms × {w_n} steps "
              f"+ ar {t_ar*1e3:.1f}ms → device {dev_epoch:.1f}s, "
              f"host floor {host_s:.1f}s", flush=True)
    out["stage_step8_ms"] = stage_step8_ms
    out["stage_host_epoch_s"] = stage_host_s
    out["stage_epoch_est_s"] = stage_epoch_est

    # ---- HiFi-GAN ----
    from xva_trainer_tpu.train.hifigan_trainer import SEGMENT_SIZE

    from xva_trainer_tpu.parallel.mesh import cpu_init_device

    bs8 = max(1, hifi.cfg.batch_size // N_CHIPS)
    with cpu_init_device():
        gstate = jax.tree_util.tree_map(
            lambda x: jnp.zeros(jnp.shape(x), x.dtype), hifi.state)
    gstate = commit_replicated(gstate, hifi.mesh)
    seg = np.zeros((bs8, SEGMENT_SIZE, 1), np.float32)
    with hifi.mesh:
        dev = shard_batch(hifi.mesh, {"wav": seg})["wav"]
        gstate, _ = hifi._step_fn(gstate, dev)  # compile + warm
        jax.block_until_ready(gstate.step)
        dt, gstate = _time_step_chain(hifi._step_fn, gstate, (dev,))
    del gstate
    gp_bytes = sum(np.prod(x.shape) * 4 for x in jax.tree_util.tree_leaves(
        (hifi.state.g_params, hifi.state.d_params)))
    t_ar_h = 2.0 * float(gp_bytes) * (N_CHIPS - 1) / N_CHIPS / ICI_BYTES_PER_S
    n_steps = len(hifi.sampler)
    t0 = time.perf_counter()
    for _ in hifi.sampler.epoch():
        pass
    host_s = time.perf_counter() - t0
    out["hifi_step8_ms"] = round(dt * 1e3, 2)
    out["hifi_host_epoch_s"] = round(host_s, 1)
    out["hifi_allreduce_est_ms"] = round(t_ar_h * 1e3, 3)
    out["hifi_epoch_est_s"] = round(
        max(n_steps * (dt + t_ar_h), host_s), 1)
    print(f"[v5e8] hifi: step@B/8 {out['hifi_step8_ms']}ms × {n_steps} "
          f"→ est {out['hifi_epoch_est_s']}s (host floor {host_s:.1f}s)",
          flush=True)
    return out
