"""Checkpoint management: orbax pytrees + xVASynth-compatible export.

Parity with the reference checkpoint contract (SURVEY.md §5.4):
- contents: model + optimizer state + step/epoch/stage + the loss-history
  arrays driving early stopping (reference python/xvapitch/xva_train.py:952-963);
- rolling window of 2 (reference :927-931);
- auto-resume from the newest checkpoint in the output dir (:1518-1529);
- export artifact: fp16 state dict ``{voice}.pt`` + metadata JSON
  (:984-1022; FastPitch variant fastpitch1_1/xva_train.py:1030-1047).
"""
from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from .torch_save import torch_save_compatible


class CheckpointManager:
    """Rolling-window pytree checkpoints with a JSON sidecar for host state."""

    def __init__(self, output_dir: str, prefix: str = "ckpt", max_to_keep: int = 2):
        self.output_dir = os.path.abspath(output_dir)
        os.makedirs(self.output_dir, exist_ok=True)
        self.prefix = prefix
        self.max_to_keep = max_to_keep
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, step: int) -> str:
        return os.path.join(self.output_dir, f"{self.prefix}_{step}")

    def save(self, step: int, state: Any, host_state: Optional[Dict] = None,
             wait: bool = False) -> str:
        """Schedule a checkpoint write. By default the write is async
        (preemption-safe: the train loop keeps stepping while orbax persists;
        the next save or an explicit wait joins the previous write) —
        SURVEY §5.3's prescription vs the reference's blocking torch.save."""
        path = self._path(step)
        self._ckptr.wait_until_finished()  # join any in-flight write first
        self._ckptr.save(path, state, force=True)
        if host_state is not None:
            with open(path + ".json", "w") as f:
                json.dump(host_state, f)
        if wait:
            self._ckptr.wait_until_finished()
        self._gc()
        return path

    def wait(self) -> None:
        self._ckptr.wait_until_finished()

    def _steps(self):
        pat = re.compile(rf"^{re.escape(self.prefix)}_(\d+)$")
        out = []
        for name in os.listdir(self.output_dir):
            m = pat.match(name)
            if m and os.path.isdir(os.path.join(self.output_dir, name)):
                out.append(int(m.group(1)))
        return sorted(out)

    def _gc(self):
        steps = self._steps()
        import shutil

        for s in steps[: -self.max_to_keep]:
            shutil.rmtree(self._path(s), ignore_errors=True)
            side = self._path(s) + ".json"
            if os.path.exists(side):
                os.remove(side)

    def latest_step(self) -> Optional[int]:
        self._ckptr.wait_until_finished()
        steps = self._steps()
        return steps[-1] if steps else None

    def restore_latest(self, template: Any) -> Tuple[Optional[int], Any, Optional[Dict]]:
        """Restore the newest checkpoint into the structure of `template`."""
        step = self.latest_step()
        if step is None:
            return None, template, None
        state = self._ckptr.restore(self._path(step), template)
        host_state = None
        side = self._path(step) + ".json"
        if os.path.exists(side):
            with open(side) as f:
                host_state = json.load(f)
        return step, state, host_state


def _to_numpy_fp16(params) -> Dict:
    def conv(x):
        x = np.asarray(x)
        return x.astype(np.float16) if np.issubdtype(x.dtype, np.floating) else x

    return jax.tree_util.tree_map(conv, params)


def xvapitch_state_dict(g_params, d_params=None, *, step: Optional[int] = None,
                        model_cfg=None):
    """Flax params -> the reference's flat torch-named fp16 state dict
    (what xVASynth ``load_state_dict``s — reference xva_train.py:984-1022:
    ``torch.save(model_half.state_dict(), ...)``, which includes the
    ``disc.*`` subtree since the discriminator is a submodule)."""
    from ..interop.mapping import apply_export
    from ..interop.xvapitch_map import (
        rules_for_config,
        unused_torch_defaults,
        vits_disc_rules,
        xvapitch_generator_rules,
    )

    if model_cfg is not None:
        rules = rules_for_config(model_cfg)
        defaults = unused_torch_defaults(model_cfg.pitch_layers)
    else:
        rules = xvapitch_generator_rules()
        defaults = unused_torch_defaults()
    sd = apply_export(g_params, rules, dtype=np.float16)
    for k, (kind, shape) in defaults.items():
        sd[k] = (np.ones if kind == "ones" else np.zeros)(shape, np.float16)
    if d_params is not None:
        sd.update(apply_export(d_params, vits_disc_rules(), dtype=np.float16))
    if step is not None:
        sd["step"] = np.asarray(step, np.int64)
    return sd


def export_fastpitch_v2(
    params,
    out_path: str,
    voice_name: str,
    game_id: str = "other",
    author: str = "",
    emb: Optional[np.ndarray] = None,
    model_cfg=None,
    pitch_stats: Optional[Tuple[float, float]] = None,
) -> None:
    """xVASynth v2 export: fp16 ``.pt`` + metadata ``.json``
    (reference fastpitch1_1/xva_train.py:1030-1047)."""
    from ..interop.fastpitch_map import fastpitch_state_dict

    kw = {}
    if model_cfg is not None:
        kw = dict(in_layers=model_cfg.in_fft_n_layers,
                  out_layers=model_cfg.out_fft_n_layers,
                  d_model=model_cfg.symbols_embedding_dim)
    if pitch_stats is not None:
        kw.update(pitch_mean=pitch_stats[0], pitch_std=pitch_stats[1])
    sd = fastpitch_state_dict(params, **kw)
    torch_save_compatible(sd, out_path)
    meta = {
        "version": "2.0",
        "modelVersion": "2.0",
        "modelType": "FastPitch1.1",
        "author": author,
        "lang": "en",
        "games": [
            {
                "gameId": game_id,
                "voiceId": voice_name,
                "voiceName": voice_name,
                "resemblyzer": (emb.tolist() if emb is not None else []),
                "gender": "male",
            }
        ],
    }
    with open(os.path.splitext(out_path)[0] + ".json", "w") as f:
        json.dump(meta, f, indent=4)


def export_xvapitch_v3(
    params,
    out_path: str,
    voice_name: str,
    lang: str = "en",
    game_id: str = "other",
    author: str = "",
    base_emb: Optional[np.ndarray] = None,
    other_embs: Optional[list] = None,
    d_params=None,
    lang_capabilities: Optional[list] = None,
    model_cfg=None,
) -> None:
    """xVASynth v3 export (reference python/xvapitch/xva_train.py:984-1022):
    the flat torch-named fp16 state dict, loadable by the reference
    ``xVAPitchModel.load_state_dict`` directly."""
    sd = xvapitch_state_dict(params, d_params, model_cfg=model_cfg)
    torch_save_compatible(sd, out_path)
    meta = {
        "version": "3.0",
        "modelVersion": "3.0",
        "modelType": "xVAPitch",
        "author": author,
        "lang": lang,
        "lang_capabilities": lang_capabilities or [lang],
        "games": [
            {
                "gameId": game_id,
                "voiceId": voice_name,
                "voiceName": voice_name,
                "base_speaker_emb": (base_emb.tolist() if base_emb is not None else []),
                "gender": "male",
            }
        ],
    }
    if other_embs is not None:
        meta["games"][0]["other_embs"] = other_embs
    with open(os.path.splitext(out_path)[0] + ".json", "w") as f:
        json.dump(meta, f, indent=4)
