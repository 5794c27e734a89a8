"""ModelsManager: lazy registry of tools + trainers + inference models.

Parity target: reference python/models_manager.py:19-161 — ``init_model(key)``
lazily constructs into a bank, ``sync_init_model`` for trainers,
``load_model(key, ckpt)`` for inference models, ``set_device`` hot-swap.
Unlike the reference (which mutates the bank from a second thread with no
synchronization — SURVEY.md §5.2), this registry is owned by a single asyncio
loop and guarded by a lock."""
from __future__ import annotations

import asyncio
from typing import Any, Dict

from ..tools import TOOL_REGISTRY


class ModelsManager:
    def __init__(self, logger=None, PROD: bool = False, device: str = "tpu"):
        self.logger = logger
        self.PROD = PROD
        self.device = device
        self.models_bank: Dict[str, Any] = {}
        self.shared_cache: Dict[str, Any] = {}  # e.g. the speaker encoder
        self._lock = asyncio.Lock()

    async def init_model(self, key: str):
        key = key.lower()
        async with self._lock:
            if key in self.models_bank:
                return self.models_bank[key]
            model = self._construct(key)
            self.models_bank[key] = model
            return model

    def sync_init_model(self, key: str):
        key = key.lower()
        if key not in self.models_bank:
            self.models_bank[key] = self._construct(key)
        return self.models_bank[key]

    def _construct(self, key: str):
        if key in TOOL_REGISTRY:
            return TOOL_REGISTRY[key](self.logger, self.PROD, self.device, self)
        if key == "xvapitch":
            from ..train.xvapitch_trainer import XVAPitchTrainer

            return XVAPitchTrainer  # trainer class; server instantiates per run
        if key == "fastpitch1_1":
            from ..train.fastpitch_trainer import FastPitchTrainer

            return FastPitchTrainer
        if key == "hifigan":
            from ..train.hifigan_trainer import HifiganTrainer

            return HifiganTrainer
        if key == "speaker_encoder":
            from ..models.speaker_encoder import SpeakerEncoder

            return SpeakerEncoder()
        raise KeyError(f"unknown model key: {key}")

    def load_model(self, key: str, ckpt_path: str, **kwargs):
        """Inference-model loading (reference :130-150)."""
        key = key.lower()
        if key == "infer_fastpitch" or key == "infer_xvapitch":
            self.models_bank[key] = {"ckpt": ckpt_path, **kwargs}
            return self.models_bank[key]
        raise KeyError(key)

    def set_device(self, device: str):
        self.device = device
        for m in self.models_bank.values():
            if hasattr(m, "set_device"):
                m.set_device(device)

    def drop(self, key: str):
        self.models_bank.pop(key.lower(), None)
