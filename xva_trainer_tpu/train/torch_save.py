"""Pure-Python writer of the PyTorch zip checkpoint format (torch-free export).

xVASynth consumes ``.pt`` files (fp16 state dicts + metadata JSON — reference
python/fastpitch1_1/xva_train.py:1030-1047, python/xvapitch/xva_train.py:984-1022).
This emits torch.save-compatible archives (zip containing ``data.pkl`` plus raw
little-endian storages) without importing torch, so the core framework has no
torch dependency; tests round-trip the output through torch.load to prove
compatibility.

Format notes (torch serialization.py, public format): zip with
``archive/data.pkl`` (pickle proto 2; tensors are
``torch._utils._rebuild_tensor_v2(pers_storage, offset, size, stride,
requires_grad, OrderedDict())`` where the persistent id is
``('storage', <torch.XStorage global>, key, 'cpu', numel)``),
``archive/data/<key>`` raw buffers, and ``archive/version``.
"""
from __future__ import annotations

import io
import pickle
import zipfile
from collections import OrderedDict
from typing import Any, Dict

import numpy as np

_DTYPE_TO_STORAGE = {
    np.dtype(np.float32): "FloatStorage",
    np.dtype(np.float16): "HalfStorage",
    np.dtype(np.float64): "DoubleStorage",
    np.dtype(np.int64): "LongStorage",
    np.dtype(np.int32): "IntStorage",
    np.dtype(np.int16): "ShortStorage",
    np.dtype(np.uint8): "ByteStorage",
    np.dtype(np.int8): "CharStorage",
    np.dtype(np.bool_): "BoolStorage",
}


class _TorchGlobal:
    """Placeholder whose pickling emits ``GLOBAL module name`` directly."""

    def __init__(self, module: str, name: str):
        self.module, self.name = module, name

    def __call__(self, *a, **k):  # satisfies save_reduce's callable check
        raise RuntimeError("placeholder; resolved by torch on load")


class _Storage:
    def __init__(self, storage_type: _TorchGlobal, key: str, numel: int):
        self.storage_type = storage_type
        self.key = key
        self.numel = numel


_REBUILD = _TorchGlobal("torch._utils", "_rebuild_tensor_v2")


class _Tensor:
    def __init__(self, storage: _Storage, shape, stride):
        self.storage, self.shape, self.stride = storage, tuple(shape), tuple(stride)

    def __reduce_ex__(self, protocol):
        return (
            _REBUILD,
            (self.storage, 0, self.shape, self.stride, False, OrderedDict()),
        )


class _Pickler(pickle._Pickler):  # pure-Python pickler: customizable dispatch
    dispatch = pickle._Pickler.dispatch.copy()

    def persistent_id(self, obj):
        if isinstance(obj, _Storage):
            return ("storage", obj.storage_type, obj.key, "cpu", obj.numel)
        return None

    def _save_torch_global(self, obj: _TorchGlobal):
        self.write(
            pickle.GLOBAL + obj.module.encode() + b"\n" + obj.name.encode() + b"\n"
        )
        self.memoize(obj)

    dispatch[_TorchGlobal] = _save_torch_global


def _contiguous_strides(shape):
    strides, acc = [], 1
    for s in reversed(shape):
        strides.append(acc)
        acc *= s
    return tuple(reversed(strides))


def torch_save_compatible(obj: Any, path: str) -> None:
    """Save a pytree of numpy arrays / python scalars as a torch.save archive."""
    storages: Dict[str, np.ndarray] = {}
    counter = [0]

    def convert(x):
        if isinstance(x, np.ndarray):
            arr = np.ascontiguousarray(x)
            if arr.dtype not in _DTYPE_TO_STORAGE:
                arr = arr.astype(np.float32)
            key = str(counter[0])
            counter[0] += 1
            storages[key] = arr
            st = _Storage(
                _TorchGlobal("torch", _DTYPE_TO_STORAGE[arr.dtype]), key, arr.size
            )
            return _Tensor(st, arr.shape, _contiguous_strides(arr.shape))
        if isinstance(x, np.generic):
            return x.item()
        if isinstance(x, dict):
            return {k: convert(v) for k, v in x.items()}
        if isinstance(x, (list, tuple)):
            t = [convert(v) for v in x]
            return t if isinstance(x, list) else tuple(t)
        return x

    converted = convert(obj)
    buf = io.BytesIO()
    _Pickler(buf, protocol=2).dump(converted)

    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr("archive/data.pkl", buf.getvalue())
        zf.writestr("archive/version", "3\n")
        for key, arr in storages.items():
            zf.writestr(f"archive/data/{key}", arr.tobytes())
