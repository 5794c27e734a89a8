"""Torch-free reader for PyTorch ``torch.save`` archives.

The reference ships its pretrained weights as ``.pt`` files (zip archives
containing a ``data.pkl`` pickle plus one raw little-endian buffer per tensor
storage). The trainers must load these on TPU hosts without importing torch,
so this module implements the minimal unpickler: persistent-id storage
resolution + ``_rebuild_tensor_v2`` into numpy arrays.

Reference writers: /root/reference/python/xvapitch/xva_train.py:984-1022
(export), hifigan/utils.py:39-61 (g_/do_ checkpoints).
"""
from __future__ import annotations

import io
import pickle
import zipfile
from collections import OrderedDict
from typing import Any, Dict

import numpy as np

_DTYPES = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "BFloat16Storage": None,  # handled specially below
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
}


class _StorageType:
    def __init__(self, name: str):
        self.name = name


class _Tensor:
    """Stand-in for torch.Tensor: a numpy view over a storage buffer."""

    def __init__(self, array: np.ndarray):
        self.array = array


def _bfloat16_to_float32(raw: bytes) -> np.ndarray:
    u16 = np.frombuffer(raw, dtype=np.uint16)
    u32 = u16.astype(np.uint32) << 16
    return u32.view(np.float32)


def _rebuild_tensor_v2(storage, storage_offset, size, stride, requires_grad,
                       backward_hooks, metadata=None):
    arr = storage
    if storage_offset or (size and stride):
        # materialize the strided view
        itemsize = arr.itemsize
        strides = tuple(s * itemsize for s in stride)
        arr = np.lib.stride_tricks.as_strided(
            arr[storage_offset:], shape=tuple(size), strides=strides
        ).copy()
    else:
        arr = arr.reshape(tuple(size))
    return _Tensor(arr)


def _rebuild_parameter(tensor, requires_grad, backward_hooks):
    return tensor


class _Unpickler(pickle.Unpickler):
    def __init__(self, f, load_storage):
        super().__init__(f)
        self._load_storage = load_storage

    def find_class(self, module, name):
        if name == "_rebuild_tensor_v2":
            return _rebuild_tensor_v2
        if name == "_rebuild_parameter":
            return _rebuild_parameter
        if name.endswith("Storage") and module.startswith("torch"):
            return _StorageType(name)
        if (module, name) == ("collections", "OrderedDict"):
            return OrderedDict
        if module.startswith("torch"):
            if name.startswith("_rebuild"):
                # an unsupported tensor-rebuild path (legacy/sparse/quantized)
                # must fail loudly here, not as a None leaf deep in import
                def _unsupported(*a, _n=name, **k):
                    raise pickle.UnpicklingError(
                        f"unsupported torch rebuild function {_n!r} — this "
                        f"checkpoint format is not handled by the torch-free "
                        f"reader"
                    )

                return _unsupported
            # dtype markers etc. — opaque placeholders, never invoked with
            # meaning
            return lambda *a, **k: None
        return super().find_class(module, name)

    def persistent_load(self, pid):
        kind = pid[0]
        if kind != "storage":
            raise pickle.UnpicklingError(f"unsupported persistent id {kind}")
        storage_type, key, _location, numel = pid[1], pid[2], pid[3], pid[4]
        name = storage_type.name if isinstance(storage_type, _StorageType) else (
            getattr(storage_type, "__name__", str(storage_type))
        )
        return self._load_storage(key, name, numel)


def _unwrap(obj: Any) -> Any:
    if isinstance(obj, _Tensor):
        return obj.array
    if isinstance(obj, dict):
        return {k: _unwrap(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(_unwrap(v) for v in obj)
    return obj


def load_torch_pt(path: str) -> Dict[str, Any]:
    """Load a torch.save zip archive into nested dicts of numpy arrays.

    Supports the standard zipfile serialization (torch >= 1.6). bfloat16
    storages are widened to float32.
    """
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl_name = next(n for n in names if n.endswith("data.pkl"))
        prefix = pkl_name[: -len("data.pkl")]

        def load_storage(key, type_name, numel):
            raw = zf.read(f"{prefix}data/{key}")
            if type_name == "BFloat16Storage":
                return _bfloat16_to_float32(raw)
            dtype = _DTYPES.get(type_name)
            if dtype is None:
                raise ValueError(f"unsupported storage type {type_name}")
            return np.frombuffer(raw, dtype=dtype)

        with zf.open(pkl_name) as f:
            data = _Unpickler(io.BytesIO(f.read()), load_storage).load()
    return _unwrap(data)
