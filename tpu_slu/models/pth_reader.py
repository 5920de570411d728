"""Torch-free reader for ``torch.save`` checkpoint files.

The reference distributes trained checkpoints as ``model_state.pth`` written
by ``torch.save(state_dict)`` (reference ``training.py:35-39``). A TPU host
has no reason to carry a torch installation just to read them, so this module
parses the format directly:

* ``torch.save`` (>= 1.6) writes a **zip archive** containing
  ``<name>/data.pkl`` (a protocol-2 pickle of the object graph) plus one raw
  little-endian buffer per tensor storage at ``<name>/data/<key>``.
* Tensors are pickled as ``torch._utils._rebuild_tensor_v2(storage,
  storage_offset, size, stride, requires_grad, backward_hooks)`` where
  ``storage`` is a persistent id ``('storage', <StorageType>, <key>,
  <location>, <numel>)``.

This reader deliberately supports **flat tensor dicts only** — the only shape
the reference ever saves. Any other global in the pickle raises
``UnpicklingError`` (a safety property, not a limitation: it cannot execute
arbitrary reduce callables the way ``pickle.load`` / ``torch.load`` with
``weights_only=False`` can). ``torch_import._load_state`` falls back to
``torch.load`` for legacy (non-zip) files or exotic pickles.
"""

from __future__ import annotations

import io
import pickle
import zipfile
from collections import OrderedDict

import numpy as np

_STORAGE_DTYPES = {
    "FloatStorage": np.dtype(np.float32),
    "DoubleStorage": np.dtype(np.float64),
    "HalfStorage": np.dtype(np.float16),
    "LongStorage": np.dtype(np.int64),
    "IntStorage": np.dtype(np.int32),
    "ShortStorage": np.dtype(np.int16),
    "CharStorage": np.dtype(np.int8),
    "ByteStorage": np.dtype(np.uint8),
    "BoolStorage": np.dtype(np.bool_),
}
try:  # bfloat16 tensors (not used by the reference, cheap to support)
    import ml_dtypes

    _STORAGE_DTYPES["BFloat16Storage"] = np.dtype(ml_dtypes.bfloat16)
except ImportError:  # pragma: no cover
    pass


class _StorageType:
    """Marker returned by find_class for ``torch.FloatStorage`` et al."""

    def __init__(self, dtype: np.dtype):
        self.dtype = dtype


def _rebuild_tensor(storage, offset, size, stride, *_ignored):
    """numpy stand-in for torch._utils._rebuild_tensor_v2 (and _rebuild_tensor).

    ``storage`` is the (1-D typed array, dtype) pair produced by
    persistent_load; offset/size are in elements, stride in elements per
    torch convention. Returns a contiguous owning ndarray.
    """
    flat, dtype = storage
    if not size:  # 0-d tensor
        return flat[offset : offset + 1].copy().reshape(())
    byte_strides = tuple(int(s) * dtype.itemsize for s in stride)
    view = np.lib.stride_tricks.as_strided(
        flat[offset:], shape=tuple(int(s) for s in size), strides=byte_strides
    )
    return np.ascontiguousarray(view)


class _StateDictUnpickler(pickle.Unpickler):
    def __init__(self, data: bytes, read_storage):
        super().__init__(io.BytesIO(data))
        self._read_storage = read_storage

    def find_class(self, module, name):
        if module == "torch._utils" and name in ("_rebuild_tensor_v2", "_rebuild_tensor"):
            return _rebuild_tensor
        if module == "collections" and name == "OrderedDict":
            return OrderedDict
        if module == "torch" and name in _STORAGE_DTYPES:
            return _StorageType(_STORAGE_DTYPES[name])
        raise pickle.UnpicklingError(
            f"pth_reader supports flat tensor state_dicts only; refusing {module}.{name}"
        )

    def persistent_load(self, pid):
        if not (isinstance(pid, tuple) and len(pid) >= 5 and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unsupported persistent id: {pid!r}")
        storage_type, key = pid[1], pid[2]
        if not isinstance(storage_type, _StorageType):
            raise pickle.UnpicklingError(f"unsupported storage type: {storage_type!r}")
        raw = self._read_storage(str(key))
        return (np.frombuffer(raw, dtype=storage_type.dtype), storage_type.dtype)


def is_torch_zip(path) -> bool:
    """True when ``path`` looks like a modern (zip-format) torch.save file."""
    try:
        if not zipfile.is_zipfile(path):
            return False
        with zipfile.ZipFile(path) as z:
            return any(n == "data.pkl" or n.endswith("/data.pkl") for n in z.namelist())
    except (OSError, zipfile.BadZipFile):
        return False


def load_state_dict(path) -> "OrderedDict[str, np.ndarray]":
    """Read a torch.save zip checkpoint into ``{key: np.ndarray}``, no torch.

    Raises ``pickle.UnpicklingError``/``ValueError`` for anything other than a
    flat dict of CPU tensors (callers fall back to ``torch.load``).
    """
    with zipfile.ZipFile(path) as z:
        names = z.namelist()
        pkls = [n for n in names if n == "data.pkl" or n.endswith("/data.pkl")]
        if len(pkls) != 1:
            raise ValueError(f"expected exactly one data.pkl in {path}, found {pkls}")
        prefix = pkls[0][: -len("data.pkl")]
        bo = f"{prefix}byteorder"
        if bo in names and z.read(bo).decode().strip() != "little":
            raise ValueError("big-endian torch checkpoints are not supported")
        state = _StateDictUnpickler(
            z.read(pkls[0]), lambda key: z.read(f"{prefix}data/{key}")
        ).load()
    if not isinstance(state, dict):
        raise ValueError(f"checkpoint root is {type(state).__name__}, expected a dict")
    return OrderedDict((str(k), np.asarray(v)) for k, v in state.items())
