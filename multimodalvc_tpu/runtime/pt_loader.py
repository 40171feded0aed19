"""Torch-free reader for PyTorch ``.pt`` / ``.pth`` checkpoints.

The reference ships every pretrained artifact as torch checkpoints
(433h/1759h AVSR models, sr_predictor, HiFi-GAN vocoder incl. EMA copies —
reference: src/model.py:140,191, src/modelSpeechNoLLM_E2E.py:118-142).  This
module parses the torch zip-archive serialization format directly:
``data.pkl`` is a pickle stream whose persistent IDs name storage files in
``archive/data/``; tensors are rebuilt as numpy arrays (no torch import, no
arbitrary-code unpickling — only whitelisted globals are honoured).

Legacy (pre-zip, tar/seekable) checkpoints fall back to torch if present.
"""
from __future__ import annotations

import io
import pickle
import struct
import zipfile
from typing import Any, BinaryIO, Dict

import numpy as np

_DTYPE_MAP = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
    "BFloat16Storage": "bfloat16",
}


class _Storage:
    """Lazily-read flat buffer backing one or more tensor views."""

    __slots__ = ("dtype", "data")

    def __init__(self, dtype, data: bytes):
        self.dtype = dtype
        self.data = data

    def as_array(self) -> np.ndarray:
        if self.dtype == "bfloat16":
            # numpy has no bf16: widen via uint16 -> float32
            u16 = np.frombuffer(self.data, dtype=np.uint16)
            return (u16.astype(np.uint32) << 16).view(np.float32)
        return np.frombuffer(self.data, dtype=self.dtype)


class _FakeTensor:
    """Placeholder for torch.Tensor rebuilt from (storage, offset, size, stride)."""

    def __init__(self, array: np.ndarray):
        self.array = array


def _rebuild_tensor(storage: _Storage, offset, size, stride, *_args, **_kw):
    flat = storage.as_array()
    size = tuple(int(s) for s in size)
    stride = tuple(int(s) for s in stride)
    if not size:
        return np.asarray(flat[offset])
    itemsize = flat.dtype.itemsize
    arr = np.lib.stride_tricks.as_strided(
        flat[offset:], shape=size, strides=tuple(s * itemsize for s in stride)
    )
    return np.ascontiguousarray(arr)


def _rebuild_parameter(data, requires_grad=False, hooks=None):
    return data


class _Skip:
    """Stand-in for unpicklable torch objects we don't need (configs etc.)."""

    def __init__(self, *args, **kwargs):
        self.args = args

    def __call__(self, *args, **kwargs):
        return _Skip()

    def __setstate__(self, state):
        self.state = state


_SAFE_GLOBALS = {
    ("collections", "OrderedDict"): dict,
    ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor,
    ("torch._utils", "_rebuild_tensor"): _rebuild_tensor,
    ("torch._utils", "_rebuild_parameter"): _rebuild_parameter,
    ("torch.serialization", "_get_layout"): _Skip,
    ("numpy.core.multiarray", "scalar"): lambda dt, val: np.frombuffer(val, dtype=dt)[0],
    ("numpy.core.multiarray", "_reconstruct"): np.core.multiarray._reconstruct
    if hasattr(np, "core")
    else _Skip,
    ("numpy", "ndarray"): np.ndarray,
    ("numpy", "dtype"): np.dtype,
    ("_codecs", "encode"): lambda s, enc: s.encode(enc),
    ("builtins", "set"): set,
    ("builtins", "frozenset"): frozenset,
    ("builtins", "slice"): slice,
    ("builtins", "complex"): complex,
}


class _TorchUnpickler(pickle.Unpickler):
    def __init__(self, file: BinaryIO, storage_loader):
        super().__init__(file)
        self._storage_loader = storage_loader

    def find_class(self, module: str, name: str):
        key = (module, name)
        if key in _SAFE_GLOBALS:
            return _SAFE_GLOBALS[key]
        if module.startswith("torch") and name.endswith("Storage"):
            return name  # marker consumed by persistent_load
        if module == "torch" and name in ("Size",):
            return tuple
        if module == "torch" and name.endswith("dtype"):
            return _Skip
        # Unknown classes (argparse.Namespace, omegaconf nodes, fairseq
        # dataclasses...) — return an inert shell that swallows state.
        return type(name, (_Skip,), {"__module__": module})

    def persistent_load(self, pid):
        typename = pid[0]
        if typename == "storage":
            storage_type, key, _location, _numel = pid[1], pid[2], pid[3], pid[4]
            if isinstance(storage_type, str):
                name = storage_type
            else:
                name = getattr(storage_type, "__name__", str(storage_type))
            dtype = _DTYPE_MAP.get(name)
            if dtype is None:
                raise ValueError(f"unsupported torch storage type {name}")
            return self._storage_loader(key, dtype)
        raise pickle.UnpicklingError(f"unsupported persistent id {typename}")


def load_pt(path: str) -> Any:
    """Load a torch zip-format checkpoint into nested dicts of numpy arrays.

    Non-tensor leaves (configs, namespaces) come back as inert ``_Skip``
    shells; tensor state dicts are exact.
    """
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl_name = next(n for n in names if n.endswith("data.pkl"))
        prefix = pkl_name[: -len("data.pkl")]

        def storage_loader(key: str, dtype) -> _Storage:
            with zf.open(f"{prefix}data/{key}") as f:
                return _Storage(dtype, f.read())

        with zf.open(pkl_name) as f:
            return _TorchUnpickler(io.BytesIO(f.read()), storage_loader).load()


def flatten_state_dict(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    """Flatten nested dicts to {'a.b.c': ndarray}, dropping non-array leaves."""
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            key = f"{prefix}.{k}" if prefix else str(k)
            out.update(flatten_state_dict(v, key))
    elif isinstance(tree, np.ndarray):
        out[prefix] = tree
    elif isinstance(tree, (np.floating, np.integer)):
        out[prefix] = np.asarray(tree)
    return out
