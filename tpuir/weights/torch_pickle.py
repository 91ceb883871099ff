"""Dependency-free reader for PyTorch checkpoint files.

The reference zoo's checkpoints are torch pickles in three flavors
(SURVEY.md §5): plain state_dict (DnCNN), ``{'params': sd}``
(Restormer/MaIR), ``{'model': sd}`` with DataParallel prefixes
(DeblurGANv2 ``.h5``), and caffe-blob ``.pt`` (REDNet). This module reads
the modern zip container format with a restricted unpickler that
materializes tensors as NumPy arrays — no torch import needed at runtime.
Anything it cannot parse falls back to ``torch.load`` when torch exists.

Format notes (torch serialization, public): a ``.pt``/``.pth`` saved by
torch>=1.6 is a zip archive holding ``<name>/data.pkl`` plus one raw
little-endian buffer per storage at ``<name>/data/<key>``. The pickle
references storages via ``persistent_load`` tuples
``('storage', StorageType, key, location, numel)`` and rebuilds tensors
with ``torch._utils._rebuild_tensor_v2``.
"""

from __future__ import annotations

import pickle
import zipfile
from typing import Any, Dict

import numpy as np

_DTYPE_BY_STORAGE = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
    "BFloat16Storage": None,  # handled specially below
}


class _StorageStub:
    def __init__(self, name: str):
        self.name = name


class _TensorStub:
    """A lazily-materialized tensor; resolves to np.ndarray."""

    def __init__(self, array: np.ndarray):
        self.array = array

    def __reduce__(self):  # pragma: no cover
        return (np.asarray, (self.array,))


def _bf16_to_f32(raw: bytes, numel: int) -> np.ndarray:
    u16 = np.frombuffer(raw, dtype=np.uint16, count=numel)
    u32 = u16.astype(np.uint32) << 16
    return u32.view(np.float32)


def _rebuild_tensor_v2(storage, storage_offset, size, stride, *args):
    arr, dtype = storage
    if storage_offset or (stride and len(size)):
        flat = arr
        if len(size) == 0:
            return flat[storage_offset].copy()
        return np.lib.stride_tricks.as_strided(
            flat[storage_offset:],
            shape=tuple(size),
            strides=tuple(s * flat.dtype.itemsize for s in stride),
        ).copy()
    return arr.reshape(tuple(size)).copy()


def _rebuild_parameter(data, requires_grad=True, *args):
    return data


class BlockedPickleError(pickle.UnpicklingError):
    """A pickle global outside the explicit allowlist was requested.

    Deliberately distinct from parse errors: ``load_torch_checkpoint`` must
    NOT hand a checkpoint that tripped the blocklist to any less-restricted
    loader (checkpoints come from third-party GDrive/Bitbucket URLs)."""


def _np_reconstruct():
    # numpy moved multiarray between numpy.core and numpy._core across 1.x/2.x
    try:
        from numpy._core.multiarray import _reconstruct, scalar
    except ImportError:  # pragma: no cover
        from numpy.core.multiarray import _reconstruct, scalar
    return {"_reconstruct": _reconstruct, "scalar": scalar}


def _safe_globals():
    import argparse
    import collections

    np_ma = _np_reconstruct()
    table = {
        ("collections", "OrderedDict"): collections.OrderedDict,
        # harmless containers actually seen in torch checkpoints
        ("builtins", "set"): set,
        ("builtins", "frozenset"): frozenset,
        ("builtins", "complex"): complex,
        ("builtins", "bytearray"): bytearray,
        ("builtins", "slice"): slice,
        ("__builtin__", "set"): set,
        ("__builtin__", "frozenset"): frozenset,
        ("__builtin__", "complex"): complex,
        ("__builtin__", "bytearray"): bytearray,
        ("__builtin__", "slice"): slice,
        # option-dict payloads (e.g. DeblurGANv2 .h5 bundles its config)
        ("argparse", "Namespace"): argparse.Namespace,
        ("numpy", "ndarray"): np.ndarray,
        ("numpy", "dtype"): np.dtype,
    }
    for mod in ("numpy.core.multiarray", "numpy._core.multiarray"):
        table[(mod, "_reconstruct")] = np_ma["_reconstruct"]
        table[(mod, "scalar")] = np_ma["scalar"]
    return table


_SAFE_GLOBALS = _safe_globals()


class _RestrictedUnpickler(pickle.Unpickler):
    """Unpickles torch checkpoints into plain Python + NumPy objects.

    Globals resolve only through an explicit (module, name) allowlist —
    never whole modules (a builtins-wide whitelist would expose eval/exec).
    Anything else raises BlockedPickleError.
    """

    def __init__(self, file, storage_loader):
        super().__init__(file, encoding="latin1")
        self._storage_loader = storage_loader

    def find_class(self, module: str, name: str):
        if module.startswith("torch"):
            if name in _DTYPE_BY_STORAGE:
                return _StorageStub(name)
            if name == "_rebuild_tensor_v2":
                return _rebuild_tensor_v2
            if name == "_rebuild_parameter":
                return _rebuild_parameter
            if name in ("OrderedDict",):
                import collections

                return collections.OrderedDict
            # dtype objects like torch.float32 show up in some checkpoints
            if module == "torch" and name in (
                "float32",
                "float64",
                "float16",
                "bfloat16",
                "int64",
                "int32",
                "uint8",
                "bool",
            ):
                return name
            raise BlockedPickleError(f"blocked torch global {module}.{name}")
        obj = _SAFE_GLOBALS.get((module, name))
        if obj is not None:
            return obj
        raise BlockedPickleError(f"blocked global {module}.{name}")

    def persistent_load(self, pid):
        typename = pid[0]
        if typename != "storage":
            raise pickle.UnpicklingError(f"unknown persistent id {typename}")
        storage_type, key, location, numel = pid[1], pid[2], pid[3], pid[4]
        name = storage_type.name if isinstance(storage_type, _StorageStub) else str(storage_type)
        return self._storage_loader(name, key, int(numel))


def _load_zip(path: str):
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl_name = next(n for n in names if n.endswith("/data.pkl") or n == "data.pkl")
        prefix = pkl_name[: -len("data.pkl")]
        cache: Dict[str, np.ndarray] = {}

        def storage_loader(storage_name: str, key: str, numel: int):
            if key not in cache:
                raw = zf.read(f"{prefix}data/{key}")
                if storage_name == "BFloat16Storage":
                    arr = _bf16_to_f32(raw, numel)
                else:
                    dtype = _DTYPE_BY_STORAGE.get(storage_name)
                    if dtype is None:
                        raise pickle.UnpicklingError(f"storage {storage_name}")
                    arr = np.frombuffer(raw, dtype=dtype, count=numel)
                cache[key] = arr
            dtype = (
                np.float32
                if storage_name == "BFloat16Storage"
                else _DTYPE_BY_STORAGE[storage_name]
            )
            return (cache[key], dtype)

        with zf.open(pkl_name) as f:
            return _RestrictedUnpickler(f, storage_loader).load()


class _DeferredTensor:
    """Legacy-format tensor placeholder: storages appear *after* the pickle."""

    def __init__(self, key, storage_offset, size, stride):
        self.key = key
        self.storage_offset = storage_offset
        self.size = size
        self.stride = stride


class _HeaderUnpickler(pickle.Unpickler):
    """For the legacy-format header pickles (plain ints/strings/dicts):
    resolves NO globals at all, so even the bytes before/after the main
    payload cannot execute anything."""

    def find_class(self, module, name):  # pragma: no cover - security gate
        raise BlockedPickleError(f"blocked header global {module}.{name}")


def _header_load(f):
    return _HeaderUnpickler(f, encoding="latin1").load()


def _load_legacy(path: str):
    """Pre-1.6 torch format: sequential pickles + raw storage data."""
    with open(path, "rb") as f:
        magic = _header_load(f)
        if magic != 0x1950A86A20F9469CFC6C:
            raise pickle.UnpicklingError("not a legacy torch file")
        _header_load(f)  # protocol version
        _header_load(f)  # sys info
        storage_types: Dict[str, str] = {}

        def storage_loader(storage_name, key, numel):
            storage_types[str(key)] = storage_name
            return ("deferred", str(key))

        def rebuild_deferred(storage, storage_offset, size, stride, *args):
            if isinstance(storage, tuple) and storage[0] == "deferred":
                return _DeferredTensor(storage[1], storage_offset, size, stride)
            return _rebuild_tensor_v2(storage, storage_offset, size, stride, *args)

        class LegacyUnpickler(_RestrictedUnpickler):
            def find_class(self, module, name):
                if module.startswith("torch") and name == "_rebuild_tensor_v2":
                    return rebuild_deferred
                return super().find_class(module, name)

        result = LegacyUnpickler(f, storage_loader).load()
        # After the pickle, the file lists the storage keys then raw data.
        keys = _header_load(f)
        storages: Dict[str, np.ndarray] = {}
        for key in keys:
            storage_name = storage_types[str(key)]
            (numel,) = np.frombuffer(f.read(8), dtype=np.int64)
            if storage_name == "BFloat16Storage":
                storages[str(key)] = _bf16_to_f32(f.read(int(numel) * 2), int(numel))
            else:
                dtype = _DTYPE_BY_STORAGE[storage_name]
                storages[str(key)] = np.frombuffer(
                    f.read(int(numel) * np.dtype(dtype).itemsize), dtype=dtype
                )

    def materialize(obj):
        if isinstance(obj, _DeferredTensor):
            return _rebuild_tensor_v2(
                (storages[obj.key], storages[obj.key].dtype),
                obj.storage_offset,
                obj.size,
                obj.stride,
            )
        return obj

    return _walk(result, materialize)


def _walk(obj, fn):
    obj = fn(obj)
    if isinstance(obj, dict):
        return {k: _walk(v, fn) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        t = type(obj)
        return t(_walk(v, fn) for v in obj)
    return obj


def load_torch_checkpoint(path: str) -> Any:
    """Load a torch checkpoint into nested dicts of NumPy arrays.

    Falls back to ``torch.load(weights_only=True)`` only on *structural*
    parse failures (exotic container layouts the native reader doesn't
    know). A BlockedPickleError never falls through: a checkpoint the
    restricted reader rejected for safety must not reach a looser loader.
    """
    try:
        if zipfile.is_zipfile(path):
            return _load_zip(path)
        return _load_legacy(path)
    except BlockedPickleError:
        raise
    except Exception:
        try:
            import torch
        except ImportError as e:  # pragma: no cover
            raise RuntimeError(
                f"could not parse {path} natively and torch is unavailable"
            ) from e
        obj = torch.load(path, map_location="cpu", weights_only=True)
        return _torch_to_numpy(obj)


def _torch_to_numpy(obj):
    try:
        import torch

        if isinstance(obj, torch.Tensor):
            t = obj.detach().cpu()
            if t.dtype == torch.bfloat16:
                t = t.float()
            return t.numpy()
    except ImportError:  # pragma: no cover
        pass
    if isinstance(obj, dict):
        return {k: _torch_to_numpy(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(_torch_to_numpy(v) for v in obj)
    return obj
