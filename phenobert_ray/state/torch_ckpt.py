"""Torch-free reader/writer for the ``torch.save`` zip checkpoint format.

The reference distributes its trained models as ``torch.save`` files
(ModelSaver, util.py:600-630).  Torch is not installable in this
environment, but the on-disk format is public and simple: a zip archive
holding ``<name>/data.pkl`` (a pickle whose tensors are rebuilt through
``torch._utils._rebuild_tensor_v2`` over persistent-ID storage references)
plus one raw little-endian buffer per storage under ``<name>/data/<key>``.

``read_state_dict`` parses that format with a restricted unpickler and
returns ``{param_name: numpy.ndarray}`` — enough to run inference math in
numpy.  ``write_state_dict`` emits the same layout (used by tests to build
weight fixtures; a real ``torch.load`` would accept the file shape).

Security note: the unpickler REFUSES every global except the handful the
tensor format needs — an arbitrary pickle cannot execute code through it.
"""

from __future__ import annotations

import io
import pickle
import zipfile
from collections import OrderedDict

import numpy as np

_DTYPES = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
}
_STORAGE_BY_DTYPE = {np.dtype(v): k for k, v in _DTYPES.items()}


class _StorageType:
    """Marker standing in for ``torch.XxxStorage`` classes in the pickle."""

    def __init__(self, name: str):
        self.name = name
        self.dtype = np.dtype(_DTYPES[name])


def _rebuild_tensor_v2(storage, storage_offset, size, stride, *unused):
    arr, dtype = storage
    n = int(np.prod(size)) if size else 1
    flat = np.frombuffer(arr, dtype=dtype, offset=storage_offset * dtype.itemsize,
                         count=n if size else 1)
    if not size:
        return flat.reshape(())[()]
    # stride is in elements; as_strided over the buffer view
    return np.lib.stride_tricks.as_strided(
        flat, shape=tuple(size),
        strides=tuple(s * dtype.itemsize for s in stride),
    ).copy()


class _Unpickler(pickle.Unpickler):
    def __init__(self, f, storages):
        super().__init__(f)
        self._storages = storages

    def find_class(self, module, name):
        if module == "torch._utils" and name in ("_rebuild_tensor_v2", "_rebuild_tensor"):
            return _rebuild_tensor_v2
        if module == "torch" and name in _DTYPES:
            return _StorageType(name)
        if (module, name) == ("collections", "OrderedDict"):
            return OrderedDict
        raise pickle.UnpicklingError(
            f"refusing to unpickle global {module}.{name} (not part of the "
            f"tensor checkpoint format)"
        )

    def persistent_load(self, pid):
        kind, storage_type, key, _location, _numel = pid
        assert kind == "storage"
        return (self._storages[key], storage_type.dtype)


def read_state_dict(path: str) -> dict[str, np.ndarray]:
    """Parse a torch.save zip checkpoint into {name: numpy array}."""
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl = next(n for n in names if n.endswith("/data.pkl"))
        root = pkl[: -len("/data.pkl")]
        storages = {
            n[len(root) + len("/data/"):]: zf.read(n)
            for n in names
            if n.startswith(f"{root}/data/")
        }
        obj = _Unpickler(io.BytesIO(zf.read(pkl)), storages).load()
    return dict(obj)


# --- writer (fixture / interchange) ----------------------------------------


class _TensorStub:
    def __init__(self, arr: np.ndarray, key: str):
        self.arr = np.ascontiguousarray(arr)
        self.key = key

    def __reduce_ex__(self, protocol):
        stride = tuple(s // self.arr.itemsize for s in self.arr.strides)
        return (
            _global_stub("torch._utils", "_rebuild_tensor_v2"),
            (_StorageStub(self.arr, self.key), 0, self.arr.shape, stride,
             False, OrderedDict()),
        )


class _StorageStub:
    def __init__(self, arr: np.ndarray, key: str):
        self.arr = arr
        self.key = key


_GLOBAL_CACHE: dict = {}


def _global_stub(module: str, name: str):
    """A callable that pickles as ``GLOBAL module name``."""
    fn = _GLOBAL_CACHE.get((module, name))
    if fn is None:
        def fn(*a, **k):  # pragma: no cover - never called locally
            raise RuntimeError("stub")

        fn.__module__ = module
        fn.__qualname__ = fn.__name__ = name
        _GLOBAL_CACHE[(module, name)] = fn
    return fn


class _Pickler(pickle.Pickler):
    def persistent_id(self, obj):
        if isinstance(obj, _StorageStub):
            st_name = _STORAGE_BY_DTYPE[obj.arr.dtype]
            return ("storage", _global_stub("torch", st_name), obj.key,
                    "cpu", int(obj.arr.size))
        return None


def write_state_dict(path: str, state: dict[str, np.ndarray],
                     archive_name: str = "archive") -> None:
    """Write {name: array} in the torch.save zip layout.

    The C pickler verifies that GLOBAL targets are importable, so the
    writer registers throwaway ``torch`` / ``torch._utils`` stub modules
    for the duration of the dump (try/finally; the writer only ever runs
    to build test fixtures, never in pipeline workers)."""
    import sys
    import types

    keys = {name: str(i) for i, name in enumerate(state)}
    od = OrderedDict(
        (name, _TensorStub(arr, keys[name])) for name, arr in state.items()
    )
    buf = io.BytesIO()
    had_torch = "torch" in sys.modules
    if not had_torch:
        torch_mod = types.ModuleType("torch")
        utils_mod = types.ModuleType("torch._utils")
        utils_mod._rebuild_tensor_v2 = _global_stub("torch._utils", "_rebuild_tensor_v2")
        for st_name in _DTYPES:
            setattr(torch_mod, st_name, _global_stub("torch", st_name))
        torch_mod._utils = utils_mod
        sys.modules["torch"] = torch_mod
        sys.modules["torch._utils"] = utils_mod
    try:
        _Pickler(buf, protocol=2).dump(od)
    finally:
        if not had_torch:
            sys.modules.pop("torch", None)
            sys.modules.pop("torch._utils", None)
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr(f"{archive_name}/version", "3\n")
        zf.writestr(f"{archive_name}/data.pkl", buf.getvalue())
        for name, arr in state.items():
            zf.writestr(
                f"{archive_name}/data/{keys[name]}",
                np.ascontiguousarray(arr).tobytes(),
            )
