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


# --- whole-model reader (the reference's actual release format) ------------
#
# The reference saves WHOLE models (ModelSaver without params_only,
# util.py:600-611: ``torch.save(model)``), so its released .pkl files are
# pickles of nn.Module object TREES — module instances whose ``__dict__``
# holds ``_parameters`` / ``_buffers`` / ``_modules`` OrderedDicts — not
# plain state dicts.  ``read_module_tree`` parses those without torch:
# every class in the pickle resolves to a generated attribute-holder STUB
# (no code from the pickle ever executes — stubs only store state), tensor
# rebuilds resolve to numpy, and ``flatten_module_state`` then walks the
# stub tree into the flat ``{qualified.name: ndarray}`` layout that
# ``models_np`` / ``bert_np`` load.  Both torch serialization formats are
# handled: the zip layout (torch ≥1.6 default) and the legacy streamed
# layout (torch 1.3-1.5, magic-number header + storages after the pickle;
# the reference pins torch>=1.3.1 so either may occur in the wild).


class _LazyStorage:
    """Mutable holder filled after the main pickle in the LEGACY format
    (storage bytes stream after the pickle, keyed by root key)."""

    __slots__ = ("data", "dtype")

    def __init__(self, dtype):
        self.data = None
        self.dtype = dtype


class _LazyTensor:
    """Tensor over a (possibly not-yet-filled) storage; materializes on
    :func:`_np` access — by flatten time every storage has been filled."""

    __slots__ = ("storage", "offset", "size", "stride")

    def __init__(self, storage, offset, size, stride):
        self.storage, self.offset = storage, offset
        self.size, self.stride = size, stride

    def to_numpy(self) -> np.ndarray:
        buf, dtype = self.storage
        if isinstance(buf, _LazyStorage):
            buf = buf.data
        return _rebuild_tensor_v2((buf, dtype), self.offset, self.size,
                                  self.stride)


def _np(x):
    """numpy array from whatever a rebuild produced (eager or lazy)."""
    if isinstance(x, _LazyTensor):
        return x.to_numpy()
    if isinstance(x, np.ndarray) or np.isscalar(x):
        return np.asarray(x)
    return None


class _Stub:
    """Instance stand-in for ANY class named in a whole-model pickle
    (nn.Module subclasses, tokenizers, configs...).  Holds attributes and
    nothing else — no method from the original class can run."""

    _qual = "?"

    def __new__(cls, *args, **kwargs):
        obj = object.__new__(cls)
        if args or kwargs:
            obj.__dict__["_newargs"] = (args, kwargs)
        return obj

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        elif (isinstance(state, tuple) and len(state) == 2
              and all(isinstance(s, (dict, type(None))) for s in state)):
            for s in state:
                if s:
                    self.__dict__.update(s)
        else:
            self.__dict__["_state"] = state

    def __repr__(self):  # pragma: no cover - debugging aid
        return f"<stub {self._qual}>"


_STUB_CACHE: dict[tuple[str, str], type] = {}


def _stub_class(module: str, name: str) -> type:
    cls = _STUB_CACHE.get((module, name))
    if cls is None:
        cls = type(name, (_Stub,), {
            "_qual": f"{module}.{name}",
            "__module__": module,
            "__qualname__": name,
        })
        _STUB_CACHE[(module, name)] = cls
    return cls


def _rebuild_parameter(data, requires_grad=True, backward_hooks=None):
    return data


def _reconstructor(cls, base, state):
    obj = cls.__new__(cls)
    if state is not None and state != ():
        try:
            obj.__dict__["_state"] = state
        except (AttributeError, TypeError):  # pragma: no cover
            pass
    return obj


class _ModuleUnpickler(pickle.Unpickler):
    """Permissive-but-inert unpickler: tensor plumbing resolves to numpy,
    whitelisted pure-data numpy constructors resolve for real, and every
    other global becomes an attribute-holder stub class."""

    def __init__(self, f, storages):
        super().__init__(f)
        self._storages = storages  # key -> bytes | _LazyStorage

    def find_class(self, module, name):
        if module == "torch._utils":
            if name in ("_rebuild_tensor_v2", "_rebuild_tensor"):
                return _lazy_rebuild_tensor
            if name == "_rebuild_parameter":
                return _rebuild_parameter
        if module == "torch" and name in _DTYPES:
            return _StorageType(name)
        if module == "torch" and name == "Size":
            return tuple
        if module == "torch" and name == "device":
            return lambda *a: str(a[0]) if a else "cpu"
        if (module, name) == ("collections", "OrderedDict"):
            return OrderedDict
        if (module, name) == ("copy_reg", "_reconstructor") or (
            module, name
        ) == ("copyreg", "_reconstructor"):
            return _reconstructor
        # pure-data numpy reconstruction (fastNLP vocabs embed arrays)
        if module.startswith("numpy") and name in (
            "_reconstruct", "ndarray", "dtype", "scalar",
        ):
            import importlib

            return getattr(importlib.import_module(module), name)
        return _stub_class(module, name)

    def persistent_load(self, pid):
        kind = pid[0]
        assert kind == "storage", f"unknown persistent id {kind!r}"
        storage_type, key = pid[1], pid[2]
        dtype = (storage_type.dtype if isinstance(storage_type, _StorageType)
                 else np.float32)
        store = self._storages
        if key not in store:  # legacy: bytes arrive after the pickle
            store[key] = _LazyStorage(dtype)
        return (store[key], dtype)


def _lazy_rebuild_tensor(storage, storage_offset, size, stride, *unused):
    buf, dtype = storage
    if isinstance(buf, _LazyStorage):
        return _LazyTensor(storage, storage_offset, size, stride)
    return _rebuild_tensor_v2(storage, storage_offset, size, stride)


_LEGACY_MAGIC = 0x1950A86A20F9469CFC6C


class _PrimitiveUnpickler(pickle.Unpickler):
    """For the legacy stream's header objects (magic number, protocol
    version, sys-info dict, storage-key list) — all pure primitives.
    Refuses EVERY global, so a malicious header pickle cannot execute
    code before the restricted module unpickler takes over."""

    def find_class(self, module, name):
        raise pickle.UnpicklingError(
            f"refusing to unpickle global {module}.{name} in a legacy "
            f"checkpoint header (primitives only)")

    def persistent_load(self, pid):
        raise pickle.UnpicklingError(
            "persistent id in a legacy checkpoint header")


def _load_primitive(f):
    return _PrimitiveUnpickler(f).load()


def read_module_tree(path: str):
    """Parse a ``torch.save(model)`` file (zip OR legacy format) into a
    stub-object tree.  Follow with :func:`flatten_module_state`."""
    if zipfile.is_zipfile(path):
        with zipfile.ZipFile(path) as zf:
            names = zf.namelist()
            pkl = next(n for n in names if n.endswith("/data.pkl"))
            root = pkl[: -len("/data.pkl")]
            storages = {
                n[len(root) + len("/data/"):]: zf.read(n)
                for n in names
                if n.startswith(f"{root}/data/")
            }
            return _ModuleUnpickler(io.BytesIO(zf.read(pkl)), storages).load()

    with open(path, "rb") as f:
        magic = _load_primitive(f)
        if magic != _LEGACY_MAGIC:
            raise ValueError(f"{path}: not a torch checkpoint (bad magic)")
        _load_primitive(f)  # protocol version
        _load_primitive(f)  # sys info
        storages: dict = {}
        obj = _ModuleUnpickler(f, storages).load()
        keys = _load_primitive(f)  # deserialized_storage_keys, in stream order
        for key in keys:
            holder = storages[key]
            numel = int(np.frombuffer(f.read(8), dtype="<i8")[0])
            holder.data = f.read(numel * holder.dtype.itemsize)
        return obj


def flatten_module_state(obj, prefix: str = "") -> dict[str, np.ndarray]:
    """Walk an unpickled module stub tree exactly like
    ``nn.Module.state_dict()``: recurse ``_modules``, collect
    ``_parameters`` and ``_buffers`` as ``{dotted.name: ndarray}``."""
    out: dict[str, np.ndarray] = {}
    d = getattr(obj, "__dict__", None)
    if not isinstance(d, dict):
        return out
    for attr in ("_parameters", "_buffers"):
        for name, val in (d.get(attr) or {}).items():
            arr = _np(val)
            if arr is not None:
                out[f"{prefix}{name}"] = arr
    for name, sub in (d.get("_modules") or {}).items():
        out.update(flatten_module_state(sub, prefix=f"{prefix}{name}."))
    return out


def find_attr(obj, name: str, max_depth: int = 8):
    """Depth-first search of a stub tree for the first attribute called
    ``name`` (used to dig tokenizer vocabs etc. out of wrapper objects)."""
    seen: set[int] = set()

    def walk(o, depth):
        if depth > max_depth or id(o) in seen:
            return None
        seen.add(id(o))
        # plain dicts FIRST: OrderedDict instances also expose an (empty)
        # instance __dict__, which would otherwise shadow their items
        if isinstance(o, dict):
            if name in o:
                return o[name]
            for v in o.values():
                r = walk(v, depth + 1)
                if r is not None:
                    return r
        elif isinstance(getattr(o, "__dict__", None), dict):
            d = o.__dict__
            if name in d:
                return d[name]
            for v in d.values():
                r = walk(v, depth + 1)
                if r is not None:
                    return r
        elif isinstance(o, (list, tuple)):
            for v in o:
                r = walk(v, depth + 1)
                if r is not None:
                    return r
        return None

    return walk(obj, 0)


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


# --- whole-model fixture writer ---------------------------------------------
#
# Builds files in the exact shape of the reference's released artifacts
# (``torch.save(model)`` of an nn.Module tree) so the import path can be
# tested hermetically: a real ``torch.load`` on a torch machine and
# :func:`read_module_tree` here both accept them.


class ModuleSpec:
    """Declarative stand-in for one nn.Module in a fixture tree."""

    def __init__(self, qual: str, params: dict | None = None,
                 buffers: dict | None = None, modules: dict | None = None,
                 extra: dict | None = None):
        self.qual = qual
        self.params = params or {}
        self.buffers = buffers or {}
        self.modules = modules or {}
        self.extra = extra or {}


class _ModuleNode:
    """Pickles as ``copyreg._reconstructor(Class, object, None)`` + BUILD
    with the module ``__dict__`` — the classic protocol-2 instance shape a
    real torch.save(model) emits."""

    def __init__(self, cls: type, state: dict):
        self.cls = cls
        self.state = state

    def __reduce__(self):
        import copyreg

        return (copyreg._reconstructor, (self.cls, object, None), self.state)


def _spec_to_node(spec: ModuleSpec, tensors: list) -> _ModuleNode:
    def tensor(arr):
        key = str(len(tensors))
        stub = _TensorStub(np.asarray(arr), key)
        tensors.append(stub)
        return stub

    state = {
        "_parameters": OrderedDict(
            (k, tensor(v)) for k, v in spec.params.items()),
        "_buffers": OrderedDict(
            (k, tensor(v)) for k, v in spec.buffers.items()),
        "_modules": OrderedDict(
            (k, _spec_to_node(v, tensors)) for k, v in spec.modules.items()),
        "training": False,
    }
    state.update(spec.extra)
    return _ModuleNode(_stub_class(*spec.qual.rsplit(".", 1)), state)


def write_module_tree(path: str, spec: ModuleSpec, legacy: bool = False,
                      archive_name: str = "archive") -> None:
    """Write a whole-model checkpoint fixture (zip layout, or the torch
    1.3-1.5 legacy streamed layout when ``legacy=True``)."""
    import sys
    import types

    tensors: list[_TensorStub] = []
    root = _spec_to_node(spec, tensors)

    # the C pickler resolves GLOBALs through sys.modules — register fake
    # modules for every class named in the tree (try/finally, writer-only)
    added: list[str] = []

    def ensure_module(modname: str) -> types.ModuleType:
        if modname not in sys.modules:
            sys.modules[modname] = types.ModuleType(modname)
            added.append(modname)
        return sys.modules[modname]

    def register(s: ModuleSpec):
        mod, name = s.qual.rsplit(".", 1)
        m = ensure_module(mod)
        if not hasattr(m, name):
            setattr(m, name, _stub_class(mod, name))
        for sub in s.modules.values():
            register(sub)

    register(spec)
    tm = ensure_module("torch")
    ensure_module("torch._utils")._rebuild_tensor_v2 = _global_stub(
        "torch._utils", "_rebuild_tensor_v2")
    for st_name in _DTYPES:
        if not hasattr(tm, st_name):
            setattr(tm, st_name, _global_stub("torch", st_name))

    buf = io.BytesIO()
    try:
        _Pickler(buf, protocol=2).dump(root)
    finally:
        for modname in added:
            sys.modules.pop(modname, None)

    if not legacy:
        with zipfile.ZipFile(path, "w") as zf:
            zf.writestr(f"{archive_name}/version", "3\n")
            zf.writestr(f"{archive_name}/data.pkl", buf.getvalue())
            for t in tensors:
                zf.writestr(f"{archive_name}/data/{t.key}",
                            np.ascontiguousarray(t.arr).tobytes())
        return

    with open(path, "wb") as f:
        pickle.dump(_LEGACY_MAGIC, f, protocol=2)
        pickle.dump(1001, f, protocol=2)  # torch serialization protocol
        pickle.dump({"little_endian": True}, f, protocol=2)
        f.write(buf.getvalue())
        pickle.dump([t.key for t in tensors], f, protocol=2)
        for t in tensors:
            arr = np.ascontiguousarray(t.arr)
            f.write(np.int64(arr.size).tobytes())
            f.write(arr.tobytes())
