"""ctypes bindings for the C++ native runtime library.

Builds native/libmnn_tpu_native.so on first use (make; g++ only) and exposes:
  * StFile — zero-copy mmap safetensors reader (checkpoint load without
    reading weight bytes through Python);
  * NgramIndex — the lookahead-draft suffix index.
Both have pure-Python fallbacks at their call sites; `available()` reports
whether the native library loaded.
"""

from __future__ import annotations

import ctypes
import json
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmnn_tpu_native.so")
_lib = None
_tried = False

_DTYPES = {
    "F32": np.float32, "F16": np.float16, "BF16": np.uint16, "F64": np.float64,
    "I8": np.int8, "U8": np.uint8, "I16": np.int16, "I32": np.int32,
    "I64": np.int64, "U16": np.uint16, "U32": np.uint32, "BOOL": np.bool_,
}


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        src = os.path.join(_NATIVE_DIR, "mnn_tpu_native.cpp")
        if not os.path.exists(src):
            return None
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True,
                capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.mnnst_open.restype = ctypes.c_void_p
    lib.mnnst_open.argtypes = [ctypes.c_char_p]
    lib.mnnst_num_tensors.argtypes = [ctypes.c_void_p]
    lib.mnnst_name.restype = ctypes.c_char_p
    lib.mnnst_name.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.mnnst_dtype.restype = ctypes.c_char_p
    lib.mnnst_dtype.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.mnnst_ndim.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.mnnst_shape.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int64)]
    lib.mnnst_data.restype = ctypes.c_void_p
    lib.mnnst_data.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_uint64)]
    lib.mnnst_header.restype = ctypes.c_char_p
    lib.mnnst_header.argtypes = [ctypes.c_void_p]
    lib.mnnst_close.argtypes = [ctypes.c_void_p]
    lib.mnnng_create.restype = ctypes.c_void_p
    lib.mnnng_create.argtypes = [ctypes.c_int, ctypes.c_int]
    lib.mnnng_extend.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int]
    lib.mnnng_propose.restype = ctypes.c_int
    lib.mnnng_propose.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32)]
    lib.mnnng_history_len.restype = ctypes.c_int
    lib.mnnng_history_len.argtypes = [ctypes.c_void_p]
    lib.mnnng_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


class StFile:
    """Zero-copy mmap safetensors reader (native)."""

    def __init__(self, path: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._h = lib.mnnst_open(path.encode())
        if not self._h:
            raise OSError(f"failed to open safetensors file {path}")
        self.names = []
        self._index = {}
        for i in range(lib.mnnst_num_tensors(self._h)):
            name = lib.mnnst_name(self._h, i).decode()
            self.names.append(name)
            self._index[name] = i

    def metadata(self) -> dict:
        header = json.loads(self._lib.mnnst_header(self._h).decode())
        return header.get("__metadata__", {}) or {}

    def tensor(self, name: str) -> np.ndarray:
        """Zero-copy view backed by the mmap (valid until close)."""
        i = self._index[name]
        lib = self._lib
        nd = lib.mnnst_ndim(self._h, i)
        shape = (ctypes.c_int64 * max(nd, 1))()
        lib.mnnst_shape(self._h, i, shape)
        dtype_s = lib.mnnst_dtype(self._h, i).decode()
        dtype = _DTYPES.get(dtype_s)
        if dtype is None:
            raise ValueError(f"unsupported dtype {dtype_s}")
        nbytes = ctypes.c_uint64()
        ptr = lib.mnnst_data(self._h, i, ctypes.byref(nbytes))
        buf = (ctypes.c_char * nbytes.value).from_address(ptr)
        arr = np.frombuffer(buf, dtype=dtype)
        return arr.reshape(tuple(shape[j] for j in range(nd)))

    def close(self):
        if self._h:
            self._lib.mnnst_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


class NativeNgramIndex:
    """Native counterpart of runtime.speculative.NgramDraft."""

    def __init__(self, max_n: int = 4, draft_len: int = 7):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self.draft_len = draft_len
        self._h = lib.mnnng_create(max_n, draft_len)

    def extend(self, tokens):
        arr = (ctypes.c_int32 * len(tokens))(*[int(t) for t in tokens])
        self._lib.mnnng_extend(self._h, arr, len(tokens))

    def propose(self) -> Optional[list]:
        out = (ctypes.c_int32 * self.draft_len)()
        n = self._lib.mnnng_propose(self._h, out)
        return [out[i] for i in range(n)] if n else None

    def __len__(self):
        return self._lib.mnnng_history_len(self._h)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.mnnng_destroy(self._h)
            self._h = None
