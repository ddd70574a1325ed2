"""ctypes bindings for the native record codec.

`open_shard(prefix)` returns a `NativeShardReader` with the same mapping
semantics as the Python decoder in `bisinger_tpu.data.records` but with
mmap + zero-copy array views parsed in C++ (`record_codec.cc`). Arrays
are numpy views into the mmap (copy-on-write safe: the shard is opened
read-only and views are marked non-writeable); the reader keeps the
shard handle alive for as long as any view exists.

Build once per checkout:  python -m bisinger_tpu.native
Falls back (returns None from `load_library`) when the .so is absent —
callers keep the pure-Python path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Any, Dict, Optional

import numpy as np

_DIR = os.path.dirname(__file__)
_SO = os.path.join(_DIR, "librecord_codec.so")

_MAX_DIMS = 8
_MAX_FIELDS = 64


class _RCField(ctypes.Structure):
    _fields_ = [
        # c_void_p, NOT c_char_p: char_p auto-converts to bytes by
        # scanning for a NUL terminator — mmap'd keys are not
        # NUL-terminated, so the scan runs past the key (and, at a page
        # boundary, past the mapping). string_at(key, key_len) below
        # reads exactly key_len bytes.
        ("key", ctypes.c_void_p),
        ("key_len", ctypes.c_uint32),
        ("type", ctypes.c_uint8),
        ("dtype", ctypes.c_void_p),
        ("dtype_len", ctypes.c_uint32),
        ("ndim", ctypes.c_uint32),
        ("shape", ctypes.c_int64 * _MAX_DIMS),
        ("data", ctypes.c_void_p),
        ("data_len", ctypes.c_uint64),
        ("ival", ctypes.c_int64),
        ("fval", ctypes.c_double),
    ]


_lib = None


def build(force: bool = False) -> str:
    """Compile the shared library with make/g++."""
    if force or not os.path.exists(_SO):
        subprocess.run(["make", "-C", _DIR, "-s"], check=True)
    return _SO


def load_library(auto_build: bool = True):
    """-> ctypes CDLL or None when unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        if not auto_build:
            return None
        try:
            build()
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.rc_open.restype = ctypes.c_void_p
    lib.rc_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.rc_close.argtypes = [ctypes.c_void_p]
    lib.rc_len.restype = ctypes.c_int64
    lib.rc_len.argtypes = [ctypes.c_void_p]
    lib.rc_parse.restype = ctypes.c_int
    lib.rc_parse.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int64,
        ctypes.POINTER(_RCField),
        ctypes.c_int,
    ]
    _lib = lib
    return lib


class NativeShardReader:
    """Random-access reader over one `<prefix>.data/.idx` shard."""

    def __init__(self, prefix: str):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native record codec unavailable (build failed?)")
        self._lib = lib
        self._h = lib.rc_open(
            (prefix + ".data").encode(), (prefix + ".idx").encode()
        )
        if not self._h:
            raise IOError(f"cannot open shard {prefix!r}")
        self._fields = (_RCField * _MAX_FIELDS)()

    def __len__(self) -> int:
        return self._lib.rc_len(self._h)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        n = self._lib.rc_parse(self._h, idx, self._fields, _MAX_FIELDS)
        if n < 0:
            raise IOError(f"corrupt record {idx}")
        out: Dict[str, Any] = {}
        for i in range(n):
            f = self._fields[i]
            key = ctypes.string_at(f.key, f.key_len).decode("utf-8")
            t = f.type
            if t == 0:  # array
                dt = np.dtype(ctypes.string_at(f.dtype, f.dtype_len).decode("ascii"))
                shape = tuple(f.shape[j] for j in range(f.ndim))
                buf = (ctypes.c_char * f.data_len).from_address(f.data)
                arr = np.frombuffer(buf, dtype=dt)
                arr = arr.reshape(shape) if f.ndim else arr.reshape(())
                # copy out of the mmap: record dicts outlive the parse
                # buffer (and batching mutates/pads them anyway)
                out[key] = arr.copy()
            elif t == 1:
                out[key] = ctypes.string_at(f.data, f.data_len).decode("utf-8")
            elif t == 2:
                out[key] = int(f.ival)
            elif t == 3:
                out[key] = float(f.fval)
            elif t == 4:
                out[key] = ctypes.string_at(f.data, f.data_len)
            else:
                out[key] = None
        return out

    def close(self):
        if getattr(self, "_h", None):
            self._lib.rc_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def open_shard(prefix: str) -> Optional[NativeShardReader]:
    """-> reader, or None when the native library can't be used."""
    try:
        return NativeShardReader(prefix)
    except (RuntimeError, IOError):
        return None


if __name__ == "__main__":
    print(build(force=True))
