"""ctypes wrapper around the C++ scalar golden coder.

Builds the shared library on first use (g++ -O3), caches it next to the
source, and exposes numpy-friendly ``encode`` / ``decode`` / ``step``.
This is the framework's native-runtime component standing in for the Rust
crate as the CPU conformance/throughput anchor (SURVEY.md §7 step 1).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

from ..errors import RangeCoderError, TableError, TruncatedStream, ZeroFrequency

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "scalar_coder.cc"
_LIB = _HERE / "libscalar_coder.so"
_LOCK = threading.Lock()
_lib: ctypes.CDLL | None = None

#: matches MAX_BYTES_PER_SYMBOL in core/rc64.py
_MAX_BYTES_PER_SYMBOL = 14

_ERRORS = {
    -2: TableError("total_freq is zero or alphabet empty"),
    -3: RangeCoderError("output capacity exceeded"),
    -4: ZeroFrequency("encoded a zero-frequency symbol"),
    -5: TruncatedStream("code stream truncated"),
}


def _build() -> None:
    cmd = [
        "g++",
        "-O3",
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-o",
        str(_LIB),
        str(_SRC),
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _load() -> ctypes.CDLL:
    global _lib
    with _LOCK:
        if _lib is not None:
            return _lib
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            _build()
        lib = ctypes.CDLL(str(_LIB))
        lib.rc_encode.restype = ctypes.c_int
        lib.rc_encode.argtypes = [
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_size_t),
        ]
        lib.rc_decode.restype = ctypes.c_int
        lib.rc_decode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_size_t,
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_uint32,
            ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_uint32),
        ]
        lib.rc_step.restype = ctypes.c_int
        lib.rc_step.argtypes = [
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_uint32,
            ctypes.c_uint32,
            ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int),
        ]
        _lib = lib
        return lib


def _check(rc: int) -> None:
    if rc != 0:
        raise _ERRORS.get(rc, RangeCoderError(f"native coder error {rc}"))


def _as_u32(a: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a), dtype=np.uint32)


def encode(syms: np.ndarray, c: np.ndarray, cum: np.ndarray, total: int) -> bytes:
    """Encode symbols with a static table; returns the full stream incl. flush."""
    lib = _load()
    syms = _as_u32(syms)
    c = _as_u32(c)
    cum = _as_u32(cum)
    n = syms.shape[0]
    cap = n * _MAX_BYTES_PER_SYMBOL + 8
    out = np.empty(cap, dtype=np.uint8)
    out_len = ctypes.c_size_t(0)
    _check(
        lib.rc_encode(
            syms.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            n,
            c.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            cum.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            int(total),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            cap,
            ctypes.byref(out_len),
        )
    )
    return out[: out_len.value].tobytes()


def decode(
    code: bytes | np.ndarray, n: int, c: np.ndarray, cum: np.ndarray, total: int
) -> np.ndarray:
    """Decode n symbols; returns uint32 symbol indices."""
    lib = _load()
    buf = np.frombuffer(bytes(code), dtype=np.uint8) if not isinstance(
        code, np.ndarray
    ) else np.ascontiguousarray(code, dtype=np.uint8)
    c = _as_u32(c)
    cum = _as_u32(cum)
    out = np.empty(n, dtype=np.uint32)
    _check(
        lib.rc_decode(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            buf.shape[0],
            n,
            c.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            cum.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            c.shape[0],
            int(total),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        )
    )
    return out


def step(
    low: int, range_: int, c: int, cum: int, total: int
) -> tuple[int, int, bytes]:
    """One param_update transition: returns (new_low, new_range, bytes)."""
    lib = _load()
    lo = ctypes.c_uint64(low)
    rg = ctypes.c_uint64(range_)
    buf = (ctypes.c_uint8 * 16)()
    nb = ctypes.c_int(0)
    _check(lib.rc_step(ctypes.byref(lo), ctypes.byref(rg), c, cum, total, buf,
                       ctypes.byref(nb)))
    return lo.value, rg.value, bytes(buf[: nb.value])


def is_available() -> bool:
    try:
        _load()
        return True
    except (OSError, subprocess.CalledProcessError):
        return False
