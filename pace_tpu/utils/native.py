"""Build/load the native (C++) IO core and expose numpy-friendly wrappers.

The reference's performance-critical code is generated C++/CUDA plus one
hand-written C++ IO library (Serialbox, reference initialization.py:265-273).
Here the compute path is XLA/Pallas; this module is the hand-written native
piece: a multithreaded endian-swap + direct pread/pwrite engine behind the
self-contained NetCDF-3 codec (restart, diagnostics, savepoint ingestion),
where converting multi-GB big-endian payloads is the host-side bottleneck.

The library is compiled on demand with g++ (cached beside the source) and
loaded through ctypes; every caller must tolerate ``lib() is None`` and fall
back to numpy (single-threaded) semantics — behavior is identical either way.

Set ``PACE_TPU_DISABLE_NATIVE=1`` to force the numpy path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_native")
_SRC = os.path.join(_DIR, "nc3core.cpp")
_SO = os.path.join(_DIR, "libnc3core.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
        "-o", _SO, _SRC,
    ]
    try:
        res = subprocess.run(cmd, capture_output=True, timeout=120)
        return res.returncode == 0 and os.path.exists(_SO)
    except (OSError, subprocess.SubprocessError):
        return False


def lib():
    """The loaded ctypes library, or None if unavailable/disabled."""
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried:
        return None
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("PACE_TPU_DISABLE_NATIVE"):
            return None
        try:
            if (not os.path.exists(_SO)) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)
            ):
                if not _build():
                    return None
            l = ctypes.CDLL(_SO)
            l.pace_byteswap.restype = ctypes.c_int
            l.pace_byteswap.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_longlong, ctypes.c_int,
            ]
            l.pace_swap_write.restype = ctypes.c_longlong
            l.pace_swap_write.argtypes = [
                ctypes.c_int, ctypes.c_longlong, ctypes.c_void_p,
                ctypes.c_longlong, ctypes.c_int, ctypes.c_int,
            ]
            l.pace_swap_read.restype = ctypes.c_longlong
            l.pace_swap_read.argtypes = [
                ctypes.c_int, ctypes.c_longlong, ctypes.c_void_p,
                ctypes.c_longlong, ctypes.c_int, ctypes.c_int,
            ]
            _lib = l
        except OSError:
            _lib = None
        return _lib


def available() -> bool:
    return lib() is not None


def _needs_swap(dtype: np.dtype) -> bool:
    bo = dtype.byteorder
    if bo == "=" or dtype.itemsize == 1:
        return False
    little = np.dtype("<i4").byteorder in ("=", "<")
    return (bo == ">" and little) or (bo == "<" and not little)


def to_native_endian(arr: np.ndarray) -> np.ndarray:
    """Return ``arr`` in native byte order (parallel swap when possible)."""
    arr = np.asarray(arr)
    if not _needs_swap(arr.dtype):
        return arr
    l = lib()
    src = np.ascontiguousarray(arr)
    out = np.empty(src.shape, dtype=src.dtype.newbyteorder("="))
    if l is None:
        out[...] = src.astype(out.dtype)
        return out
    rc = l.pace_byteswap(
        out.ctypes.data, src.ctypes.data, src.size, src.dtype.itemsize
    )
    if rc != 0:
        return src.astype(out.dtype)
    return out


def swap_write(fd: int, offset: int, arr: np.ndarray, big_endian_dtype) -> int:
    """Write ``arr`` at byte ``offset`` of ``fd`` in ``big_endian_dtype``.

    Returns bytes written; raises OSError on failure. Falls back to numpy
    conversion + os.pwrite when the native library is unavailable.
    """
    want = np.dtype(big_endian_dtype)
    src = np.ascontiguousarray(arr, dtype=want.newbyteorder("="))
    l = lib()
    if l is None:
        payload = src.astype(want).tobytes()
        os.pwrite(fd, payload, offset)
        return len(payload)
    n = int(src.size)
    written = l.pace_swap_write(
        fd, offset, src.ctypes.data, n, want.itemsize,
        1 if _needs_swap(want) else 0,
    )
    if written < 0:
        raise OSError(f"pace_swap_write failed (fd={fd}, offset={offset})")
    return int(written)


def swap_read(fd: int, offset: int, count: int, big_endian_dtype) -> np.ndarray:
    """Read ``count`` elements of ``big_endian_dtype`` at ``offset``; return
    a native-endian array."""
    want = np.dtype(big_endian_dtype)
    out = np.empty(count, dtype=want.newbyteorder("="))
    l = lib()
    if l is None:
        raw = os.pread(fd, count * want.itemsize, offset)
        if len(raw) != count * want.itemsize:
            raise OSError("short read")
        out[...] = np.frombuffer(raw, dtype=want)
        return out
    got = l.pace_swap_read(
        fd, offset, out.ctypes.data, count, want.itemsize,
        1 if _needs_swap(want) else 0,
    )
    if got < 0:
        raise OSError(f"pace_swap_read failed (fd={fd}, offset={offset})")
    return out
