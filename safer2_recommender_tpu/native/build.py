"""On-demand build + ctypes loading of the native IO library.

The reference ships its runtime as header-only C++ built by bazel
(reference bazel/frecsys.bzl:1-17); here the only host-side hot path worth
native code is CSV ingest (the compute path is XLA-compiled device code,
which *is* our native runtime). The .so is compiled once with g++ and
cached next to the source; loading falls back to None when no toolchain is
available, in which case callers use the pandas/numpy path.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

_log = logging.getLogger(__name__)
_lock = threading.Lock()
_lib = None
_tried = False

_SRC = os.path.join(os.path.dirname(__file__), "csv_reader.cc")
_SO = os.path.join(os.path.dirname(__file__), "libfrt_io.so")


def _compile() -> bool:
    # Compile to a process-unique temp name and publish with an atomic
    # rename: a concurrent process's staleness check must never dlopen
    # a half-written .so.
    tmp = f"{_SO}.{os.getpid()}.tmp"
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        "-o", tmp, _SRC, "-lpthread",
    ]
    try:
        res = subprocess.run(cmd, capture_output=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        _log.info("native IO build unavailable: %s", e)
        return False
    if res.returncode != 0:
        _log.warning("native IO build failed: %s", res.stderr.decode()[:500])
        return False
    try:
        os.replace(tmp, _SO)
    except OSError as e:
        _log.warning("native IO publish failed: %s", e)
        return False
    return True


def load():
    """Return the ctypes library handle or None."""
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            if not _compile():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError as e:
            _log.warning("native IO load failed: %s", e)
            return None
        lib.frt_csv_count.restype = ctypes.c_int64
        lib.frt_csv_count.argtypes = [ctypes.c_char_p]
        lib.frt_csv_read.restype = ctypes.c_int64
        lib.frt_csv_read.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
        ]
        _lib = lib
        return _lib
