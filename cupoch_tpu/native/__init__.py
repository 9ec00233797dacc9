"""Native (C) helpers loaded via ctypes.

reference rationale: cupoch's IO path is native C++ (SURVEY.md 2.9);
the LZF codec used by PCD binary_compressed files
(io/file_pcd.cu:218,436-454 + vendored third_party/liblzf) is
implemented here as a small C library compiled on first use with the
system compiler, with a pure-numpy decompress fallback when no
compiler is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "lzf.c")
_LIB_PATH = os.path.join(_HERE, "_liblzf.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    for cc in ("cc", "gcc", "clang"):
        try:
            subprocess.run(
                [cc, "-O3", "-fPIC", "-shared", "-o", _LIB_PATH, _SRC],
                check=True, capture_output=True, timeout=120)
            return True
        except (FileNotFoundError, subprocess.CalledProcessError,
                subprocess.TimeoutExpired):
            continue
    return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    for fn in (lib.lzf_compress, lib.lzf_decompress):
        fn.restype = ctypes.c_long
        fn.argtypes = [ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
                       ctypes.POINTER(ctypes.c_uint8), ctypes.c_long]
    _lib = lib
    return _lib


def _py_decompress(data: bytes, expected_size: int) -> bytes:
    """Pure-python LZF decode fallback (slow; used only without a C
    compiler)."""
    out = bytearray(expected_size)
    ip, op, n = 0, 0, len(data)
    while ip < n:
        ctrl = data[ip]
        ip += 1
        if ctrl < 32:
            cnt = ctrl + 1
            out[op:op + cnt] = data[ip:ip + cnt]
            ip += cnt
            op += cnt
        else:
            length = ctrl >> 5
            if length == 7:
                length += data[ip]
                ip += 1
            ref = op - (((ctrl & 0x1F) << 8) + data[ip]) - 1
            ip += 1
            length += 2
            for _ in range(length):
                out[op] = out[ref]
                op += 1
                ref += 1
    return bytes(out[:op])


def lzf_decompress(data: bytes, expected_size: int) -> bytes:
    lib = _load()
    if lib is None:
        return _py_decompress(data, expected_size)
    src = np.frombuffer(data, np.uint8)
    dst = np.empty(expected_size, np.uint8)
    n = lib.lzf_decompress(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), expected_size)
    if n == 0:
        raise ValueError("lzf_decompress: malformed input")
    return dst[:n].tobytes()


def lzf_compress(data: bytes) -> Optional[bytes]:
    """Returns compressed bytes, or None if the data is incompressible
    (callers should then store raw, like the PCD spec allows)."""
    lib = _load()
    if lib is None:
        return None
    src = np.frombuffer(data, np.uint8)
    cap = max(64, int(len(data) * 1.04) + 16)
    dst = np.empty(cap, np.uint8)
    n = lib.lzf_compress(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
    if n == 0 or n >= len(data):
        return None
    return dst[:n].tobytes()
