"""ctypes loader for the native C++ helpers (native/accum_native.cpp).

Builds the shared library on first use (g++, no external deps) and exposes:
  * mont_mul / add_mod / sub_mod — reference 256-bit field ops (golden-vector
    source for the device kernels);
  * limbs_to_bytes / bytes_to_limbs — bulk codec conversions.

Every entry point has a pure-python fallback, so the framework works without
a compiler; `available()` reports whether the native path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LIB = None
_LOCK = threading.Lock()
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "accum_native.cpp")
_OUT = os.path.join(_REPO_ROOT, "native", "libaccum_native.so")


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if not os.path.exists(_OUT) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_OUT)):
            if not os.path.exists(_SRC):
                _LIB = False
                return _LIB
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _OUT, _SRC],
                    check=True, capture_output=True)
            except Exception:
                _LIB = False
                return _LIB
        try:
            lib = ctypes.CDLL(_OUT)
        except OSError:
            _LIB = False
            return _LIB
        u64p = ctypes.POINTER(ctypes.c_uint64)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.mont_mul_batch.argtypes = [u64p, u64p, u64p, ctypes.c_uint64,
                                       u64p, ctypes.c_int64]
        lib.add_mod_batch.argtypes = [u64p, u64p, u64p, u64p, ctypes.c_int64]
        lib.sub_mod_batch.argtypes = [u64p, u64p, u64p, u64p, ctypes.c_int64]
        lib.limbs16_to_bytes.argtypes = [u32p, u8p, ctypes.c_int64]
        lib.bytes_to_limbs16.argtypes = [u8p, u32p, ctypes.c_int64]
        _LIB = lib
        return _LIB


def available() -> bool:
    return bool(_load())


def _u64_limbs(x: int) -> np.ndarray:
    return np.array([(x >> (64 * i)) & ((1 << 64) - 1) for i in range(4)],
                    dtype=np.uint64)


def _from_u64(a: np.ndarray) -> int:
    return sum(int(a[i]) << (64 * i) for i in range(4))


def mont_mul(modulus: int, a_ints, b_ints):
    """Batched Montgomery product of canonical ints (R = 2^256).

    Returns list of ints: (a_i * b_i * R^{-1}) mod p.  Golden-vector helper.
    """
    lib = _load()
    n = len(a_ints)
    p_arr = _u64_limbs(modulus)
    pinv = (-pow(modulus, -1, 1 << 64)) % (1 << 64)
    if not lib:
        rinv = pow(1 << 256, -1, modulus)
        return [a * b * rinv % modulus for a, b in zip(a_ints, b_ints)]
    a_arr = np.concatenate([_u64_limbs(x) for x in a_ints])
    b_arr = np.concatenate([_u64_limbs(x) for x in b_ints])
    out = np.zeros(4 * n, dtype=np.uint64)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.mont_mul_batch(
        a_arr.ctypes.data_as(u64p), b_arr.ctypes.data_as(u64p),
        p_arr.ctypes.data_as(u64p), ctypes.c_uint64(pinv),
        out.ctypes.data_as(u64p), n)
    return [_from_u64(out[4 * i:4 * i + 4]) for i in range(n)]


def limbs_to_bytes(canon: np.ndarray) -> np.ndarray:
    lib = _load()
    n = canon.shape[0]
    if not lib:
        return canon.astype(np.uint16).view(np.uint8).reshape(n, 32)
    src = np.ascontiguousarray(canon, dtype=np.uint32)
    out = np.zeros((n, 32), dtype=np.uint8)
    lib.limbs16_to_bytes(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n)
    return out


def bytes_to_limbs(data: np.ndarray) -> np.ndarray:
    lib = _load()
    n = data.shape[0]
    if not lib:
        return np.ascontiguousarray(data, np.uint8).view(np.uint16) \
            .reshape(n, 16).astype(np.uint32)
    src = np.ascontiguousarray(data, dtype=np.uint8)
    out = np.zeros((n, 16), dtype=np.uint32)
    lib.bytes_to_limbs16(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), n)
    return out
