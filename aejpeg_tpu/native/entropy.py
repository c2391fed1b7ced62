"""ctypes bindings for the C++ entropy backend (see entropy.cpp).

deflate_parallel(data, level, threads) -> bytes: one spec-valid zlib stream
built from independently-deflated chunks (Z_FULL_FLUSH splicing).  With
threads=1 and chunk >= len it is byte-identical to zlib.compress(level).
"""

import ctypes
import os
import subprocess
import threading
import zlib
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libaejentropy.so")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

DEFAULT_CHUNK = 1 << 20  # 1 MiB chunks: ~0.1% ratio loss, good parallelism


def build_native() -> bool:
    src = os.path.join(_DIR, "entropy.cpp")
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src,
           "-o", _SO, "-lz", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        src = os.path.join(_DIR, "entropy.cpp")
        stale = (not os.path.exists(_SO)
                 or (os.path.exists(src)
                     and os.path.getmtime(src) > os.path.getmtime(_SO)))
        if stale and not build_native() and not os.path.exists(_SO):
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.aej_deflate_parallel.restype = ctypes.c_size_t
        lib.aej_deflate_parallel.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p,
            ctypes.c_size_t, ctypes.c_int, ctypes.c_int, ctypes.c_size_t]
        lib.aej_inflate.restype = ctypes.c_size_t
        lib.aej_inflate.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                    ctypes.c_void_p, ctypes.c_size_t]
        lib.aej_deflate_bound.restype = ctypes.c_size_t
        lib.aej_deflate_bound.argtypes = [ctypes.c_size_t, ctypes.c_size_t]
        lib.aej_replay_states.restype = ctypes.c_size_t
        lib.aej_replay_states.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p]
        lib.aej_build_plan.restype = ctypes.c_size_t
        lib.aej_build_plan.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p]
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return _load() is not None


def deflate_parallel(data: bytes, level: int = 9,
                     threads: Optional[int] = None,
                     chunk_size: int = DEFAULT_CHUNK) -> bytes:
    """Compress to one zlib stream using the native thread pool; falls back
    to zlib.compress if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return zlib.compress(data, level=level)
    if threads is None:
        threads = os.cpu_count() or 1
    bound = lib.aej_deflate_bound(len(data), chunk_size)
    out = ctypes.create_string_buffer(bound)
    n = lib.aej_deflate_parallel(data, len(data), out, bound, level,
                                 threads, chunk_size)
    if n == 0:
        return zlib.compress(data, level=level)
    return out.raw[:n]


def inflate(data: bytes, max_out: int) -> bytes:
    lib = _load()
    if lib is None:
        return zlib.decompress(data)
    out = ctypes.create_string_buffer(max_out)
    n = lib.aej_inflate(data, len(data), out, max_out)
    if n == 0:
        return zlib.decompress(data)
    return out.raw[:n]


def replay_states(states, root_size: int):
    """Preorder stack replay of quadtree states -> (sizes, ys, xs) int32
    arrays, or None if the native library is unavailable (callers fall back
    to the Python replay)."""
    import numpy as np
    lib = _load()
    if lib is None:
        return None
    st = np.ascontiguousarray(states, dtype=np.uint8)
    n = st.size
    sizes = np.empty(n, np.int32)
    ys = np.empty(n, np.int32)
    xs = np.empty(n, np.int32)
    m = lib.aej_replay_states(st.tobytes(), n, root_size,
                              sizes.ctypes.data_as(ctypes.c_void_p),
                              ys.ctypes.data_as(ctypes.c_void_p),
                              xs.ctypes.data_as(ctypes.c_void_p))
    return sizes[:m], ys[:m], xs[:m]


def build_plan(levels_concat, level_offsets, k_lo: int, k_hi: int,
               root_size: int, h: int, w: int, max_size: int,
               min_size: int):
    """Native preorder quadtree plan from pooled has-edge masks.  Returns
    (states, sizes, ys, xs) int arrays or None when unavailable."""
    import numpy as np
    lib = _load()
    if lib is None:
        return None
    lv = np.ascontiguousarray(levels_concat, dtype=np.uint8)
    offs = np.ascontiguousarray(level_offsets, dtype=np.int64)
    # visited nodes <= 4/3 * (root/min)^2 + depth slack
    kmin = max(min_size.bit_length() - 1, 0)
    g_min = max(root_size >> kmin, 1)
    cap = (4 * g_min * g_min) // 3 + 64
    states = np.empty(cap, np.uint8)
    sizes = np.empty(cap, np.int32)
    ys = np.empty(cap, np.int32)
    xs = np.empty(cap, np.int32)
    n_states = ctypes.c_size_t(0)
    nl = lib.aej_build_plan(
        lv.ctypes.data_as(ctypes.c_void_p),
        offs.ctypes.data_as(ctypes.c_void_p),
        k_lo, k_hi, root_size, h, w, max_size, min_size,
        states.ctypes.data_as(ctypes.c_void_p),
        sizes.ctypes.data_as(ctypes.c_void_p),
        ys.ctypes.data_as(ctypes.c_void_p),
        xs.ctypes.data_as(ctypes.c_void_p),
        ctypes.byref(n_states))
    return (states[:n_states.value].copy(), sizes[:nl].copy(),
            ys[:nl].copy(), xs[:nl].copy())
