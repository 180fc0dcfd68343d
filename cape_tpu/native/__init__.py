"""Native (C++) host-pipeline kernels, compiled on demand.

The reference's host augmentation stack is native end-to-end
(albumentations -> cv2/C++, `datasets/mp100_cape.py:898-946`); cape_tpu's
numpy port of the fused brightness/contrast/saturation jitter was the one
remaining pure-Python hot op (~16 ms/record at MP-100 crop sizes — the
largest warm-path host cost). `hostops.cpp` replaces it with a single-pass
C++ kernel called via ctypes (which drops the GIL, so loader threads
overlap on multi-core TPU-VM hosts).

Build strategy: no build-system dependency — on first import we compile
`hostops.cpp` with plain `g++ -O3 -fPIC -shared` into a source-hash-named
shared object next to this file (falling back to a per-user cache dir when
the package is installed read-only). Any failure (no g++, sandboxed FS,
bad toolchain) silently degrades to the numpy implementation; set
`CAPE_NATIVE=0` to force the numpy path, `CAPE_NATIVE_DEBUG=1` to print
why a build failed.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import tempfile
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "hostops.cpp")
_ABI_VERSION = 1

_lib = None
_tried = False


def _debug(msg: str) -> None:
    if os.environ.get("CAPE_NATIVE_DEBUG"):
        print(f"[cape_tpu.native] {msg}", file=sys.stderr)


def _candidate_build_dirs():
    yield os.path.dirname(_SRC)
    yield os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "cape_tpu",
    )
    yield os.path.join(tempfile.gettempdir(), "cape_tpu_native")


def _build() -> Optional[str]:
    """Compile hostops.cpp; returns the .so path or None."""
    with open(_SRC, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    name = f"hostops_{tag}.so"
    for d in _candidate_build_dirs():
        so = os.path.join(d, name)
        if os.path.exists(so):
            return so
        try:
            os.makedirs(d, exist_ok=True)
            # write via temp + rename: concurrent importers race benignly
            tmp = os.path.join(d, f".{name}.{os.getpid()}.tmp")
            cmd = [
                "g++", "-O3", "-march=native", "-fPIC", "-shared",
                _SRC, "-o", tmp,
            ]
            res = subprocess.run(cmd, capture_output=True, timeout=120)
            if res.returncode != 0:
                _debug(f"g++ failed in {d}: {res.stderr.decode()[:400]}")
                continue
            os.replace(tmp, so)
            return so
        except Exception as e:  # noqa: BLE001 - any failure => fallback
            _debug(f"build in {d} failed: {e!r}")
            continue
    return None


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("CAPE_NATIVE", "1") == "0":
        _debug("disabled via CAPE_NATIVE=0")
        return None
    so = _build()
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(so)
        if lib.cape_hostops_version() != _ABI_VERSION:
            _debug(f"stale ABI in {so}")
            return None
        lib.cape_fused_bcs.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.c_float,
            ctypes.c_float,
            ctypes.c_float,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.cape_fused_bcs.restype = None
        _lib = lib
    except Exception as e:  # noqa: BLE001
        _debug(f"dlopen failed: {e!r}")
        _lib = None
    return _lib


def available() -> bool:
    """True when the native library is built and loadable."""
    return _load() is not None


def fused_bcs(img: np.ndarray, b: float, c: float, s: float) -> Optional[np.ndarray]:
    """Native fused brightness/contrast/saturation jitter.

    Args:
        img: (H, W, 3) uint8, C-contiguous.
    Returns:
        (H, W, 3) uint8, or None when the native path is unavailable (the
        caller falls back to the numpy implementation).
    """
    lib = _load()
    if lib is None:
        return None
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] != 3:
        return None
    img = np.ascontiguousarray(img)
    out = np.empty_like(img)
    n = img.shape[0] * img.shape[1]
    lib.cape_fused_bcs(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(n),
        ctypes.c_float(b),
        ctypes.c_float(c),
        ctypes.c_float(s),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out
