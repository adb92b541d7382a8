"""Build-on-demand loader for the native C++ library (ctypes).

Compiles native/src/*.cc into _dsdkit.so with g++ the first time it is
needed (or when sources are newer than the cached .so), then exposes a
typed wrapper. No pybind11 dependency — plain C ABI + ctypes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sysconfig
from pathlib import Path

import numpy as np

_SRC_DIR = Path(__file__).parent / "src"
_BUILD_DIR = Path(__file__).parent / "_build"
_SO_PATH = _BUILD_DIR / "_dsdkit.so"


def _needs_build() -> bool:
    if not _SO_PATH.exists():
        return True
    so_mtime = _SO_PATH.stat().st_mtime
    return any(p.stat().st_mtime > so_mtime for p in _SRC_DIR.glob("*.cc"))


def build() -> Path:
    sources = sorted(_SRC_DIR.glob("*.cc"))
    if not sources:
        raise FileNotFoundError("no native sources in native/src")
    _BUILD_DIR.mkdir(exist_ok=True)
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-fvisibility=hidden", "-o", str(_SO_PATH),
    ] + [str(s) for s in sources]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO_PATH


class NativeLib:
    """Typed wrapper over the C ABI. Functions are attached lazily as the
    native surface grows (see native/src/dsdkit.cc for the ABI)."""

    def __init__(self, dll: ctypes.CDLL):
        self._dll = dll
        self._setup()

    def _setup(self) -> None:
        d = self._dll
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")

        d.dsdkit_dsm2_bits.argtypes = [f64p, u8p, ctypes.c_size_t]
        d.dsdkit_dsm2_bits.restype = None

    def dsm2_bits(self, x: np.ndarray) -> np.ndarray:
        x = np.ascontiguousarray(x, dtype=np.float64)
        out = np.empty(x.shape[0], dtype=np.uint8)
        self._dll.dsdkit_dsm2_bits(x, out, x.shape[0])
        return out


def load() -> NativeLib | None:
    try:
        if _needs_build():
            build()
        return NativeLib(ctypes.CDLL(str(_SO_PATH)))
    except (subprocess.CalledProcessError, OSError, FileNotFoundError):
        return None
