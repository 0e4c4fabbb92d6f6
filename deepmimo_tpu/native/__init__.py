"""Native (C++) accelerators, loaded via ctypes.

Currently: a fast .paths.p2m parser (the converter's hot CPU loop). The
shared library is compiled on first use with g++ (no pip/pybind needed);
if the toolchain is unavailable the callers fall back to pure Python.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "p2m_parser.cpp")
_LIB = os.path.join(_DIR, "libp2m_parser.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
           "-o", _LIB, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:
        print(f"[deepmimo_tpu.native] p2m parser build failed: {e}; "
              "falling back to the Python parser")
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB) or \
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError as e:
            print(f"[deepmimo_tpu.native] load failed: {e}")
            _build_failed = True
            return None
        lib.p2m_count_rxs.argtypes = [ctypes.c_char_p]
        lib.p2m_count_rxs.restype = ctypes.c_int
        fptr = ctypes.POINTER(ctypes.c_float)
        lib.p2m_parse_paths.argtypes = [ctypes.c_char_p] + \
            [ctypes.c_int] * 3 + [fptr] * 9
        lib.p2m_parse_paths.restype = ctypes.c_int
        _lib = lib
        return _lib


class p2m_native:
    """Namespace wrapper used by the converter."""

    @staticmethod
    def available() -> bool:
        return _load() is not None

    @staticmethod
    def parse_paths(path: str, max_paths: int,
                    max_inter: int) -> Optional[Dict[str, np.ndarray]]:
        from .. import consts as c

        lib = _load()
        if lib is None:
            return None
        n_rxs = lib.p2m_count_rxs(path.encode())
        if n_rxs < 0:
            return None

        def buf(shape):
            return np.full(shape, np.nan, dtype=np.float32)

        mats = {key: buf((n_rxs, max_paths)) for key in (
            c.POWER_PARAM_NAME, c.PHASE_PARAM_NAME, c.DELAY_PARAM_NAME,
            c.AOA_EL_PARAM_NAME, c.AOA_AZ_PARAM_NAME,
            c.AOD_EL_PARAM_NAME, c.AOD_AZ_PARAM_NAME,
            c.INTERACTIONS_PARAM_NAME)}
        inter_pos = buf((n_rxs, max_paths, max_inter, 3))

        def ptr(arr):
            return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))

        rc = lib.p2m_parse_paths(
            path.encode(), n_rxs, max_paths, max_inter,
            ptr(mats[c.POWER_PARAM_NAME]), ptr(mats[c.PHASE_PARAM_NAME]),
            ptr(mats[c.DELAY_PARAM_NAME]),
            ptr(mats[c.AOA_EL_PARAM_NAME]), ptr(mats[c.AOA_AZ_PARAM_NAME]),
            ptr(mats[c.AOD_EL_PARAM_NAME]), ptr(mats[c.AOD_AZ_PARAM_NAME]),
            ptr(mats[c.INTERACTIONS_PARAM_NAME]), ptr(inter_pos))
        if rc != 0:
            print(f"[deepmimo_tpu.native] p2m parse error {rc}; "
                  "falling back to Python parser")
            return None
        mats[c.INTERACTIONS_POS_PARAM_NAME] = inter_pos
        return mats
