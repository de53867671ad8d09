"""Native (C++) runtime helpers with transparent python fallback.

The reference leans on native code through its dependencies (DGL C++/CUDA
kernels, OpenCV; SURVEY.md §2b) while its own host loops are pure python.
Here the host-side hot loop — wire-format JSON parsing into dense buffers —
is a C++ shared library built lazily with g++ and bound via ctypes (no
pybind11 dependency).  ``parse_frames_native`` returns None when the library
is unavailable; callers fall back to the python parser.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import tempfile
from typing import List, Optional, Sequence, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "frameparse.cpp")
_LIB_NAME = "libmpe3dframe.so"
_lib = None
_tried = False


def _build_dir() -> str:
    d = os.environ.get("MPE3D_NATIVE_DIR")
    if d:
        return d
    return os.path.join(tempfile.gettempdir(), "mpe3d_native")


def load_library(rebuild: bool = False) -> Optional[ctypes.CDLL]:
    """Compile (once) and load the native library; None on any failure."""
    global _lib, _tried
    if _lib is not None and not rebuild:
        return _lib
    if _tried and not rebuild:
        return _lib
    _tried = True
    try:
        d = _build_dir()
        os.makedirs(d, exist_ok=True)
        lib_path = os.path.join(d, _LIB_NAME)
        if rebuild or not os.path.exists(lib_path) or (
                os.path.getmtime(lib_path) < os.path.getmtime(_SRC)):
            cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                   _SRC, "-o", lib_path]
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(lib_path)
        lib.mpe3d_parse_frames.restype = ctypes.c_int
        lib.mpe3d_parse_frames.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = lib
    except Exception as e:  # noqa: BLE001 — any failure → python fallback
        print(f"[mpe3d.native] build/load failed ({type(e).__name__}: {e}); "
              "using python parser", file=sys.stderr)
        _lib = None
    return _lib


def parse_frames_native(text: bytes, camera_names: Sequence[str],
                        max_skeletons: int, n_joints: int,
                        max_frames: Optional[int] = None
                        ) -> Optional[Tuple[np.ndarray, ...]]:
    """Batch-parse a whole wire JSON file into dense buffers.

    Returns (kp [F,C,S,J,2], valid, prob, in_view, present, timestamps) or
    None if the native library is unavailable or parsing failed.
    """
    lib = load_library()
    if lib is None:
        return None
    if isinstance(text, str):
        text = text.encode()
    C, S, J = len(camera_names), max_skeletons, n_joints
    # frames are at least ~2 bytes each ('{}'); generous upper bound
    F_cap = max_frames if max_frames is not None else max(len(text) // 4, 4)
    kp = np.zeros((F_cap, C, S, J, 2), np.float32)
    valid = np.zeros((F_cap, C, S, J), np.float32)
    prob = np.zeros((F_cap, C, S, J), np.float32)
    in_view = np.zeros((F_cap, C, S, J), np.uint8)
    present = np.zeros((F_cap, C, S), np.uint8)
    ts = np.zeros((F_cap, C), np.float64)
    names = (ctypes.c_char_p * C)(*[c.encode() for c in camera_names])
    n_out = ctypes.c_int64(0)
    rc = lib.mpe3d_parse_frames(text, len(text), names, C, S, J, F_cap,
                                kp, valid, prob, in_view, present, ts,
                                ctypes.byref(n_out))
    if rc != 0:
        print(f"[mpe3d.native] parse failed (rc={rc}); using python parser",
              file=sys.stderr)
        return None
    F = n_out.value
    return (kp[:F], valid[:F], prob[:F], in_view[:F].astype(bool),
            present[:F].astype(bool), ts[:F])
