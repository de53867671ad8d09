"""Native (C++) runtime helpers with transparent python fallback.

The reference leans on native code through its dependencies (DGL C++/CUDA
kernels, OpenCV; SURVEY.md §2b) while its own host loops are pure python.
Here the host-side hot loop — wire-format JSON parsing into dense buffers —
is a C++ shared library built lazily with g++ and bound via ctypes (no
pybind11 dependency).  ``parse_frames_native`` returns None when the library
is unavailable; callers fall back to the python parser.

Allocation is exact: a cheap native counting pass (``mpe3d_count_frames``)
sizes the [F, ...] buffers before the parse, so arbitrarily large
recordings parse in O(file size) memory (round-1 fix: the old
``len(text)//4`` frame cap allocated ~3800× the input size).
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
_LIB_NAME = "libmpe3dframe2.so"
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
            # Build to a per-process temp name and os.replace() into place:
            # concurrent cold-start processes (the relay_chain orchestrators
            # spawn several) must never CDLL a half-written .so.
            tmp_path = f"{lib_path}.tmp.{os.getpid()}"
            cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                   _SRC, "-o", tmp_path]
            try:
                subprocess.run(cmd, check=True, capture_output=True,
                               timeout=120)
                os.replace(tmp_path, lib_path)
            finally:
                if os.path.exists(tmp_path):
                    os.unlink(tmp_path)
        lib = ctypes.CDLL(lib_path)
        lib.mpe3d_count_frames.restype = ctypes.c_int64
        lib.mpe3d_count_frames.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.mpe3d_parse_frames_v3.restype = ctypes.c_int
        lib.mpe3d_parse_frames_v3.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int64,
            f32, f32, f32, u8, u8,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.mpe3d_format_result.restype = ctypes.c_int64
        lib.mpe3d_format_result.argtypes = [
            ctypes.c_int64, ctypes.c_int64,
            f32, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_double, ctypes.c_char_p, ctypes.c_int64,
        ]
        _lib = lib
    except Exception as e:  # noqa: BLE001 — any failure → python fallback
        print(f"[mpe3d.native] build/load failed ({type(e).__name__}: {e}); "
              "using python parser", file=sys.stderr)
        _lib = None
    return _lib


def count_frames_native(text: bytes) -> Optional[int]:
    """Exact top-level frame count (None if the library is unavailable)."""
    lib = load_library()
    if lib is None:
        return None
    if isinstance(text, str):
        text = text.encode()
    n = lib.mpe3d_count_frames(text, len(text))
    return None if n < 0 else int(n)


def format_result_native(seq: int, poses: np.ndarray,
                         quality: Optional[np.ndarray] = None,
                         track_ids: Optional[np.ndarray] = None,
                         dropped: int = 0,
                         latency_ms: float = 0.0) -> Optional[str]:
    """Serve-response line via the C++ serializer (serve.py::_collect's
    dict layout: poses 4 decimals, quality 2, latency 3).  Returns the
    full line incl. trailing newline, or None when the library is
    unavailable or any value is non-finite (caller falls back to
    json.dumps)."""
    lib = load_library()
    if lib is None:
        return None
    poses = np.ascontiguousarray(poses, np.float32)
    P = int(poses.shape[0])
    J = int(poses.shape[1]) if poses.ndim == 3 else 0
    q_buf = (np.ascontiguousarray(quality, np.float32)
             if quality is not None else None)
    t_buf = (np.ascontiguousarray(track_ids, np.int32)
             if track_ids is not None else None)
    cap = 128 + P * 48 + P * J * 3 * 16
    out = ctypes.create_string_buffer(cap)
    n = lib.mpe3d_format_result(
        seq, dropped, poses, P, J,
        q_buf.ctypes.data if q_buf is not None else None,
        t_buf.ctypes.data if t_buf is not None else None,
        float(latency_ms), out, cap)
    if n <= 0:
        return None
    return out.raw[:n].decode()


def parse_frames_native(text: bytes, camera_names: Sequence[str],
                        max_skeletons: int, n_joints: int,
                        max_frames: Optional[int] = None,
                        with_gt: bool = False, max_gt_persons: int = 16
                        ) -> Optional[Tuple[np.ndarray, ...]]:
    """Batch-parse a whole wire JSON file into dense buffers.

    Returns (kp [F,C,S,J,2], valid, prob, in_view, present, timestamps)
    — plus (gt [F,C,P,J,3] in raw wire cm, gt_valid [F,C,P,J],
    gt_pvalid [F,C,P], gt_count [F,C] with -1 = camera entry had no GT
    list, gt_order [F,C] = the camera key's file-order position in the
    frame with -1 = camera absent) when ``with_gt`` — or None if the
    native library is unavailable or parsing failed.
    """
    lib = load_library()
    if lib is None:
        return None
    if isinstance(text, str):
        text = text.encode()
    C, S, J = len(camera_names), max_skeletons, n_joints
    if max_frames is not None:
        F_cap = max_frames
    else:
        n = lib.mpe3d_count_frames(text, len(text))
        if n < 0:
            print("[mpe3d.native] count failed; using python parser",
                  file=sys.stderr)
            return None
        F_cap = max(int(n), 1)
    kp = np.zeros((F_cap, C, S, J, 2), np.float32)
    valid = np.zeros((F_cap, C, S, J), np.float32)
    prob = np.zeros((F_cap, C, S, J), np.float32)
    in_view = np.zeros((F_cap, C, S, J), np.uint8)
    present = np.zeros((F_cap, C, S), np.uint8)
    ts = np.zeros((F_cap, C), np.float64)
    if with_gt:
        P = max_gt_persons
        gt = np.zeros((F_cap, C, P, J, 3), np.float32)
        gt_valid = np.zeros((F_cap, C, P, J), np.uint8)
        gt_pvalid = np.zeros((F_cap, C, P), np.uint8)
        gt_count = np.full((F_cap, C), -1, np.int32)
        gt_order = np.full((F_cap, C), -1, np.int32)
        gt_args = (gt.ctypes.data, gt_valid.ctypes.data,
                   gt_pvalid.ctypes.data, gt_count.ctypes.data,
                   gt_order.ctypes.data, P)
    else:
        gt_args = (None, None, None, None, None, 0)
    names = (ctypes.c_char_p * C)(*[c.encode() for c in camera_names])
    n_out = ctypes.c_int64(0)
    rc = lib.mpe3d_parse_frames_v3(text, len(text), names, C, S, J, F_cap,
                                   kp, valid, prob, in_view, present, ts,
                                   *gt_args, ctypes.byref(n_out))
    if rc != 0:
        print(f"[mpe3d.native] parse failed (rc={rc}); using python parser",
              file=sys.stderr)
        return None
    F = n_out.value
    out = (kp[:F], valid[:F], prob[:F], in_view[:F].astype(bool),
           present[:F].astype(bool), ts[:F])
    if with_gt:
        out = out + (gt[:F], gt_valid[:F].astype(bool),
                     gt_pvalid[:F].astype(bool), gt_count[:F],
                     gt_order[:F])
    return out
