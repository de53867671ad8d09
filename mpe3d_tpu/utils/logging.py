"""Structured logging + numerics guards (SURVEY.md §5 observability plan).

The reference logs with bare prints (train_skeleton_matching.py:193-219,
train_pose_estimator.py:229-261).  Here: a JSONL step logger (one record per
event, machine-readable) that also mirrors human-readable summaries to
stdout, plus helpers for NaN debugging and jax profiler traces.
"""

from __future__ import annotations

import json
import os
import sys
import time
from contextlib import contextmanager
from typing import Any, Dict, Optional


class JsonlLogger:
    """Append-only JSONL event log with stdout mirroring.

    >>> log = JsonlLogger("runs/lifter.jsonl", run="lifter-v1")
    >>> log.event("train_step", epoch=3, loss=0.5)
    """

    def __init__(self, path: Optional[str] = None, echo: bool = True,
                 **run_fields: Any):
        self.path = path
        self.echo = echo
        self.run_fields = run_fields
        self._t0 = time.time()
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)) or ".",
                        exist_ok=True)
            self._f = open(path, "a", buffering=1)
        else:
            self._f = None

    def event(self, kind: str, **fields: Any) -> None:
        rec = {"t": round(time.time() - self._t0, 3), "kind": kind,
               **self.run_fields, **fields}
        if self._f:
            self._f.write(json.dumps(rec, default=float) + "\n")
        if self.echo:
            body = " ".join(f"{k}={_fmt(v)}" for k, v in fields.items())
            print(f"[{kind}] {body}", file=sys.stdout)

    def __call__(self, message: str) -> None:
        """Drop-in for the trainers' ``log=print`` callbacks."""
        self.event("log", message=message)

    def close(self) -> None:
        if self._f:
            self._f.close()


def _fmt(v: Any) -> str:
    if isinstance(v, float):
        return f"{v:.6g}"
    return str(v)


def enable_nan_debugging() -> None:
    """Dev-mode numerics guard: jit programs raise on NaN (SURVEY.md §5 —
    the TPU-native stand-in for the reference's crash-and-inspect flow)."""
    import jax

    jax.config.update("jax_debug_nans", True)


@contextmanager
def profiler_trace(log_dir: str):
    """Capture a jax profiler trace (TensorBoard-compatible) around a block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
