"""Utilities: structured logging, numerics guards, profiling."""

from mpe3d_tpu.utils.logging import (JsonlLogger,  # noqa: F401
                                     enable_nan_debugging, profiler_trace)
