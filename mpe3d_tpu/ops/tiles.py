"""Shared tile-alignment helpers for the pallas kernels in this package.

One definition of the TPU lane/sublane rounding rule — the kernels
(fused_proj, quant_matmul, fused_mlp) all pad operands to the same
128-lane grid, and drift between private copies of the rule would corrupt
their shared operand contracts (e.g. models/mlp.py::prepad_quantized_lifter
pre-pads weights to what the kernels expect).
"""

from __future__ import annotations


def round_up(x: int, m: int) -> int:
    """Smallest multiple of ``m`` that is >= ``x``."""
    return (x + m - 1) // m * m
