"""Custom kernels: Pallas TPU implementations with XLA fallbacks."""

from mpe3d_tpu.ops.fused_proj import fused_linear_leaky_linear, xla_proj  # noqa: F401
