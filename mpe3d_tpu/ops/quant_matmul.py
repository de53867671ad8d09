"""Pallas TPU kernel: int8 weight-only matmul for memory-bound serving.

The lifter's inference matmuls are extremely skinny (rows = persons per
frame, ≤16) — the MXU is idle waiting on the weight stream, so frame
latency is set by HBM bytes read per layer (measured: bf16 weight serving
already halved on-device frame time vs fp32; CLAUDE.md).  This kernel
halves the stream again: weights live in HBM as int8 with fp32 scale
vectors, tiles are DMA'd to VMEM by the pallas pipeline and dequantised
*on chip* (int8→bf16 is exact for |q| ≤ 127: bf16 has an 8-bit mantissa),
so the bf16 weight matrix never exists in HBM.

Math (both paths, bit-comparable; two-sided quantisation, see
models/mlp.py::quantize_lifter_weights for the scheme and the measured
accuracy rationale):

    out = ((x·rscale)_bf16 @ wq_bf16, fp32 accum) * scale [+ b] [leaky_relu]

The per-channel scale is applied AFTER accumulation and the per-row scale
folds into the (tiny) activation in fp32 — exact algebra, full int8
resolution on the MXU operands.  Quantisation error is therefore weight
rounding only; activations keep the existing bf16 serving precision
(models/mlp.py::apply_lifter compute_dtype).

No reference counterpart (the reference serves fp32 torch weights,
utils/mlp.py:3-31); this is a TPU-serving extension, opt-in via
``PoseEstimationPipeline(serve_dtype="int8")``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

N_TILE = 512     # output-channel tile: wq tile 3072x512 int8 = 1.5 MB VMEM
M_TILE = 16      # bf16 sublane minimum; persons-per-frame buckets are <= 16


from mpe3d_tpu.ops.tiles import round_up as _round_up


def xla_int8_matmul(x: jnp.ndarray, wq: jnp.ndarray, scale: jnp.ndarray,
                    b: Optional[jnp.ndarray], alpha: Optional[float],
                    rscale: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Reference path (CPU / non-pallas): identical math via plain XLA.

    Serves two roles: the correctness oracle for the kernel, and the
    off-TPU emulation used to *measure* int8 accuracy without a chip —
    same bf16 operands, fp32 accumulation, post-scale.
    """
    if rscale is not None:
        x = x.astype(jnp.float32) * rscale   # fold row scales, fp32
    if wq.shape[0] != x.shape[-1]:
        # models/mlp.py::prepad_quantized_lifter K-aligns served weights
        # to 128 lanes (zero rows); mirror it on the tiny activation so
        # this oracle accepts the same trees the pallas path serves
        pad = wq.shape[0] - x.shape[-1]
        x = jnp.concatenate(
            [x, jnp.zeros((*x.shape[:-1], pad), x.dtype)], axis=-1)
    acc = jnp.dot(x.astype(jnp.bfloat16), wq.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    out = acc * scale
    if b is not None:
        out = out + b
    if alpha is not None:
        out = jnp.where(out > 0, out, alpha * out)
    return out


@functools.partial(jax.jit, static_argnames=("alpha", "interpret"))
def _pallas_int8_matmul(x, wq, scale, b, alpha: Optional[float],
                        interpret: bool = False):
    """Padded operands: x [Mp, Kp] bf16, wq [Kp, Np] int8,
    scale/b [1, Np] fp32; Mp mult of 16, Kp/Np mult of 128."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Mp, Kp = x.shape
    Np = wq.shape[1]
    # largest tile <= N_TILE that divides Np (Np is a multiple of 128)
    n_tile = next(t for t in (N_TILE, 384, 256, 128) if Np % t == 0)

    def kernel(x_ref, wq_ref, scale_ref, b_ref, o_ref):
        w = wq_ref[:].astype(jnp.bfloat16)          # exact: |q| <= 127
        acc = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
        out = acc * scale_ref[:] + b_ref[:]
        if alpha is not None:
            out = jnp.where(out > 0, out, alpha * out)
        o_ref[:] = out

    vmem = {} if interpret else {"memory_space": pltpu.VMEM}
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Mp, Np), jnp.float32),
        grid=(Np // n_tile,),
        in_specs=[
            pl.BlockSpec((Mp, Kp), lambda i: (0, 0), **vmem),
            pl.BlockSpec((Kp, n_tile), lambda i: (0, i), **vmem),
            pl.BlockSpec((1, n_tile), lambda i: (0, i), **vmem),
            pl.BlockSpec((1, n_tile), lambda i: (0, i), **vmem),
        ],
        out_specs=pl.BlockSpec((Mp, n_tile), lambda i: (0, i), **vmem),
        interpret=interpret,
    )(x, wq, scale, b)


def int8_weight_matmul(x: jnp.ndarray, wq: jnp.ndarray, scale: jnp.ndarray,
                       b: Optional[jnp.ndarray] = None,
                       alpha: Optional[float] = None,
                       rscale: Optional[jnp.ndarray] = None,
                       use_pallas: Optional[bool] = None,
                       interpret: bool = False) -> jnp.ndarray:
    """out = leaky_relu(((x·rscale) @ wq) * scale + b)  — activation applied
    only when ``alpha`` is given.

    x: [..., K] (cast to bf16); wq: [K, N] int8; scale: [N] fp32 per-output-
    channel; rscale: [K] fp32 per-input-row (two-sided quantisation, folded
    into the activation in fp32) or None; b: [N] fp32 or None.
    ``use_pallas=None`` auto-selects the kernel on TPU backends.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu" and not interpret
    if not (use_pallas or interpret):
        return xla_int8_matmul(x, wq, scale, b, alpha, rscale)

    lead = x.shape[:-1]
    K = x.shape[-1]
    N = wq.shape[1]
    if rscale is not None:
        x = x.astype(jnp.float32) * rscale   # tiny [M, K] elementwise
    x2 = x.reshape(-1, K)
    M = x2.shape[0]
    Mp, Kp, Npad = _round_up(max(M, 1), M_TILE), _round_up(K, 128), \
        _round_up(N, 128)
    # pad ONLY when a dim is misaligned: `zeros().at[].set()` on the
    # weight matrix is a full HBM copy of the (multi-MB) operand inside
    # the per-frame program — measured as the bulk of the int8 path's
    # overhead vs bf16 when applied unconditionally (the lifter's hidden
    # layers are all 128-aligned; only layer 0's K=1260 needs the pad).
    # The tiny activation pad (rows to the 16-sublane minimum) is kept.
    xp = x2.astype(jnp.bfloat16)
    if (Mp, Kp) != (M, K):
        xp = jnp.zeros((Mp, Kp), jnp.bfloat16).at[:M, :K].set(xp)
    wqp = wq
    if tuple(wq.shape) != (Kp, Npad):   # already-pre-padded trees skip this
        wqp = jnp.zeros((Kp, Npad), jnp.int8).at[:wq.shape[0], :N].set(wq)
    sp = scale.astype(jnp.float32).reshape(1, N)
    if Npad != N:
        sp = jnp.zeros((1, Npad), jnp.float32).at[0, :N].set(scale)
    if b is not None and Npad == N:
        bp = b.astype(jnp.float32).reshape(1, N)
    else:
        bp = jnp.zeros((1, Npad), jnp.float32)
        if b is not None:
            bp = bp.at[0, :N].set(b)
    out = _pallas_int8_matmul(xp, wqp, sp, bp, alpha, interpret)
    return out[:M, :N].reshape(*lead, N)
