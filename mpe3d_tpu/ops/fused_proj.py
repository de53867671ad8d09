"""Pallas TPU kernel: fused Linear → LeakyReLU → Linear projection.

This is the matcher's per-layer hot op (reference: gat2.py:52-55 — fc1(in→in)
+ LeakyReLU(α) + fc2(in→heads·out), run for every node of every graph).  The
fusion keeps the intermediate activation [N, D] in VMEM instead of a round
trip through HBM, and both weight matrices stay VMEM-resident across the row
grid (D=902 → 3.3 MB + 1.5 MB, well under the ~16 MB budget).

Grid: one program per 128-row tile of the node axis; weights are broadcast
(index_map pins them to block 0).  Shapes are padded to the fp32 (8, 128)
tile grid by the wrapper and cropped on return.

``fused_linear_leaky_linear`` picks the Pallas path on TPU and falls back to
plain XLA elsewhere (or with use_pallas=False); both paths are numerically
identical to the reference composition (tests/test_ops.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

ROW_TILE = 128


from mpe3d_tpu.ops.tiles import round_up as _round_up


def xla_proj(x: jnp.ndarray, w1: jnp.ndarray, b1: Optional[jnp.ndarray],
             w2: jnp.ndarray, b2: Optional[jnp.ndarray],
             alpha: float) -> jnp.ndarray:
    h = jnp.dot(x, w1, precision="highest",
                preferred_element_type=jnp.float32)
    if b1 is not None:
        h = h + b1
    h = jax.nn.leaky_relu(h, alpha)
    o = jnp.dot(h, w2, precision="highest",
                preferred_element_type=jnp.float32)
    if b2 is not None:
        o = o + b2
    return o


@functools.partial(jax.jit, static_argnames=("alpha", "interpret"))
def _pallas_proj(x, w1, b1, w2, b2, alpha: float, interpret: bool = False):
    """Padded inputs: x [Np, Dp], w1 [Dp, Dp], b1 [1, Dp], w2 [Dp, Fp],
    b2 [1, Fp]; all tile-aligned."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Np, Dp = x.shape
    Fp = w2.shape[1]

    def kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
        # precision="highest" keeps fp32 operands on the MXU (Mosaic's
        # default rounds them to bf16, like XLA's)
        h = jnp.dot(x_ref[:], w1_ref[:], precision="highest",
                    preferred_element_type=jnp.float32) + b1_ref[:]
        h = jnp.where(h > 0, h, alpha * h)
        o_ref[:] = jnp.dot(h, w2_ref[:], precision="highest",
                           preferred_element_type=jnp.float32) + b2_ref[:]

    vmem = {} if interpret else {"memory_space": pltpu.VMEM}
    grid = (Np // ROW_TILE,)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Np, Fp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROW_TILE, Dp), lambda i: (i, 0), **vmem),
            pl.BlockSpec((Dp, Dp), lambda i: (0, 0), **vmem),
            pl.BlockSpec((1, Dp), lambda i: (0, 0), **vmem),
            pl.BlockSpec((Dp, Fp), lambda i: (0, 0), **vmem),
            pl.BlockSpec((1, Fp), lambda i: (0, 0), **vmem),
        ],
        out_specs=pl.BlockSpec((ROW_TILE, Fp), lambda i: (i, 0), **vmem),
        interpret=interpret,
    )(x, w1, b1, w2, b2)


def fused_linear_leaky_linear(x: jnp.ndarray, w1: jnp.ndarray,
                              b1: Optional[jnp.ndarray], w2: jnp.ndarray,
                              b2: Optional[jnp.ndarray], alpha: float,
                              use_pallas: Optional[bool] = None,
                              interpret: bool = False) -> jnp.ndarray:
    """out = (leaky_relu(x@w1 + b1, alpha)) @ w2 + b2.

    x: [N, D]; w1: [D, D]; w2: [D, F].  ``use_pallas=None`` auto-selects the
    Pallas kernel on TPU backends.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu" and not interpret
    if not (use_pallas or interpret):
        return xla_proj(x, w1, b1, w2, b2, alpha)

    N, D = x.shape
    F = w2.shape[1]
    Np, Dp, Fp = _round_up(max(N, 1), ROW_TILE), _round_up(D, 128), \
        _round_up(F, 128)
    xp = jnp.zeros((Np, Dp), jnp.float32).at[:N, :D].set(x)
    w1p = jnp.zeros((Dp, Dp), jnp.float32).at[:D, :D].set(w1)
    w2p = jnp.zeros((Dp, Fp), jnp.float32).at[:D, :F].set(w2)
    b1p = jnp.zeros((1, Dp), jnp.float32)
    if b1 is not None:
        b1p = b1p.at[0, :D].set(b1)
    b2p = jnp.zeros((1, Fp), jnp.float32)
    if b2 is not None:
        b2p = b2p.at[0, :F].set(b2)
    out = _pallas_proj(xp, w1p, b1p, w2p, b2p, alpha, interpret)
    return out[:N, :F]
