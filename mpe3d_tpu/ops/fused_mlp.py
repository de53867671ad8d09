"""Pallas TPU kernel: the ENTIRE lifter MLP in one kernel launch.

Serving the 29.1 M-param lifter (models/mlp.py, reference utils/mlp.py:3-31)
is weight-streaming-bound: per frame the MXU multiplies a tiny [persons≤16,
K] activation against 58 MB (bf16) / 29 MB (int8) of weights, so on-device
frame time is set by HBM bytes read — the measured stage breakdown puts the
lift at ~75 % of the fused frame (RESULTS.md).  Two measured overheads keep
the existing paths off the HBM floor:

  * XLA dispatches the 9 layer matmuls as separate fusions; the bf16 lift
    measures ~3× its 71 µs weight-stream floor (262 µs, chain8 session).
  * The per-layer int8 pallas kernel (ops/quant_matmul.py) pays its launch
    overhead 9× per frame — measured SLOWER than bf16 at serving shapes
    (499 vs 268 µs) despite halving the bytes.

This kernel runs the WHOLE network in ONE ``pallas_call``: activations
never leave VMEM, and each layer's weight matrix is streamed HBM→VMEM in
double-buffered K-tiles so the DMA engine is busy end-to-end while the MXU
consumes the previous tile.  Per-launch overhead is paid once, and the
bytes streamed are the weights exactly once — the HBM floor by
construction.  Supports the two serving weight formats:

  * bf16 layers ({"w": [Kp, Np] bf16, "b": [1, Np] f32}) — numerically
    identical to the default TPU matmul path (bf16 operands, fp32 accum);
  * int8 layers ({"wq", "scale", "rscale", "b"}) — the two-sided
    quantisation of models/mlp.py::quantize_lifter_weights, same algebra
    as ops/quant_matmul.py (rscale folds into the fp32 activation before
    the bf16 cast; per-channel scale applied after accumulation).

Layers may mix formats (quantize keeps the last layer full-precision).
Use via models/mlp.py::pack_lifter_serving + apply_lifter, or the
pipeline's ``use_fused_mlp`` knob.  No reference counterpart (the
reference serves fp32 torch weights on GPU).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

M_TILE = 16      # activation rows: persons-per-frame buckets are <= 16
KT_MAX = 256     # K-tile: wbuf 256x3072 bf16 = 1.5 MB x2 buffers in VMEM


from mpe3d_tpu.ops.tiles import round_up as _round_up


def _ktile(kp: int) -> int:
    return KT_MAX if kp % KT_MAX == 0 else 128


@functools.partial(jax.jit,
                   static_argnames=("kinds", "dims", "alpha", "interpret"))
def _fused_mlp_call(x, flat, kinds, dims, alpha: float,
                    interpret: bool = False):
    """x: [16, K0p] f32.  ``flat``: per-layer refs in order — bf16 layer
    (w, b), int8 layer (wq, scale, rscale, b).  ``kinds``: 'w'/'q' per
    layer; ``dims``: ((Kp, Np), ...) padded shapes (static)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_layers = len(kinds)
    nmax = max(n for _, n in dims)

    def kernel(*refs):
        x_ref = refs[0]
        layer_refs = refs[1:-3]
        o_ref, act0, act1 = refs[-3], refs[-2], refs[-1]
        acts = (act0, act1)

        off = 0
        for li, kind in enumerate(kinds):
            Kp, Np = dims[li]
            kt = _ktile(Kp)
            n_tiles = Kp // kt
            last = li == n_layers - 1
            if kind == "q":
                w_ref, scale_ref, rscale_ref, b_ref = \
                    layer_refs[off:off + 4]
                off += 4
            else:
                w_ref, b_ref = layer_refs[off:off + 2]
                scale_ref = rscale_ref = None
                off += 2

            # the whole input activation in registers/VMEM values: [16, Kp]
            src = x_ref if li == 0 else acts[(li + 1) % 2]
            xin = src[:, :Kp].astype(jnp.float32)
            if rscale_ref is not None:
                xin = xin * rscale_ref[:, :Kp]        # two-sided int8 fold
            wdtype = jnp.int8 if kind == "q" else jnp.bfloat16

            def layer_body(wbuf, sem, xin=xin, w_ref=w_ref, kt=kt,
                           n_tiles=n_tiles, Np=Np):
                # STATIC unroll over K-tiles (≤ 12 per layer): value slices
                # and DMA slot indices stay static — mosaic has no lowering
                # for dynamic_slice on kernel VALUES (only on refs), which
                # a fori_loop body would require.
                def get_dma(slot, k):
                    return pltpu.make_async_copy(
                        w_ref.at[pl.ds(k * kt, kt), :],
                        wbuf.at[slot], sem.at[slot])

                get_dma(0, 0).start()
                acc = jnp.zeros((M_TILE, Np), jnp.float32)
                for k in range(n_tiles):
                    slot = k % 2
                    if k + 1 < n_tiles:
                        get_dma((k + 1) % 2, k + 1).start()
                    get_dma(slot, k).wait()
                    xk = xin[:, k * kt:(k + 1) * kt]
                    acc = acc + jnp.dot(
                        xk.astype(jnp.bfloat16),
                        wbuf[slot].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
                return acc

            acc = pl.run_scoped(
                layer_body,
                wbuf=pltpu.VMEM((2, kt, Np), wdtype),
                sem=pltpu.SemaphoreType.DMA((2,)))
            if scale_ref is not None:
                acc = acc * scale_ref[:]
            out = acc + b_ref[:]
            if not last:
                out = jnp.where(out > 0, out, alpha * out)
                acts[li % 2][:, :Np] = out
            else:
                o_ref[:] = out

    n_last = dims[-1][1]
    vm = pltpu.VMEM
    in_specs = [pl.BlockSpec(memory_space=vm)]          # x
    for kind in kinds:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))   # weights: HBM
        if kind == "q":
            in_specs += [pl.BlockSpec(memory_space=vm)] * 2  # scale, rscale
        in_specs.append(pl.BlockSpec(memory_space=vm))       # bias

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M_TILE, n_last), jnp.float32),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=vm),
        scratch_shapes=[pltpu.VMEM((M_TILE, nmax), jnp.float32),
                        pltpu.VMEM((M_TILE, nmax), jnp.float32)],
        interpret=interpret,
    )(x, *flat)


def pack_fused_layers(layers: Sequence[dict]):
    """Pad a serving layer list (models/mlp.py trees: bf16/fp32 ``w`` or
    int8 ``wq``+``scale``+``rscale``) for the kernel.  Host-side, ONCE per
    pipeline — padded copies must never be rebuilt inside a per-frame
    program (the unconditional-pad lesson of ops/quant_matmul.py).

    Returns (flat arrays, kinds, padded dims).  Hidden-layer boundaries
    must agree un-padded (layer i's N == layer i+1's K) — true for any
    standard MLP.  BOTH K and N pad to 128 multiples, so the padded
    boundary dims agree too (padded output columns are written as exact
    zeros: zero weight columns, zero bias → leaky(0) = 0 — the next
    layer's padded-K read is defined and contributes nothing).  The
    K-tile size adapts per layer (`_ktile`: 256 when it divides, else
    128), so widths like 384 or 640 work, not just 256 multiples.
    """
    flat, kinds, dims = [], [], []
    prev_n = None
    for layer in layers:
        quant = "wq" in layer
        w = layer["wq"] if quant else layer["w"]
        K, N = w.shape
        Kp = _round_up(K, 128)
        Np = _round_up(N, 128)
        # boundary check on UNPADDED dims: two mismatched widths in the
        # same 128-bucket (e.g. N=256 feeding K=250) would pass a padded
        # comparison and silently drop the extra activation columns.
        # Quantised layers may arrive with K pre-padded to the 128
        # alignment (quantize_lifter_weights; zero rows), so K equal to
        # the previous N's round-up is also a valid boundary there.
        ok = (prev_n is None or K == prev_n
              or (quant and K == _round_up(prev_n, 128)))
        if not ok:
            raise ValueError(
                f"layer boundary mismatch: K {K} != previous layer's "
                f"N {prev_n}")
        prev_n = N
        w = jnp.asarray(w)
        if quant and w.dtype != jnp.int8:
            raise ValueError("wq must be int8")
        if not quant:
            w = w.astype(jnp.bfloat16)
        if (Kp, Np) != (K, N):
            w = jnp.zeros((Kp, Np), w.dtype).at[:K, :N].set(w)
        b = jnp.zeros((1, Np), jnp.float32).at[0, :N].set(
            jnp.asarray(layer["b"], jnp.float32))
        if quant:
            scale = jnp.zeros((1, Np), jnp.float32).at[0, :N].set(
                jnp.asarray(layer["scale"], jnp.float32))
            # one-sided trees (quantize_lifter_weights(row_scale=False))
            # carry no rscale: synthesize ones so both int8 paths accept
            # the same input domain (padded K stays zero — those x columns
            # are already zero)
            rs = layer.get("rscale")
            rs = jnp.ones((K,), jnp.float32) if rs is None \
                else jnp.asarray(rs, jnp.float32)
            # rs may be shorter than K when wq arrived K-pre-padded
            # (quantize_lifter_weights keeps rscale at the true K; the
            # padded x columns are zero so their fold factor is moot)
            rscale = jnp.zeros((1, Kp),
                               jnp.float32).at[0, :rs.shape[0]].set(rs)
            flat += [w, scale, rscale, b]
            kinds.append("q")
        else:
            flat += [w, b]
            kinds.append("w")
        dims.append((Kp, Np))
    return flat, tuple(kinds), tuple(dims)


def fused_mlp_forward(x: jnp.ndarray, flat, kinds, dims,
                      alpha: float, out_dim: int,
                      interpret: bool = False) -> jnp.ndarray:
    """Run the packed MLP.  x: [M ≤ 16, K0] (any float dtype) → [M, out_dim]
    f32.  ``flat``/``kinds``/``dims`` from :func:`pack_fused_layers`."""
    M, K = x.shape
    if M > M_TILE:
        raise ValueError(f"fused MLP serves row counts <= {M_TILE}, got {M}")
    K0p = dims[0][0]
    xp = jnp.zeros((M_TILE, K0p), jnp.float32).at[:M, :K].set(
        x.astype(jnp.float32))
    out = _fused_mlp_call(xp, tuple(flat), kinds, dims, alpha, interpret)
    return out[:M, :out_dim]
