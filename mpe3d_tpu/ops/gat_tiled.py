"""Grid-tiled pallas GAT matcher for CROWDED buckets (S=10/16).

Why this exists (round-4 finding, scripts/probe_big_buckets.py): the
whole-stack megakernel (ops/gat_kernel.py) compiles the five GAT layers
as ONE straight-line Mosaic body.  Mosaic's register allocator assigns
every spilled vector value its own scoped-VMEM slot — the on-chip
compile diagnostics attribute the entire overflow to "register
allocator spill slots" (202 MB at S=10 vs the v5e's 128 MB physical
VMEM), so peak-liveness restructuring inside one body cannot fix it:
the SLOT COUNT scales with the number of large values in the compiled
body, not with their live ranges.

The fix is the canonical pallas shape: a GRID over edge blocks.  Each
layer becomes two `pallas_call`s whose bodies only ever hold one
B-row block of edge tensors (weights pinned to block 0 and resident
across the grid), so the spill population is O(block), independent of
E; inter-stage tensors ride HBM blocks managed by BlockSpec index maps
(double-buffered by pallas):

  * K1 (grid over E/B blocks): the fc1→LeakyReLU→fc2 projection of the
    block's edge-nodes, their attention terms, the full edge-DESTINATION
    softmax output `out_e` (reference gat2.py edge_softmax over
    {self, head1, head2}), the masked head-max contributions
    (running-max accumulated into a revisited [H, nh] output), and the
    head-destination logits `l1m/l2m` stashed for pass 2;
  * XLA glue (tiny, [H, *] rows): the head-node projection, the
    combined per-destination max m = max(ls, m1, m2), `es`;
  * K2 (grid over E/B blocks): exp-shifted edge weights x1/x2 and the
    head-destination accumulations `den += inc1T_c @ x_c`,
    `num += inc1T_c @ ((x_c @ rep) * ze_c)` into revisited [H, F]
    outputs — the transposed incidence enters as a lane-sliced block so
    no in-kernel transpose is needed;
  * XLA epilogue: out_h = (es·rep·zh + num) / ((es + den)·rep), the
    inter-layer LeakyReLU, and the next layer's x concat.

Numerics: every edge-block op is the same fp32 `precision="highest"`
computation as the XLA/megakernel paths; the ONE deviation is that the
head-destination reductions accumulate per-block partial matmuls in
fp32 instead of one [H, E] x [E, nh] contraction, so scores can differ
from the XLA path at fp32 rounding level (measured ~1e-6; the
equivalence test gates at 2e-5 and the pipeline integration asserts
decode-identical person sets).  Head-max is exact (max is
order-independent).

Semantics: inference only, alt-3 topology, no residual/dropout — the
same envelope as the megakernel (apply_matcher_pallas).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mpe3d_tpu.config import MatcherConfig
from mpe3d_tpu.ops.gat_kernel import (_layer_dims, _static_tables)
from mpe3d_tpu.ops.tiles import round_up as _round_up


def _mm(a, b, prec: str = "highest"):
    return jnp.dot(a, b, precision=prec,
                   preferred_element_type=jnp.float32)


def _pick_block(E: int, H: int) -> int:
    """Edge-block rows: large enough to keep the MXU busy, small enough
    that the per-block tensors stay a few MB (GAT_TILED_B overrides for
    experiments; 256 measured ≈ 512 at S=16 on v5e)."""
    import os

    B = int(os.environ.get("GAT_TILED_B", "256"))
    while B > 128 and E < B:
        B //= 2
    return B


def _leaky(v, a):
    return jnp.where(v > 0, v, a * v)


@functools.partial(jax.jit, static_argnames=(
    "alpha", "nh", "B", "interpret", "last", "const_proj", "prec"))
def _k1_layer(xe, pw, inc1, inc2, zh, a1h, a2h, w1, b1, w2, b2, alf, arf,
              seg, rep, *, alpha: float, nh: int, B: int,
              interpret: bool = False, last: bool = False,
              const_proj: bool = False, prec: str = "highest"):
    """Pass 1 over edge blocks.  xe [Ep, Din]; returns (out_e [Ep, F],
    z_e [Ep, F], l1m/l2m [Ep, nh], m1/m2 [nh, H] — transposed so the
    per-component masked max rides full 128-lane [B, H] selects).  When
    ``last``, only out_e is meaningful (the final layer's head side is
    dead).

    ``const_proj``: every edge row of ``xe`` is the SAME constant vector
    (the alt-3 edge-node one-hot, matching/features.py:144-152), so the
    fc1→fc2 projection — layer 0's dominant FLOP term, ~60 % of the
    whole stack at E=2560 — is computed ONCE as [1, Din] and broadcast;
    bit-identical by construction (identical input rows produce
    identical projected rows).  ``xe`` is then passed as its first row
    [1, Din] and ``z_e`` output is the single projected row [1-padded]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Ep = inc1.shape[0]
    Din = xe.shape[1]
    F = w2.shape[1]
    H = zh.shape[0]
    n_blocks = Ep // B

    def kernel(xe_ref, pw_ref, i1_ref, i2_ref, zh_ref, a1h_ref, a2h_ref,
               w1_ref, b1_ref, w2_ref, b2_ref, alf_ref, arf_ref, seg_ref,
               rep_ref, oe_ref, ze_ref, l1_ref, l2_ref, m1_ref, m2_ref):
        c = pl.program_id(0)
        neg = jnp.float32(-jnp.inf)
        mm = lambda a, b: _mm(a, b, prec)                # noqa: E731
        h1 = _leaky(mm(xe_ref[:], w1_ref[:]) + b1_ref[:], alpha)
        ze = mm(h1, w2_ref[:]) + b2_ref[:]        # [B, F] or [1, F]
        a1e = mm(ze * alf_ref[:], seg_ref[:])     # [B, nh] or [1, nh]
        a2e = mm(ze * arf_ref[:], seg_ref[:])
        i1, i2 = i1_ref[:], i2_ref[:]                    # [B, H]
        pw = pw_ref[:]                                   # [B, 1]

        # edge destinations: softmax over {self, head1, head2}
        zh_e1, zh_e2 = mm(i1, zh_ref[:]), mm(i2, zh_ref[:])
        a1h_e1, a1h_e2 = mm(i1, a1h_ref[:]), mm(i2, a1h_ref[:])
        l0 = _leaky(a1e + a2e, alpha)
        l1 = _leaky(a1h_e1 + a2e, alpha)
        l2 = _leaky(a1h_e2 + a2e, alpha)
        mx = jnp.maximum(l0, jnp.maximum(l1, l2))
        e0 = jnp.exp(l0 - mx)
        e1 = jnp.exp(l1 - mx)
        e2 = jnp.exp(l2 - mx)
        s = e0 + e1 + e2
        oe_ref[:] = (mm(e0 / s, rep_ref[:]) * ze
                     + mm(e1 / s, rep_ref[:]) * zh_e1
                     + mm(e2 / s, rep_ref[:]) * zh_e2)
        if last:
            return

        ze_ref[:] = ze                 # const_proj: the single row
        # head-destination logits for this block (masked)
        a2h_e1, a2h_e2 = mm(i1, a2h_ref[:]), mm(i2, a2h_ref[:])
        live = pw > 0
        l1m = jnp.where(live, _leaky(a1e + a2h_e1, alpha), neg)
        l2m = jnp.where(live, _leaky(a1e + a2h_e2, alpha), neg)
        l1_ref[:] = l1m
        l2_ref[:] = l2m

        # running masked max into the revisited [nh, H] outputs (the XLA
        # glue transposes).  PER-COMPONENT [B, H] selects — H rides the
        # 128-lane axis at high occupancy, where the rank-3
        # [B, H, nh→128] form wastes 100·(1-nh/128) % of every lane op
        # (measured: the rank-3 masked max dominated the whole tiled
        # stack's wall at S=16).  Exact: fp max is order-independent.
        @pl.when(c == 0)
        def _():
            m1_ref[:] = jnp.full((nh, H), neg)
            m2_ref[:] = jnp.full((nh, H), neg)
        for k in range(nh):
            v1 = jnp.max(jnp.where(i1 > 0, l1m[:, k:k + 1], neg),
                         axis=0, keepdims=True)          # [1, H]
            v2 = jnp.max(jnp.where(i2 > 0, l2m[:, k:k + 1], neg),
                         axis=0, keepdims=True)
            m1_ref[k:k + 1, :] = jnp.maximum(m1_ref[k:k + 1, :], v1)
            m2_ref[k:k + 1, :] = jnp.maximum(m2_ref[k:k + 1, :], v2)

    vm = {} if interpret else {"memory_space": pltpu.VMEM}
    # weights + one double-buffered block set run ~20-40 MB — well past
    # the 16 MB default scoped-vmem cap, far under the 128 MB part
    kw = {} if interpret else {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=80 * 1024 * 1024)}
    blk = lambda c: (c, 0)           # noqa: E731
    pin = lambda c: (0, 0)           # noqa: E731
    ze_rows = 1 if const_proj else Ep
    out_shape = (
        jax.ShapeDtypeStruct((Ep, F), jnp.float32),      # out_e
        jax.ShapeDtypeStruct((ze_rows, F), jnp.float32),  # z_e
        jax.ShapeDtypeStruct((Ep, nh), jnp.float32),     # l1m
        jax.ShapeDtypeStruct((Ep, nh), jnp.float32),     # l2m
        jax.ShapeDtypeStruct((nh, H), jnp.float32),      # m1 (revisited)
        jax.ShapeDtypeStruct((nh, H), jnp.float32),      # m2 (revisited)
    )
    out_specs = (
        pl.BlockSpec((B, F), blk, **vm),
        (pl.BlockSpec((1, F), pin, **vm) if const_proj
         else pl.BlockSpec((B, F), blk, **vm)),
        pl.BlockSpec((B, nh), blk, **vm),
        pl.BlockSpec((B, nh), blk, **vm),
        pl.BlockSpec((nh, H), pin, **vm),
        pl.BlockSpec((nh, H), pin, **vm),
    )
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            (pl.BlockSpec((1, Din), pin, **vm) if const_proj
             else pl.BlockSpec((B, Din), blk, **vm)),    # xe
            pl.BlockSpec((B, 1), blk, **vm),             # pw
            pl.BlockSpec((B, H), blk, **vm),             # inc1
            pl.BlockSpec((B, H), blk, **vm),             # inc2
            pl.BlockSpec((H, F), pin, **vm),             # zh
            pl.BlockSpec((H, nh), pin, **vm),            # a1h
            pl.BlockSpec((H, nh), pin, **vm),            # a2h
            pl.BlockSpec((Din, Din), pin, **vm),         # w1
            pl.BlockSpec((1, Din), pin, **vm),           # b1
            pl.BlockSpec((Din, F), pin, **vm),           # w2
            pl.BlockSpec((1, F), pin, **vm),             # b2
            pl.BlockSpec((1, F), pin, **vm),             # alf
            pl.BlockSpec((1, F), pin, **vm),             # arf
            pl.BlockSpec((F, nh), pin, **vm),            # seg
            pl.BlockSpec((nh, F), pin, **vm),            # rep
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        **kw,
    )(xe, pw, inc1, inc2, zh, a1h, a2h, w1, b1, w2, b2, alf, arf, seg,
      rep)


@functools.partial(jax.jit, static_argnames=("B", "interpret", "const_ze",
                                              "prec"))
def _k2_layer(l1m, l2m, pw, inc1, inc2, inc1T, inc2T, z_e, m, rep,
              *, B: int, interpret: bool = False, const_ze: bool = False,
              prec: str = "highest"):
    """Pass 2 over edge blocks: head-destination denominators and
    numerators, accumulated across blocks.  Returns (den [H, nh],
    num [H, F]) — the edge contributions only (the head self terms are
    added by the XLA epilogue).  ``const_ze``: z_e is the single
    projected row of a constant edge feature (see _k1_layer)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Ep, nh = l1m.shape
    H = inc1T.shape[0]
    F = z_e.shape[1]
    n_blocks = Ep // B

    def kernel(l1_ref, l2_ref, pw_ref, i1_ref, i2_ref, i1T_ref, i2T_ref,
               ze_ref, m_ref, rep_ref, den_ref, num_ref):
        c = pl.program_id(0)
        mm = lambda a, b: _mm(a, b, prec)                # noqa: E731
        m = m_ref[:]                                     # [H, nh]
        pw = pw_ref[:]
        x1 = jnp.exp(l1_ref[:] - mm(i1_ref[:], m)) * pw   # [B, nh]
        x2 = jnp.exp(l2_ref[:] - mm(i2_ref[:], m)) * pw
        ze = ze_ref[:]
        t1 = mm(x1, rep_ref[:]) * ze                    # [B, F]
        t2 = mm(x2, rep_ref[:]) * ze

        @pl.when(c == 0)
        def _():
            den_ref[:] = jnp.zeros((H, nh), jnp.float32)
            num_ref[:] = jnp.zeros((H, F), jnp.float32)
        den_ref[:] = (den_ref[:] + mm(i1T_ref[:], x1)
                      + mm(i2T_ref[:], x2))
        num_ref[:] = (num_ref[:] + mm(i1T_ref[:], t1)
                      + mm(i2T_ref[:], t2))

    vm = {} if interpret else {"memory_space": pltpu.VMEM}
    kw = {} if interpret else {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=80 * 1024 * 1024)}
    blk = lambda c: (c, 0)           # noqa: E731
    pin = lambda c: (0, 0)           # noqa: E731
    colblk = lambda c: (0, c)        # noqa: E731
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((B, nh), blk, **vm),            # l1m
            pl.BlockSpec((B, nh), blk, **vm),            # l2m
            pl.BlockSpec((B, 1), blk, **vm),             # pw
            pl.BlockSpec((B, H), blk, **vm),             # inc1
            pl.BlockSpec((B, H), blk, **vm),             # inc2
            pl.BlockSpec((H, B), colblk, **vm),          # inc1T
            pl.BlockSpec((H, B), colblk, **vm),          # inc2T
            (pl.BlockSpec((1, F), pin, **vm) if const_ze
             else pl.BlockSpec((B, F), blk, **vm)),      # z_e
            pl.BlockSpec((H, nh), pin, **vm),            # m
            pl.BlockSpec((nh, F), pin, **vm),            # rep
        ],
        out_specs=(pl.BlockSpec((H, nh), pin, **vm),
                   pl.BlockSpec((H, F), pin, **vm)),
        out_shape=(jax.ShapeDtypeStruct((H, nh), jnp.float32),
                   jax.ShapeDtypeStruct((H, F), jnp.float32)),
        interpret=interpret,
        **kw,
    )(l1m, l2m, pw, inc1, inc2, inc1T, inc2T, z_e, m, rep)


def gat_stack_tiled(x_all, pw_e, inc1, inc2, layer_arrays,
                    cfg: MatcherConfig, H: int,
                    interpret: Optional[bool] = None,
                    edge_const: bool = False):
    """The whole stack through the tiled layer kernels.  x_all [H+E, Din]
    (heads then edges), pw_e [E, 1]; layer_arrays as produced by
    gat_kernel.gat_layer_arrays.  Returns logits [E, 1].

    ``edge_const=True`` asserts every EDGE row of x_all is the same
    constant vector (the alt-3 inference invariant — edge-node features
    are one shared one-hot), so layer 0 projects it once instead of E
    times (bit-identical; ~60 % of the stack's FLOPs at E=2560)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dims = _layer_dims(cfg)
    E = int(x_all.shape[0]) - H
    B = _pick_block(E, H)
    Ep = _round_up(E, B)
    alpha, slope = cfg.alpha, cfg.hidden_slope
    prec = cfg.matmul_precision      # "highest" = serving parity; see
    # scripts/ab_match_precision.py for the measured relaxation ladder
    mm = lambda a, b: _mm(a, b, prec)                    # noqa: E731

    pad_e = Ep - E
    def pad_rows(a, fill=0.0):
        if pad_e == 0:
            return jnp.asarray(a)
        a = jnp.asarray(a)
        return jnp.concatenate(
            [a, jnp.full((pad_e, a.shape[1]), fill, a.dtype)], axis=0)

    pw = pad_rows(jnp.reshape(pw_e, (E, 1)))
    i1, i2 = pad_rows(inc1), pad_rows(inc2)
    i1T, i2T = i1.T, i2.T            # [H, Ep] (XLA transpose, once)
    xh = x_all[:H]
    xe = pad_rows(x_all[H:])

    for l, (d_in, d_out, nh) in enumerate(dims):
        (w1, b1, w2, b2, alf, arf, seg, rep) = layer_arrays[l]
        last = l == len(dims) - 1
        const = edge_const and l == 0
        # head-side projection: [H, *] rows — tiny, stays in XLA
        h1h = _leaky(mm(xh, w1) + b1, alpha)
        zh = mm(h1h, w2) + b2                            # [H, F]
        a1h = mm(zh * alf, seg)                          # [H, nh]
        a2h = mm(zh * arf, seg)

        out_e, z_e, l1m, l2m, m1, m2 = _k1_layer(
            xe[:1] if const else xe, pw, i1, i2, zh, a1h, a2h,
            jnp.asarray(w1), jnp.asarray(b1), jnp.asarray(w2),
            jnp.asarray(b2), jnp.asarray(alf), jnp.asarray(arf),
            jnp.asarray(seg), jnp.asarray(rep),
            alpha=alpha, nh=nh, B=B, interpret=interpret, last=last,
            const_proj=const, prec=prec)
        if last:
            return out_e[:E]                             # [E, 1] logits

        ls = _leaky(a1h + a2h, alpha)                    # [H, nh]
        m = jnp.maximum(ls, jnp.maximum(m1.T, m2.T))     # K1 emits [nh, H]
        den, num = _k2_layer(l1m, l2m, pw, i1, i2, i1T, i2T, z_e, m,
                             jnp.asarray(rep), B=B, interpret=interpret,
                             const_ze=const, prec=prec)
        es = jnp.exp(ls - m)
        out_h = ((mm(es, rep) * zh + num)
                 / mm(es + den, rep))                    # [H, F]

        xh = _leaky(out_h, slope)
        xe = _leaky(out_e, slope)


def apply_matcher_tiled(params: Dict, head_feats, edge_feats, topo,
                        pair_w, cfg: MatcherConfig,
                        interpret: Optional[bool] = None):
    """Drop-in tiled-inference replacement for apply_matcher /
    apply_matcher_pallas (same envelope: alt-3, no residual/dropout).
    Returns sigmoid scores [E]."""
    from mpe3d_tpu.ops.gat_kernel import gat_layer_arrays

    assert not cfg.residual, "tiled matcher: residual unsupported"
    H = int(head_feats.shape[0])
    inc1 = np.asarray(topo.inc1, np.float32)
    inc2 = np.asarray(topo.inc2, np.float32)
    # constant-edge-feature detection: the serving path passes the host
    # numpy one-hot block (inlined literal) — concrete here, inspectable
    # at trace time; traced/varying edge features keep the general path
    edge_const = (isinstance(edge_feats, np.ndarray)
                  and len(edge_feats) > 1
                  and bool((edge_feats == edge_feats[0]).all()))
    x_all = jnp.concatenate([head_feats, edge_feats]).astype(jnp.float32)
    logits = gat_stack_tiled(
        x_all, jnp.asarray(pair_w, jnp.float32), jnp.asarray(inc1),
        jnp.asarray(inc2), gat_layer_arrays(params, cfg),
        cfg, H, interpret=interpret, edge_const=edge_const)
    return jax.nn.sigmoid(logits.reshape(-1))
