"""Pallas TPU megakernel: the ENTIRE GAT matcher stack in one launch.

Motivation (RESULTS.md "GAT launch-consolidation A/B"): the matcher stage
is bound by its serial critical path — 5 dependent layers × ~7 dependent
XLA fusions, each paying an inter-fusion HBM round trip on tiny tensors
(H≈20 heads, E≈160 pairs).  Consolidating launches at the XLA level did
not move it (scores bit-identical, time unchanged), so this kernel takes
the other lever: ALL five layers run inside one `pallas_call`, weights
(~8 MB fp32, under the ~16 MB VMEM budget) and every activation stay
VMEM-resident, and the ~35 inter-fusion HBM round trips disappear.

Semantics are exactly `models.gat.apply_matcher` at inference (reference:
skeleton_matching/gat2.py:17-88 — shared fc1+LeakyReLU+fc2 projection,
per-destination edge_softmax over the alt-3 topology, per-pair softmax
multiplicity weights), with the same fp32 `precision="highest"` matmuls.
Not supported here (the XLA path stays the implementation for them):
training-time dropout, `cfg.residual`, and the alt-1 graph.

Layout notes (Mosaic-friendly, everything rank-2):
  * all per-node tensors ride flat `[rows, nh*d]` — attention reductions
    over each head's d-block are matmuls with a static 0/1 segment matrix
    `seg [nh*d, nh]`, and per-head coefficient broadcast is a matmul with
    its transpose `rep = seg.T`;
  * endpoint gathers/scatters are incidence matmuls (`inc [E, H]`,
    passed pre-transposed too — no in-kernel transposes);
  * the exact per-destination max-shift of the head softmax (underflow
    hardening, see models/gat.py) is an unrolled per-head masked max —
    H is a small static constant.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mpe3d_tpu.config import MatcherConfig


def _mm(a, b):
    return jnp.dot(a, b, precision="highest",
                   preferred_element_type=jnp.float32)


def _layer_dims(cfg: MatcherConfig):
    dims = []
    d_in = cfg.in_dim
    for l in range(len(cfg.hidden)):
        dims.append((d_in, cfg.hidden[l], cfg.heads[l]))
        d_in = cfg.hidden[l] * cfg.heads[l]
    dims.append((d_in, cfg.n_classes, 1))
    return dims


def _perlane_head_max(inc1, inc2, l1m, l2m, H: int, nh: int):
    """Per-head masked max via PER-COMPONENT [E, H] selects — the
    lane-efficient form: H rides the 128-lane axis at high occupancy,
    where the rank-3 [·, H, nh→128] forms waste 100·(1-nh/128) % of
    every lane op (measured on-chip: that waste dominated the tiled
    stack's wall at S=16, ops/gat_tiled.py).  Exact (same element set
    max-reduced; fp max is order-independent).  Returns (m1, m2)
    [H, nh]; the [nh, H] rows are transposed through one exact 0/1
    identity matmul (products x·1, single nonzero per sum)."""
    neg = jnp.float32(-jnp.inf)
    # heads with no live incident edge max to -inf; the 0/1 identity
    # matmul below would turn that into NaN (0·-inf), so clamp to the
    # most-negative FINITE fp32 for the transpose and restore after —
    # downstream only ever sees maximum(ls, m), identical either way
    lo = jnp.float32(np.finfo(np.float32).min)
    rows1, rows2 = [], []
    for k in range(nh):
        rows1.append(jnp.maximum(
            jnp.max(jnp.where(inc1 > 0, l1m[:, k:k + 1], neg),
                    axis=0, keepdims=True), lo))         # [1, H]
        rows2.append(jnp.maximum(
            jnp.max(jnp.where(inc2 > 0, l2m[:, k:k + 1], neg),
                    axis=0, keepdims=True), lo))
    m1t = jnp.concatenate(rows1, axis=0)                 # [nh, H]
    m2t = jnp.concatenate(rows2, axis=0)
    eye = (jax.lax.broadcasted_iota(jnp.int32, (H, H), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (H, H), 1)
           ).astype(jnp.float32)

    def tr(m):                                           # [H, nh]
        t = jax.lax.dot_general(eye, m, (((1,), (1,)), ((), ())),
                                precision="highest",
                                preferred_element_type=jnp.float32)
        return jnp.where(t <= lo, neg, t)
    return tr(m1t), tr(m2t)


def gat_stack_values(x, pw, inc1, inc2, inc1T, inc2T, layer_vals,
                     cfg: MatcherConfig, H: int):
    """The whole GAT stack on in-register/VMEM VALUES — shared by the
    matcher megakernel below and the whole-frame kernel
    (ops/frame_kernel.py), so their scores are identical by construction.

    x: [H+E, Din]; pw: [E, 1]; inc1/inc2: [E, H]; inc1T/inc2T: [H, E];
    ``layer_vals``: per layer (w1, b1, w2, b2, alf, arf, seg, rep) values,
    OR a zero-arg callable returning that tuple — evaluated right before
    the layer runs, so a caller can overlap weight DMAs with earlier
    layers' compute and wait only at first use (ops/frame_kernel.py).
    Returns score logits [E, 1]."""
    dims = _layer_dims(cfg)
    alpha = cfg.alpha
    slope = cfg.hidden_slope
    n_layers = len(dims)

    def leaky(v, a):
        return jnp.where(v > 0, v, a * v)

    live = pw > 0
    neg = jnp.float32(-jnp.inf)

    for l, (d_in, d_out, nh) in enumerate(dims):
        lv = layer_vals[l]
        if callable(lv):
            lv = lv()
        (w1, b1, w2, b2, alf, arf, seg, rep) = lv
        F = nh * d_out

        h1 = leaky(_mm(x, w1) + b1, alpha)
        z = _mm(h1, w2) + b2                         # [H+E, F]
        a1 = _mm(z * alf, seg)                       # [H+E, nh]
        a2 = _mm(z * arf, seg)
        zh, ze = z[:H], z[H:]
        a1h, a2h = a1[:H], a2[:H]
        a1e, a2e = a1[H:], a2[H:]

        zh_e1, zh_e2 = _mm(inc1, zh), _mm(inc2, zh)  # [E, F]
        a1h_e1, a1h_e2 = _mm(inc1, a1h), _mm(inc2, a1h)
        a2h_e1, a2h_e2 = _mm(inc1, a2h), _mm(inc2, a2h)

        # edge-node destinations: softmax over {self, head1, head2}
        l0 = leaky(a1e + a2e, alpha)
        l1 = leaky(a1h_e1 + a2e, alpha)
        l2 = leaky(a1h_e2 + a2e, alpha)
        mx = jnp.maximum(l0, jnp.maximum(l1, l2))
        e0 = jnp.exp(l0 - mx)
        e1 = jnp.exp(l1 - mx)
        e2 = jnp.exp(l2 - mx)
        s = e0 + e1 + e2
        out_e = (_mm(e0 / s, rep) * ze + _mm(e1 / s, rep) * zh_e1
                 + _mm(e2 / s, rep) * zh_e2)         # [E, F]

        if l == n_layers - 1:
            return out_e                             # [E, 1] logits —
            # the head-destination branch below is dead for the final
            # layer (only edge scores leave the stack); skipping it
            # drops one full head-softmax pass from the critical path



        # head destinations: self + incident edge-nodes (exact
        # per-destination max-shift).  Two forms, bit-identical (the
        # same element set is max-reduced; fp max is order-independent):
        #   * small buckets: ONE rank-3 masked max per incidence — the
        #     padded temporary is [H, E, 128] fp32 (nh lane-pads to 128);
        #   * large buckets: the lane-efficient PER-COMPONENT form
        #     (_perlane_head_max) — [E, H] selects with H on the lane
        #     axis, so no 128/nh lane waste and only [E, H]-sized
        #     temporaries.  This replaced the round-3 per-head unrolled
        #     loop (and a round-4 chunked-rank-3 interim), whose
        #     dead-temporary pile was the dominant term in the S=10/16
        #     scoped-VMEM blowups — Mosaic's register allocator gives
        #     every large straight-line value its own spill slot
        #     (142-202 MB measured; probes: scripts/probe_big_buckets
        #     .py).
        ls = leaky(a1h + a2h, alpha)                 # [H, nh]
        l1h = leaky(a1e + a2h_e1, alpha)             # [E, nh]
        l2h = leaky(a1e + a2h_e2, alpha)
        l1m = jnp.where(live, l1h, neg)
        l2m = jnp.where(live, l2h, neg)
        E = int(pw.shape[0])
        if H * E * 128 * 4 <= 8 * 1024 * 1024:       # padded rank-3 bytes
            m1 = jnp.max(jnp.where(inc1T[:, :, None] > 0, l1m[None, :, :],
                                   neg), axis=1)     # [H, nh]
            m2 = jnp.max(jnp.where(inc2T[:, :, None] > 0, l2m[None, :, :],
                                   neg), axis=1)
            m = jnp.maximum(ls, jnp.maximum(m1, m2))  # [H, nh]
        else:
            m1, m2 = _perlane_head_max(inc1, inc2, l1m, l2m, H, nh)
            m = jnp.maximum(ls, jnp.maximum(m1, m2))  # [H, nh]
        es = jnp.exp(ls - m)
        x1 = jnp.exp(l1m - _mm(inc1, m)) * pw        # [E, nh]
        x2 = jnp.exp(l2m - _mm(inc2, m)) * pw
        denom = es + _mm(inc1T, x1) + _mm(inc2T, x2)  # [H, nh]
        num = (_mm(es, rep) * zh
               + _mm(inc1T, _mm(x1, rep) * ze)
               + _mm(inc2T, _mm(x2, rep) * ze))      # [H, F]
        out_h = num / _mm(denom, rep)

        x = jnp.concatenate([leaky(out_h, slope),
                             leaky(out_e, slope)], axis=0)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "H", "E", "interpret"))
def _gat_megakernel(flat_inputs, cfg: MatcherConfig, H: int, E: int,
                    interpret: bool = False):
    """flat_inputs: [x_all [H+E, in_dim], pw [E, 1], inc1 [E, H], inc2,
    inc1T [H, E], inc2T, then per layer: w1, b1, w2, b2, alf [1, F],
    arf [1, F], seg [F, nh], rep [nh, F]].  Returns score logits [E, 1]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_layers = len(_layer_dims(cfg))

    def kernel(*refs):
        x_ref, pw_ref, inc1_ref, inc2_ref, inc1T_ref, inc2T_ref = refs[:6]
        lrefs = refs[6:-1]
        o_ref = refs[-1]
        layer_vals = [tuple(r[:] for r in lrefs[8 * l:8 * (l + 1)])
                      for l in range(n_layers)]
        o_ref[:] = gat_stack_values(
            x_ref[:], pw_ref[:], inc1_ref[:], inc2_ref[:],
            inc1T_ref[:], inc2T_ref[:], layer_vals, cfg, H)

    vmem = {} if interpret else {"memory_space": pltpu.VMEM}
    # the default scoped-VMEM cap is 16 MB; the whole stack (weights ~8 MB
    # fp32 + lane-padded activations/temporaries) measures ~38 MB after
    # Mosaic padding — well inside the v5e's 128 MB physical VMEM
    kw = {} if interpret else {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024)}
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((E, 1), jnp.float32),
        in_specs=[pl.BlockSpec(**vmem) for _ in flat_inputs],
        out_specs=pl.BlockSpec(**vmem),
        interpret=interpret,
        **kw,
    )(*flat_inputs)


def _static_tables(cfg: MatcherConfig):
    """Per-layer segment/broadcast matrices (host numpy, hashable id)."""
    tabs = []
    for (d_in, d_out, nh) in _layer_dims(cfg):
        F = nh * d_out
        seg = np.zeros((F, nh), np.float32)
        for h in range(nh):
            seg[h * d_out:(h + 1) * d_out, h] = 1.0
        tabs.append((seg, seg.T.copy()))
    return tabs


def gat_layer_arrays(params: Dict[str, Any], cfg: MatcherConfig):
    """Per-layer (w1, b1, w2, b2, alf, arf, seg, rep) array tuples in the
    kernel's expected shapes — shared by the megakernel wrapper below and
    the whole-frame kernel's operand packing (ops/frame_kernel.py)."""
    out = []
    for layer, (seg, rep), (d_in, d_out, nh) in zip(
            params["layers"], _static_tables(cfg), _layer_dims(cfg)):
        F = nh * d_out
        b1 = layer.get("b1", jnp.zeros((d_in,), jnp.float32))
        b2 = layer.get("b2", jnp.zeros((F,), jnp.float32))
        out.append((layer["w1"], b1.reshape(1, d_in),
                    layer["w2"], b2.reshape(1, F),
                    layer["attn_l"].reshape(1, F),
                    layer["attn_r"].reshape(1, F),
                    jnp.asarray(seg), jnp.asarray(rep)))
    return out


def apply_matcher_pallas(params: Dict[str, Any], head_feats: jnp.ndarray,
                         edge_feats: jnp.ndarray, topo,
                         pair_w: jnp.ndarray, cfg: MatcherConfig,
                         interpret: Optional[bool] = None) -> jnp.ndarray:
    """Drop-in inference replacement for `models.gat.apply_matcher`
    (no dropout / residual / duplicate flag — pass multiplicities via
    ``pair_w``).  Returns sigmoid scores [E]."""
    assert not cfg.residual, "pallas matcher: residual unsupported"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    H = int(head_feats.shape[0])
    E = int(edge_feats.shape[0])
    inc1 = np.asarray(topo.inc1, np.float32)
    inc2 = np.asarray(topo.inc2, np.float32)
    x_all = jnp.concatenate([head_feats, edge_feats], axis=0)
    flat = [x_all.astype(jnp.float32),
            jnp.asarray(pair_w, jnp.float32).reshape(E, 1),
            jnp.asarray(inc1), jnp.asarray(inc2),
            jnp.asarray(inc1.T.copy()), jnp.asarray(inc2.T.copy())]
    for layer, (seg, rep), (d_in, d_out, nh) in zip(
            params["layers"], _static_tables(cfg), _layer_dims(cfg)):
        F = nh * d_out
        b1 = layer.get("b1", jnp.zeros((d_in,), jnp.float32))
        b2 = layer.get("b2", jnp.zeros((F,), jnp.float32))
        flat += [layer["w1"], b1.reshape(1, d_in),
                 layer["w2"], b2.reshape(1, F),
                 layer["attn_l"].reshape(1, F),
                 layer["attn_r"].reshape(1, F),
                 jnp.asarray(seg), jnp.asarray(rep)]
    logits = _gat_megakernel(tuple(flat), cfg, H, E, interpret=interpret)
    return jax.nn.sigmoid(logits.reshape(-1))
