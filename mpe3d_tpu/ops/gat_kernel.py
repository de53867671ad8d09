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


def gat_stack_values(x, pw, inc1, inc2, inc1T, inc2T, layer_vals,
                     cfg: MatcherConfig, H: int):
    """The whole GAT stack on in-register/VMEM VALUES — shared by the
    matcher megakernel below and the whole-frame kernel
    (ops/frame_kernel.py), so their scores are identical by construction.

    x: [H+E, Din]; pw: [E, 1]; inc1/inc2: [E, H]; inc1T/inc2T: [H, E];
    ``layer_vals``: per layer (w1, b1, w2, b2, alf, arf, seg, rep) values.
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
        (w1, b1, w2, b2, alf, arf, seg, rep) = layer_vals[l]
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

        # head destinations: self + incident edge-nodes (exact
        # per-destination max-shift).  Two forms, bit-identical (same
        # elements reduced):
        #   * small buckets: ONE rank-3 masked max per incidence — fewer
        #     serial ops than the per-head loop;
        #   * large buckets: the per-head unrolled loop — the rank-3
        #     temporary lane-pads nh→128 (H·E·128·4 B per incidence,
        #     25.6 MB at S=10), so the loop is kept as the defensive
        #     form there.  Measured (scripts/check_frame_kernel_buckets
        #     .py): at S=10 Mosaic's scoped-VMEM demand is ~identical
        #     under both forms (195 MB megakernel / 142 MB frame kernel
        #     — over the 128 MB part either way, probe → XLA fallback),
        #     so the gate costs nothing and protects nothing measurable
        #     today; it matters if scheduling improves.
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
            rows = []
            for h in range(H):
                m1 = jnp.max(jnp.where(inc1[:, h:h + 1] > 0, l1m, neg),
                             axis=0, keepdims=True)  # [1, nh]
                m2 = jnp.max(jnp.where(inc2[:, h:h + 1] > 0, l2m, neg),
                             axis=0, keepdims=True)
                rows.append(jnp.maximum(ls[h:h + 1],
                                        jnp.maximum(m1, m2)))
            m = jnp.concatenate(rows, axis=0)        # [H, nh]
        es = jnp.exp(ls - m)
        x1 = jnp.exp(l1m - _mm(inc1, m)) * pw        # [E, nh]
        x2 = jnp.exp(l2m - _mm(inc2, m)) * pw
        denom = es + _mm(inc1T, x1) + _mm(inc2T, x2)  # [H, nh]
        num = (_mm(es, rep) * zh
               + _mm(inc1T, _mm(x1, rep) * ze)
               + _mm(inc2T, _mm(x2, rep) * ze))      # [H, F]
        out_h = num / _mm(denom, rep)

        if l < n_layers - 1:
            x = jnp.concatenate([leaky(out_h, slope),
                                 leaky(out_e, slope)], axis=0)
        else:
            return out_e                             # [E, 1] logits


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
