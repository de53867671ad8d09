"""Graph-attention matcher as dense masked attention over a static topology.

TPU-native re-implementation of the reference's DGL GAT (reference:
skeleton_matching/gat2.py:17-155).  The reference runs sparse
``edge_softmax`` + ``u_mul_e``/``sum`` C++/CUDA kernels over a dynamic graph;
here the alt-3 graph's rigid structure is exploited directly:

  * an edge-node's in-neighbours are exactly {itself, head1, head2}
    (reference: graph_generator.py:627-651) → a 3-way softmax, fully dense;
  * a head's in-neighbours are {itself} ∪ {incident edge-nodes}
    (reference: graph_generator.py:471-477) → a segment softmax implemented
    with *static incidence-matrix matmuls* (MXU) instead of scatter/gather.

Numerical semantics match DGL's edge_softmax exactly: per-destination softmax
over incoming edges, including self-loops.  The per-destination max-shift is
replaced by a single per-graph max — mathematically identical, cheaper on
TPU.

Layer semantics (reference gat2.py:50-88): shared fc1(in→in) + LeakyReLU(α)
then fc2(in→heads·out); attention logits LeakyReLU(α, a_l·z_src + a_r·z_dst);
between layers: flatten heads and LeakyReLU(0.01); output layer 1 head +
sigmoid (reference train_skeleton_matching.py:34,54,148).

Training parity note: the reference's training graphs instantiate every
unordered head pair TWICE (both orders; reference graph_generator.py:753-798)
while test graphs instantiate each once (:854-864).  Duplicated edge-nodes
are feature-identical, so their only effect is doubling each edge-node's
weight in the head softmax — reproduced exactly with ``duplicate_pairs=True``
(multiplies the exp contributions by 2) without materialising duplicates.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mpe3d_tpu.config import MatcherConfig
from mpe3d_tpu.matching.features import PairTopology

Params = Dict[str, Any]


class TopologyArrays(NamedTuple):
    """Topology constants for the attention kernels.

    Kept as host numpy so they inline as HLO literals when captured by a
    jitted program (captured *device* arrays go through the axon tunnel's
    slow hidden-parameter path; see geometry.camera.CameraRig)."""

    inc1: np.ndarray    # [E, H] one-hot of endpoint-1 head
    inc2: np.ndarray    # [E, H]

    @classmethod
    def from_topology(cls, topo: PairTopology) -> "TopologyArrays":
        return cls(topo.inc1, topo.inc2)


def _xavier_normal(key, shape, gain: float, dtype=jnp.float32):
    fan_in, fan_out = shape[0], shape[-1]
    if len(shape) == 3:                      # attn tensors [nh, d, 1]-style
        fan_in, fan_out = shape[-2], shape[-1]
    std = gain * (2.0 / (fan_in + fan_out)) ** 0.5
    return jax.random.normal(key, shape, dtype) * std


def _linear_bias(key, fan_in: int, shape, dtype=jnp.float32):
    bound = 1.0 / (fan_in ** 0.5)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _layer_dims(cfg: MatcherConfig):
    """(in_dim, out_dim, n_heads) per layer, reference gat2.py:100-135."""
    dims = []
    d_in = cfg.in_dim
    for l in range(len(cfg.hidden)):
        dims.append((d_in, cfg.hidden[l], cfg.heads[l]))
        d_in = cfg.hidden[l] * cfg.heads[l]
    dims.append((d_in, cfg.n_classes, 1))    # output layer, 1 head
    return dims


def init_matcher(key: jax.Array, cfg: MatcherConfig) -> Params:
    """Xavier-normal(gain=1.414) weights like the reference (gat2.py:37-40);
    torch-default uniform biases.  With ``cfg.residual`` every layer but the
    first gains a projection shortcut ``wr``/``br`` when its in/out widths
    differ (reference gat2.py:42-48,101-135: the input layer is always
    built with residual=False)."""
    layers = []
    gain = 1.414
    for li, (d_in, d_out, nh) in enumerate(_layer_dims(cfg)):
        key, k1, k2, k3, k4, k5, k6, k7, k8 = jax.random.split(key, 9)
        layer = {
            "w1": _xavier_normal(k1, (d_in, d_in), gain),
            "w2": _xavier_normal(k2, (d_in, nh * d_out), gain),
            "attn_l": _xavier_normal(k3, (nh, d_out, 1), gain)[..., 0],
            "attn_r": _xavier_normal(k4, (nh, d_out, 1), gain)[..., 0],
        }
        if cfg.bias:
            layer["b1"] = _linear_bias(k5, d_in, (d_in,))
            layer["b2"] = _linear_bias(k6, d_in, (nh * d_out,))
        if cfg.residual and li > 0 and d_in != d_out:
            layer["wr"] = _xavier_normal(k7, (d_in, nh * d_out), gain)
            if cfg.bias:
                layer["br"] = _linear_bias(k8, d_in, (nh * d_out,))
        layers.append(layer)
    return {"layers": layers}


def _residual_val(layer: Params, x: jnp.ndarray, nh: int,
                  d_out: int) -> jnp.ndarray:
    """Reference gat2.py:69-75: projection shortcut when widths differ,
    otherwise the (post-feat-drop) input broadcast over heads."""
    if "wr" in layer:
        r = jnp.dot(x, layer["wr"], precision="highest",
                    preferred_element_type=jnp.float32)
        if "br" in layer:
            r = r + layer["br"]
        return r.reshape(-1, nh, d_out)
    return x[:, None, :]


def _dropout(key, x: jnp.ndarray, rate: float) -> jnp.ndarray:
    """Inverted dropout, torch semantics (nn.Dropout: keep/(1-p))."""
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def _gat_layer(layer: Params, xh: jnp.ndarray, xe: jnp.ndarray,
               topo: TopologyArrays, pair_w: jnp.ndarray,
               nh: int, d_out: int, alpha: float,
               use_pallas: bool = False, residual: bool = False,
               drop_key=None, feat_drop: float = 0.0,
               attn_drop: float = 0.0,
               precision: str = "highest") -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One attention layer.  xh: [H, Din] head feats, xe: [E, Din] edge-node
    feats, pair_w: [E] softmax weight per pair (0 = absent, 2 = duplicated).
    Returns (out_h [H, nh, d_out], out_e [E, nh, d_out]).

    ``drop_key`` enables train-time dropout (reference gat2.py:27-34,50-52,
    83-88): feat_drop on the layer input before fc1, attn_drop on the
    NORMALISED attention coefficients (this DGL edge_softmax returns
    normalised scores; the reference drops them and aggregates WITHOUT
    renormalising — gat2.py:63-68).  ``residual`` adds the reference's
    shortcut (gat2.py:69-75) from the post-feat-drop input.

    Launch-count note: at serving sizes (H≈30 heads, E≈360 pairs) the
    matcher stage is fixed-overhead-bound, not FLOP-bound (RESULTS.md
    stage breakdown) — so heads+edges share ONE row-concatenated
    projection, all six endpoint gathers ride ONE [2E, H] incidence
    matmul, and the two per-endpoint softmax scatters collapse into one
    dot over the concatenated 2E axis.  Per-row results are identical to
    the unbatched form (row-block matmuls don't change each row's
    reduction); only the denominator/numerator K-concat reductions may
    differ in the last ulp."""
    H = xh.shape[0]
    E = xe.shape[0]

    if drop_key is not None and feat_drop > 0.0:
        kh, ke, drop_key = jax.random.split(drop_key, 3)
        xh = _dropout(kh, xh, feat_drop)
        xe = _dropout(ke, xe, feat_drop)

    # fp32 operands on the MXU ("highest") by default: the matcher is
    # latency-bound at serving, not FLOP-bound, and bf16 operand rounding
    # (TPU default) visibly moves scores near the 0.5 decision threshold.
    # cfg.matmul_precision="default" relaxes this for the training-
    # throughput configuration (bf16 operands, fp32 accumulate).
    mm = lambda a, b: jnp.dot(a, b, precision=precision,
                              preferred_element_type=jnp.float32)

    def proj(x):
        if use_pallas:
            from mpe3d_tpu.ops.fused_proj import fused_linear_leaky_linear
            z = fused_linear_leaky_linear(
                x, layer["w1"], layer.get("b1"), layer["w2"],
                layer.get("b2"), alpha, use_pallas=True)
            return z.reshape(-1, nh, d_out)
        h2 = mm(x, layer["w1"])
        if "b1" in layer:
            h2 = h2 + layer["b1"]
        h2 = jax.nn.leaky_relu(h2, alpha)
        z = mm(h2, layer["w2"])
        if "b2" in layer:
            z = z + layer["b2"]
        return z.reshape(-1, nh, d_out)

    # one projection + one attention einsum for heads AND edge-nodes
    z_all = proj(jnp.concatenate([xh, xe], axis=0))      # [H+E, nh, d]
    a_lr = jnp.stack([layer["attn_l"], layer["attn_r"]], axis=-1)
    att_all = jnp.einsum("nhd,hdk->nhk", z_all, a_lr,
                         precision=precision)            # [H+E, nh, 2]
    zh, ze = z_all[:H], z_all[H:]
    a1h, a2h = att_all[:H, :, 0], att_all[:H, :, 1]
    a1e, a2e = att_all[H:, :, 0], att_all[H:, :, 1]

    # endpoint gathers as ONE stacked incidence matmul (MXU-friendly):
    # rows 0:E are endpoint-1 values, rows E:2E endpoint-2
    inc_cat = np.concatenate([topo.inc1, topo.inc2], axis=0)     # [2E, H]
    zh_flat = zh.reshape(H, nh * d_out)
    nd = nh * d_out
    gath = mm(inc_cat, jnp.concatenate([zh_flat, a1h, a2h], axis=1))
    zh_e1 = gath[:E, :nd].reshape(E, nh, d_out)
    zh_e2 = gath[E:, :nd].reshape(E, nh, d_out)
    a1h_e1, a2h_e1 = gath[:E, nd:nd + nh], gath[:E, nd + nh:]
    a1h_e2, a2h_e2 = gath[E:, nd:nd + nh], gath[E:, nd + nh:]

    lrelu = lambda v: jax.nn.leaky_relu(v, alpha)

    # --- edge-node destinations: softmax over {self, head1, head2} ---------
    logits_e = jnp.stack([lrelu(a1e + a2e),
                          lrelu(a1h_e1 + a2e),
                          lrelu(a1h_e2 + a2e)], axis=-1)         # [E, nh, 3]
    att_e = jax.nn.softmax(logits_e, axis=-1)
    attn_active = drop_key is not None and attn_drop > 0.0
    if attn_active:
        ka_e, ka_h, drop_key = jax.random.split(drop_key, 3)
        att_e = _dropout(ka_e, att_e, attn_drop)
    out_e = (att_e[..., 0:1] * ze + att_e[..., 1:2] * zh_e1
             + att_e[..., 2:3] * zh_e2)                          # [E, nh, d]

    # --- head destinations: self + incident edge-nodes ---------------------
    # Both endpoints are processed as one [2E, ...] block: rows 0:E are the
    # e→head1 messages, rows E:2E the e→head2 messages.
    ls = lrelu(a1h + a2h)                                        # [H, nh]
    l12 = lrelu(jnp.concatenate([a1e + a2h_e1,
                                 a1e + a2h_e2], axis=0))         # [2E, nh]
    # exact per-destination max-shift (scatter-max over the incidence):
    # guarantees the max-achieving term is exp(0)=1 so the denominator can
    # never underflow to 0/0, no matter how sharp training makes the logits
    neg = jnp.asarray(-jnp.inf, ls.dtype)
    live12 = jnp.concatenate([pair_w, pair_w], axis=0)[:, None] > 0
    idx_cat = np.concatenate([np.argmax(topo.inc1, axis=1),
                              np.argmax(topo.inc2, axis=1)])     # [2E] static
    l12m = jnp.where(live12, l12, neg)                           # [2E, nh]
    m = jax.lax.stop_gradient(
        ls.at[jnp.asarray(idx_cat)].max(l12m))                   # [H, nh]
    es = jnp.exp(ls - m)                                         # [H, nh]
    # dead rows: l12m is -inf and m (gathered) is finite (ls is always a
    # finite candidate per head), so exp(-inf - finite) = 0 — no NaN path
    x12 = jnp.exp(l12m - mm(inc_cat, m)) \
        * jnp.concatenate([pair_w, pair_w], axis=0)[:, None]     # [2E, nh]
    denom = es + mm(inc_cat.T, x12)                              # [H, nh]
    ze2 = jnp.concatenate([ze, ze], axis=0)                      # [2E, nh, d]
    if attn_active:
        # normalised per-edge coefficients so attn_drop applies to the
        # edge_softmax OUTPUT (DGL semantics; no renormalisation after)
        cs = es / denom                                          # [H, nh]
        c12 = x12 / mm(inc_cat, denom)                           # [2E, nh]
        ks, k12 = jax.random.split(ka_h)
        cs = _dropout(ks, cs, attn_drop)
        c12 = _dropout(k12, c12, attn_drop)
        out_h = (cs[..., None] * zh
                 + mm(inc_cat.T, (c12[..., None] * ze2
                                  ).reshape(2 * E, nh * d_out)
                      ).reshape(H, nh, d_out))
    else:
        num = (es[..., None] * zh
               + mm(inc_cat.T, (x12[..., None] * ze2
                                ).reshape(2 * E, nh * d_out)
                    ).reshape(H, nh, d_out))
        out_h = num / denom[..., None]
    if residual:
        out_h = out_h + _residual_val(layer, xh, nh, d_out)
        out_e = out_e + _residual_val(layer, xe, nh, d_out)
    return out_h, out_e


def apply_matcher(params: Params, head_feats: jnp.ndarray,
                  edge_feats: jnp.ndarray, topo: TopologyArrays,
                  pair_mask: jnp.ndarray, cfg: MatcherConfig,
                  duplicate_pairs: bool = False,
                  pair_softmax_weight: jnp.ndarray = None,
                  dropout_key=None) -> jnp.ndarray:
    """Run the full GAT stack; returns sigmoid scores per candidate pair [E].

    head_feats: [H, in_dim]; edge_feats: [E, in_dim]; pair_mask: [E] 0/1.
    ``duplicate_pairs=True`` reproduces the reference training graphs'
    both-order edge-node duplication (see module docstring); for per-pair
    multiplicities (the reference instantiates real↔spurious pairs once but
    everything else twice, graph_generator.py:753-798) pass
    ``pair_softmax_weight`` [E] explicitly — it overrides both the mask and
    the duplicate flag in the head softmax.

    ``dropout_key``: train-mode PRNG key enabling cfg.feat_drop/attn_drop
    (None = eval mode, dropout off — torch model.eval() semantics).
    ``cfg.residual`` adds the reference's shortcut on every layer but the
    first (gat2.py:101-135).
    """
    if pair_softmax_weight is not None:
        pair_w = pair_softmax_weight
    else:
        pair_w = pair_mask * (2.0 if duplicate_pairs else 1.0)
    if cfg.use_pallas_matcher and dropout_key is None and not cfg.residual:
        # whole-stack VMEM-resident megakernel (inference serving path);
        # training (dropout) and residual stay on the XLA path
        from mpe3d_tpu.ops.gat_kernel import apply_matcher_pallas
        return apply_matcher_pallas(params, head_feats, edge_feats, topo,
                                    pair_w, cfg)
    if cfg.use_tiled_matcher and dropout_key is None and not cfg.residual:
        # grid-tiled stack: the crowded-bucket serving form (VMEM bounded
        # per edge block; ops/gat_tiled.py)
        from mpe3d_tpu.ops.gat_tiled import apply_matcher_tiled
        return apply_matcher_tiled(params, head_feats, edge_feats, topo,
                                   pair_w, cfg)
    dims = _layer_dims(cfg)
    xh, xe = head_feats, edge_feats
    n = len(dims)
    for l, (d_in, d_out, nh) in enumerate(dims):
        lkey = None
        if dropout_key is not None and (cfg.feat_drop > 0.0
                                        or cfg.attn_drop > 0.0):
            dropout_key, lkey = jax.random.split(dropout_key)
        oh, oe = _gat_layer(params["layers"][l], xh, xe, topo, pair_w,
                            nh, d_out, cfg.alpha,
                            use_pallas=cfg.use_pallas_proj,
                            residual=cfg.residual and l > 0,
                            drop_key=lkey, feat_drop=cfg.feat_drop,
                            attn_drop=cfg.attn_drop,
                            precision=getattr(cfg, "matmul_precision",
                                              "highest"))
        if l < n - 1:
            xh = jax.nn.leaky_relu(oh.reshape(-1, nh * d_out), cfg.hidden_slope)
            xe = jax.nn.leaky_relu(oe.reshape(-1, nh * d_out), cfg.hidden_slope)
        else:
            xe = oe.reshape(-1)                                  # [E]
    return jax.nn.sigmoid(xe)


def matcher_num_params(params: Params) -> int:
    return sum(int(v.size) for layer in params["layers"] for v in layer.values())
