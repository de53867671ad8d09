"""No-DGL torch replica of the reference matcher (GraphAttention2/GAT2).

Behavioral mirror of reference skeleton_matching/gat2.py:17-155 — the
same fc1 → LeakyReLU → fc2 projection, per-destination edge_softmax over
an explicit (src, dst) edge list, residual shortcut and inter-layer
LeakyReLU — written against torch only (the reference's DGL runtime is
not available in this environment, and its edge_softmax/SpMM semantics
are what this replica reproduces by explicit per-destination loops).

Used for weight-level golden parity: a state_dict saved from this model
is key-compatible with the reference's ``skeleton_matching.tch`` layout
(same ``layers.{l}.fc1/fc2/attn_l/attn_r/res_fc`` names), so
``convert.torch_import.load_reference_matcher`` round-trips through it,
and its forward scores are the oracle our jax ``apply_matcher`` is
asserted against (tests/test_golden_reference.py,
scripts/reference_weight_parity.py).

torch (CPU) is an optional dependency — imported inside the builders.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def build_gat2_replica(in_dim: int, hidden: Sequence[int],
                       heads: Sequence[int], alpha: float = 0.15,
                       residual: bool = False, hidden_slope: float = 0.01):
    """Construct the torch replica module (fresh xavier init, seedable
    with torch.manual_seed before the call)."""
    import torch
    import torch.nn.functional as F
    from torch import nn

    class Layer(nn.Module):
        def __init__(self, din, dout, nh, res):
            super().__init__()
            self.fc1 = nn.Linear(din, din, bias=True)
            self.fc2 = nn.Linear(din, nh * dout, bias=True)
            self.attn_l = nn.Parameter(torch.empty(nh, dout, 1))
            self.attn_r = nn.Parameter(torch.empty(nh, dout, 1))
            for p in (self.fc1.weight, self.fc2.weight,
                      self.attn_l, self.attn_r):
                nn.init.xavier_normal_(p.data, gain=1.414)
            self.nh, self.dout = nh, dout
            if res and din != dout:
                self.res_fc = nn.Linear(din, nh * dout, bias=True)
                nn.init.xavier_normal_(self.res_fc.weight.data, gain=1.414)
            self.residual = res

        def forward(self, x, src, dst):
            N = x.shape[0]
            z = self.fc2(F.leaky_relu(self.fc1(x), alpha)).reshape(
                N, self.nh, self.dout)
            a1 = torch.einsum("nhd,hd->nh", z, self.attn_l[..., 0])
            a2 = torch.einsum("nhd,hd->nh", z, self.attn_r[..., 0])
            logits = F.leaky_relu(a1[src] + a2[dst], alpha)   # [Et, nh]
            out = torch.zeros_like(z)
            for d in sorted(set(dst)):             # per-dst edge_softmax
                sel = [k for k, dd in enumerate(dst) if dd == d]
                att = torch.softmax(logits[sel], dim=0)       # [k, nh]
                out[d] = torch.einsum("kh,khd->hd", att,
                                      z[[src[k] for k in sel]])
            if self.residual:
                if hasattr(self, "res_fc"):
                    out = out + self.res_fc(x).reshape(N, self.nh,
                                                       self.dout)
                else:
                    out = out + x.unsqueeze(1)
            return out

    class GAT2Replica(nn.Module):
        def __init__(self):
            super().__init__()
            dims, d_in = [], in_dim
            for l in range(len(hidden)):
                dims.append((d_in, hidden[l], heads[l]))
                d_in = hidden[l] * heads[l]
            dims.append((d_in, 1, 1))
            self.dims = dims
            self.layers = nn.ModuleList(
                [Layer(din, dout, nh, residual and li > 0)
                 for li, (din, dout, nh) in enumerate(dims)])

        def forward(self, x, src, dst):
            h = x
            for li, (din, dout, nh) in enumerate(self.dims):
                out = self.layers[li](h, src, dst)
                if li < len(self.dims) - 1:
                    h = F.leaky_relu(out.reshape(len(x), nh * dout),
                                     hidden_slope)
                else:
                    h = out.reshape(len(x))
            return torch.sigmoid(h)

    return GAT2Replica()


def build_real_graph(topo, head_mask: np.ndarray, pair_mask: np.ndarray
                     ) -> Tuple[np.ndarray, List[int], List[int],
                                List[int], int]:
    """The DGL-style graph the reference builds: only REAL (present)
    heads and live pairs exist as nodes; edges are self-loops plus the
    head↔edge-node incidences both ways and the edge-node self edge
    (reference graph_generator.py alt-3 wiring).

    Returns (node order [real heads..., live pair positions...],
    src, dst, live pair indices, n_real_heads)."""
    real_heads = np.nonzero(head_mask)[0]
    remap = {int(h): i for i, h in enumerate(real_heads)}
    real_pairs = [k for k in range(len(pair_mask)) if pair_mask[k] > 0]
    H = len(real_heads)
    src, dst = [], []
    for h in range(H):
        src.append(h)
        dst.append(h)
    for i, k in enumerate(real_pairs):
        e = H + i
        h1, h2 = remap[int(topo.e1[k])], remap[int(topo.e2[k])]
        for s, d in ((h1, e), (e, h1), (h2, e), (e, h2), (e, e)):
            src.append(s)
            dst.append(d)
    return real_heads, src, dst, real_pairs, H
