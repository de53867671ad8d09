"""Importers for the reference's torch checkpoint files.

Enables running parity metrics against the reference's released weights
(SURVEY.md §5 checkpoint plan):

  * ``load_reference_lifter``   ← ``pose_estimator.pytorch`` — a dict with
    'model_state_dict' of the 9-Linear MLP (reference:
    pose_estimator/train_pose_estimator.py:269-277, utils/mlp.py:3-31)
  * ``load_reference_matcher``  ← ``skeleton_matching.tch`` state_dict +
    ``skeleton_matching.prms`` hyperparameter pickle (reference:
    train_skeleton_matching.py:229-246, gat2.py:17-135)

torch stores Linear weights as [out, in]; our params are [in, out] → all
weight matrices are transposed on import.  torch (CPU) is an optional
dependency: these functions raise ImportError cleanly without it.
"""

from __future__ import annotations

import pickle
from typing import Dict, Tuple

import numpy as np

from mpe3d_tpu.config import LifterConfig, MatcherConfig


def _torch_load(path: str):
    import torch
    return torch.load(path, map_location="cpu", weights_only=False)


def load_reference_lifter(path: str) -> Tuple[Dict, LifterConfig]:
    """Read ``pose_estimator.pytorch`` into lifter params + config."""
    saved = _torch_load(path)
    state = saved.get("model_state_dict", saved)
    # keys look like 'layers.1.weight' (reference wraps a Sequential in
    # self.layers) or bare '1.weight'; the integer is the Sequential index
    weights = {}
    for k, v in state.items():
        parts = k.split(".")
        idx = int(parts[-2])
        weights.setdefault(idx, {})[parts[-1]] = v.detach().numpy()
    layer_indices = sorted(weights)
    layers = []
    dims = []
    for i in layer_indices:
        w = weights[i]["weight"]          # [out, in]
        b = weights[i]["bias"]
        layers.append({"w": np.ascontiguousarray(w.T.astype(np.float32)),
                       "b": b.astype(np.float32)})
        dims.append(w.shape)
    cfg = LifterConfig(in_dim=dims[0][1], out_dim=dims[-1][0],
                       widths=tuple(d[0] for d in dims[:-1]))
    return {"layers": layers}, cfg


def load_reference_matcher(tch_path: str, prms_path: str
                           ) -> Tuple[Dict, MatcherConfig]:
    """Read ``skeleton_matching.tch`` + ``.prms`` into matcher params +
    config.  The .prms pickle may reference torch classes (nonlinearity /
    final_activation objects) — loaded with torch available."""
    try:
        with open(prms_path, "rb") as f:
            prms = pickle.load(f)
    except Exception:
        import torch  # noqa: F401 — classes inside the pickle
        with open(prms_path, "rb") as f:
            prms = pickle.load(f)
    state = _torch_load(tch_path)

    cfg = MatcherConfig(
        in_dim=int(prms["num_feats"]),
        hidden=tuple(int(h) for h in prms["num_hidden"]),
        heads=tuple(int(h) for h in prms["heads"]),
        n_classes=int(prms["n_classes"]),
        alpha=float(prms["alpha"]),
        residual=bool(prms["residual"]),
        feat_drop=float(prms.get("in_drop", 0.0)),
        attn_drop=float(prms.get("attn_drop", 0.0)),
        # inter-layer activation: the reference pickles the torch module
        # itself (train_skeleton_matching.py:54,239) — carry its slope
        hidden_slope=float(getattr(prms.get("nonlinearity"),
                                   "negative_slope", 0.01)),
    )
    n_layers = len(cfg.hidden) + 1
    layers = []
    for l in range(n_layers):
        p = {
            "w1": np.ascontiguousarray(
                state[f"layers.{l}.fc1.weight"].numpy().T.astype(np.float32)),
            "w2": np.ascontiguousarray(
                state[f"layers.{l}.fc2.weight"].numpy().T.astype(np.float32)),
            # attn tensors are [nh, d, 1] in torch → [nh, d]
            "attn_l": state[f"layers.{l}.attn_l"].numpy()[..., 0]
            .astype(np.float32),
            "attn_r": state[f"layers.{l}.attn_r"].numpy()[..., 0]
            .astype(np.float32),
        }
        if f"layers.{l}.fc1.bias" in state:
            p["b1"] = state[f"layers.{l}.fc1.bias"].numpy().astype(np.float32)
            p["b2"] = state[f"layers.{l}.fc2.bias"].numpy().astype(np.float32)
        # residual projection shortcut (reference gat2.py:42-48)
        if f"layers.{l}.res_fc.weight" in state:
            p["wr"] = np.ascontiguousarray(
                state[f"layers.{l}.res_fc.weight"].numpy().T
                .astype(np.float32))
            if f"layers.{l}.res_fc.bias" in state:
                p["br"] = state[f"layers.{l}.res_fc.bias"].numpy() \
                    .astype(np.float32)
        layers.append(p)
    return {"layers": layers}, cfg
