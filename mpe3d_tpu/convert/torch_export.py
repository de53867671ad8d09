"""Exporters to the reference's torch checkpoint formats — the inverse of
``torch_import`` (two-way interop: weights trained in this framework can go
back to the reference's torch/DGL stack).

Formats written (byte-layout mirrors what the reference code saves/loads):

  * ``pose_estimator.pytorch`` — ``{'model_state_dict': ...}`` whose keys
    follow the reference MLP's ``nn.Sequential`` indices: ``Flatten`` at 0,
    ``Linear`` at 1, 3, 5, … with activations between (reference
    ``utils/mlp.py:3-31``, saved at
    ``pose_estimator/train_pose_estimator.py:269-277``).
  * ``skeleton_matching.tch`` — raw GAT state_dict with
    ``layers.{l}.fc1/fc2/attn_l/attn_r`` (+ optional biases / ``res_fc``),
    attn tensors shaped ``[heads, d, 1]`` (reference ``gat2.py:17-48``,
    saved at ``train_skeleton_matching.py:229-230``).
  * ``skeleton_matching.prms`` — the hyperparameter pickle the reference
    dumps next to the weights (``train_skeleton_matching.py:230-246``),
    including the picklable torch activation objects.

torch stores Linear weights ``[out, in]``; ours are ``[in, out]`` → every
weight matrix is transposed on export (the exact inverse of the import).
"""

from __future__ import annotations

import pickle

import numpy as np

from mpe3d_tpu.config import LifterConfig, MatcherConfig


def _t(a):
    import torch
    # copy=True: jax buffers arrive as non-writable numpy views, which
    # torch.from_numpy warns about
    return torch.from_numpy(np.array(a, np.float32, copy=True, order="C"))


def export_reference_lifter(params, path: str,
                            cfg: LifterConfig | None = None) -> None:
    """Write lifter params as a ``pose_estimator.pytorch`` the reference's
    ``PoseEstimatorMLP`` can ``load_state_dict`` directly.

    ``cfg`` is required (the None default exists only so the error below
    names the argument): a residual-prior checkpoint's params are
    structurally identical to an absolute one's, so WITHOUT the config the
    guards below cannot fire and the export would strict-load into the
    reference model yet output corrections instead of poses."""
    import torch

    if cfg is None:
        raise ValueError(
            "export_reference_lifter requires cfg= (the checkpoint's "
            "LifterConfig, e.g. lifter_config_from_meta(read_meta(path))): "
            "residual_prior/negative_slope cannot be detected from params "
            "alone and exporting without checking them can produce a "
            "checkpoint that silently computes the wrong function in the "
            "reference stack.")
    if getattr(cfg, "residual_prior", False):
        raise ValueError(
            "residual-prior lifters have no reference counterpart: the "
            "torch MLP would output the *correction*, not poses.  Export "
            "is only meaningful for absolute-coordinate checkpoints.")
    if getattr(cfg, "negative_slope", 0.1) != 0.1:
        raise ValueError(
            "the reference PoseEstimatorMLP hardcodes "
            "LeakyReLU(negative_slope=0.1) (utils/mlp.py:7); a checkpoint "
            f"trained with slope {cfg.negative_slope} would silently "
            "compute a different function in the reference stack.")
    state = {}
    for i, layer in enumerate(params["layers"]):
        idx = 1 + 2 * i      # Flatten at 0, activations at even indices
        state[f"layers.{idx}.weight"] = _t(np.asarray(layer["w"]).T)
        state[f"layers.{idx}.bias"] = _t(layer["b"])
    torch.save({"model_state_dict": state}, path)


def export_reference_matcher(params, cfg: MatcherConfig, tch_path: str,
                             prms_path: str) -> None:
    """Write matcher params as ``skeleton_matching.tch`` + ``.prms``."""
    import torch

    state = {}
    for l, p in enumerate(params["layers"]):
        state[f"layers.{l}.fc1.weight"] = _t(np.asarray(p["w1"]).T)
        state[f"layers.{l}.fc2.weight"] = _t(np.asarray(p["w2"]).T)
        state[f"layers.{l}.attn_l"] = _t(np.asarray(p["attn_l"])[..., None])
        state[f"layers.{l}.attn_r"] = _t(np.asarray(p["attn_r"])[..., None])
        if "b1" in p:
            state[f"layers.{l}.fc1.bias"] = _t(p["b1"])
            state[f"layers.{l}.fc2.bias"] = _t(p["b2"])
        if "wr" in p:
            state[f"layers.{l}.res_fc.weight"] = _t(np.asarray(p["wr"]).T)
            if "br" in p:
                state[f"layers.{l}.res_fc.bias"] = _t(p["br"])
    torch.save(state, tch_path)

    prms = {
        "loss": 0.0,
        "net": "gat",
        "gnn_layers": len(cfg.hidden) + 1,
        "num_feats": int(cfg.in_dim),
        "num_hidden": [int(h) for h in cfg.hidden],
        "graph_type": "1",
        "n_classes": int(cfg.n_classes),
        "heads": [int(h) for h in cfg.heads],
        # the reference reconstructs its GAT with these objects, so the
        # trained slope must ride along (train_skeleton_matching.py:54
        # uses the torch default 0.01; non-default checkpoints keep theirs)
        "nonlinearity": torch.nn.LeakyReLU(
            negative_slope=float(cfg.hidden_slope)),
        "final_activation": torch.nn.Sigmoid(),
        "in_drop": float(cfg.feat_drop),
        "attn_drop": float(cfg.attn_drop),
        "alpha": float(cfg.alpha),
        "residual": bool(cfg.residual),
    }
    with open(prms_path, "wb") as f:
        pickle.dump(prms, f)
