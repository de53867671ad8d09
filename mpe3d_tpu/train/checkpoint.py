"""Checkpointing: params + optimizer state + metadata.

The reference saves torch ``state_dict``s (`skeleton_matching.tch` +
hyperparam pickle `.prms`, reference: train_skeleton_matching.py:229-246; a
full dict into `pose_estimator.pytorch`, reference:
train_pose_estimator.py:269-277).  Here checkpoints are a flat ``.npz`` of
the pytree leaves plus a JSON sidecar with the tree structure and
hyperparameters — dependency-free, memory-mappable, and safe to load without
arbitrary code execution (unlike pickles).

``mpe3d_tpu.convert.torch_import`` reads the reference's torch files for
parity evaluation.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _flatten(tree) -> Tuple[Dict[str, np.ndarray], Any]:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    flat = {f"leaf_{i:05d}": np.asarray(l) for i, l in enumerate(leaves)}
    return flat, treedef


def save_checkpoint(path: str, params, opt_state=None,
                    meta: Optional[Dict[str, Any]] = None) -> None:
    """Write `<path>.npz` (+ `<path>.json`).  ``meta`` values must be
    JSON-serialisable; dataclasses are expanded automatically."""
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    flat_p, _ = _flatten(params)
    arrays = {f"p.{k}": v for k, v in flat_p.items()}
    if opt_state is not None:
        flat_o, _ = _flatten(opt_state)
        arrays.update({f"o.{k}": v for k, v in flat_o.items()})
    np.savez(path + ".npz", **arrays)

    meta = dict(meta or {})
    for k, v in list(meta.items()):
        if dataclasses.is_dataclass(v):
            meta[k] = dataclasses.asdict(v)
    with open(path + ".json", "w") as f:
        json.dump(meta, f, indent=2, default=str)


def read_meta(path: str) -> Dict[str, Any]:
    """Read a checkpoint's JSON sidecar without touching the arrays (so a
    caller can reconstruct configs BEFORE building the load template)."""
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            return json.load(f)
    return {}


def lifter_config_from_meta(meta: Dict[str, Any], default):
    """Reconstruct the LifterConfig a checkpoint was trained with.

    Architecture-affecting fields saved in the meta (widths,
    residual_prior, …) override the caller's default — otherwise a
    checkpoint trained with e.g. ``residual_prior=True`` would load
    shape-compatibly but silently compute the wrong function.  Fields
    absent from old checkpoints keep the default (backwards compatible).
    """
    from mpe3d_tpu.config import LifterConfig

    d = dict(meta.get("lifter_config") or {})
    if not d:
        return default
    merged = {**dataclasses.asdict(default), **d}
    merged["widths"] = tuple(merged["widths"])
    return LifterConfig(**merged)


def matcher_config_from_meta(meta: Dict[str, Any], default):
    """Reconstruct the MatcherConfig a checkpoint was trained with (the
    matcher analog of ``lifter_config_from_meta``): architecture-affecting
    fields saved in the meta (hidden, heads, residual, …) override the
    caller's default — a checkpoint trained with ``residual=True`` must
    not be applied with the default config (it would load but compute the
    wrong function; reference: gat2.py:42-48,69-75).  Serving-only fields
    (use_pallas_proj) keep the caller's default.  Absent fields keep the
    default (old checkpoints)."""
    from mpe3d_tpu.config import MatcherConfig

    d = dict(meta.get("matcher_config") or {})
    if not d:
        return default
    d.pop("use_pallas_proj", None)          # serving knob, not architecture
    merged = {**dataclasses.asdict(default), **d}
    for k in ("hidden", "heads"):
        merged[k] = tuple(merged[k])
    return MatcherConfig(**merged)


def load_checkpoint(path: str, params_template, opt_state_template=None):
    """Load into the structure of the given templates (shape-checked).

    Returns (params, opt_state_or_None, meta)."""
    data = np.load(path + ".npz")
    meta = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)

    def unflatten(template, prefix):
        leaves, treedef = jax.tree_util.tree_flatten(template)
        new_leaves = []
        for i, l in enumerate(leaves):
            arr = data[f"{prefix}.leaf_{i:05d}"]
            if hasattr(l, "shape") and tuple(arr.shape) != tuple(l.shape):
                raise ValueError(
                    f"checkpoint leaf {i} shape {arr.shape} != template {l.shape}")
            new_leaves.append(arr)
        return jax.tree_util.tree_unflatten(treedef, new_leaves)

    params = unflatten(params_template, "p")
    opt_state = None
    if opt_state_template is not None and any(k.startswith("o.") for k in data):
        opt_state = unflatten(opt_state_template, "o")
    return params, opt_state, meta
