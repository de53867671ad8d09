"""Checkpointing: params + optimizer state + metadata.

The reference saves torch ``state_dict``s (`skeleton_matching.tch` +
hyperparam pickle `.prms`, reference: train_skeleton_matching.py:229-246; a
full dict into `pose_estimator.pytorch`, reference:
train_pose_estimator.py:269-277).  Here checkpoints are a flat ``.npz`` of
the pytree leaves plus a JSON sidecar with the tree structure and
hyperparameters — dependency-free, memory-mappable, and safe to load without
arbitrary code execution (unlike pickles).

A second backend (``backend="orbax"``) saves the same flat leaf dict through
``orbax.checkpoint`` into ``<path>.orbax/`` — the TPU-idiomatic path:
*async* (the device→host transfer and file write run on a background thread
while training keeps dispatching; pulling the 116 MB lifter tree through a
remote-TPU relay measured 26 s per synchronous save) and *sharded-aware*
(``jax.Array`` shards are written per-device without a host gather, so
multi-chip training checkpoints scale).  Both backends share the JSON meta
sidecar; ``load_checkpoint`` auto-detects the format on disk.

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


def _json_default(o):
    # numpy scalars serialise as numbers (default=str would stringify a
    # np.float32 val_loss), everything else falls back to str
    if isinstance(o, np.floating):
        return float(o)
    if isinstance(o, np.integer):
        return int(o)
    return str(o)


def _write_meta(path: str, meta: Optional[Dict[str, Any]]) -> None:
    meta = dict(meta or {})
    for k, v in list(meta.items()):
        if dataclasses.is_dataclass(v):
            meta[k] = dataclasses.asdict(v)
    with open(path + ".json", "w") as f:
        json.dump(meta, f, indent=2, default=_json_default)


def save_checkpoint(path: str, params, opt_state=None,
                    meta: Optional[Dict[str, Any]] = None,
                    backend: str = "npz", wait: bool = True) -> None:
    """Write a checkpoint at ``path`` (+ `<path>.json` meta sidecar).
    ``meta`` values must be JSON-serialisable; dataclasses are expanded
    automatically.

    ``backend="npz"``: synchronous flat `<path>.npz` (host arrays).
    ``backend="orbax"``: `<path>.orbax/` directory via orbax — leaves may be
    live (even sharded) ``jax.Array``s; with ``wait=False`` the save runs
    asynchronously (call :func:`wait_for_async_saves` before reading it
    back or exiting)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    if backend == "orbax":
        _save_orbax(path, params, opt_state, wait=wait)
    elif backend == "npz":
        flat_p, _ = _flatten(params)
        arrays = {f"p.{k}": v for k, v in flat_p.items()}
        if opt_state is not None:
            flat_o, _ = _flatten(opt_state)
            arrays.update({f"o.{k}": v for k, v in flat_o.items()})
        np.savez(path + ".npz", **arrays)
    else:
        raise ValueError(f"unknown checkpoint backend: {backend!r}")
    _write_meta(path, meta)


# ---------------------------------------------------------------------------
# orbax backend
# ---------------------------------------------------------------------------

_ORBAX_CKPTR = None


def _orbax_checkpointer():
    """Process-wide AsyncCheckpointer (it owns a background thread pool;
    one per process is the intended usage)."""
    global _ORBAX_CKPTR
    if _ORBAX_CKPTR is None:
        import orbax.checkpoint as ocp
        _ORBAX_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ORBAX_CKPTR


def _flat_leaves(tree, prefix: str) -> Dict[str, Any]:
    """Flat {name: leaf} dict WITHOUT host conversion — device (sharded)
    arrays pass straight through to orbax, which writes each shard from
    its own device."""
    leaves, _ = jax.tree_util.tree_flatten(tree)
    return {f"{prefix}.leaf_{i:05d}": l for i, l in enumerate(leaves)}


def _save_orbax(path: str, params, opt_state=None, wait: bool = True) -> None:
    import orbax.checkpoint as ocp

    flat = _flat_leaves(params, "p")
    if opt_state is not None:
        flat.update(_flat_leaves(opt_state, "o"))
    ckptr = _orbax_checkpointer()
    # serialise with any in-flight save of the same path (force=True
    # replaces the previous version atomically: tmp dir + rename)
    ckptr.wait_until_finished()
    ckptr.save(os.path.abspath(path) + ".orbax",
               args=ocp.args.StandardSave(flat), force=True)
    if wait:
        ckptr.wait_until_finished()


def wait_for_async_saves() -> None:
    """Block until every async orbax save issued by this process has
    committed (no-op when none were)."""
    if _ORBAX_CKPTR is not None:
        _ORBAX_CKPTR.wait_until_finished()


def checkpoint_exists(path: str) -> bool:
    """True if either backend's artifact is present at ``path``."""
    return os.path.exists(path + ".npz") or os.path.isdir(path + ".orbax")


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
    Auto-detects the on-disk backend: `<path>.npz`, else `<path>.orbax/`.

    Returns (params, opt_state_or_None, meta)."""
    if os.path.exists(path + ".npz"):
        data = np.load(path + ".npz")
    elif os.path.isdir(path + ".orbax"):
        data = _load_orbax_flat(path, params_template, opt_state_template)
    else:
        raise FileNotFoundError(f"no checkpoint at {path} "
                                f"(.npz or .orbax/)")
    meta = read_meta(path)

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


def _load_orbax_flat(path: str, params_template, opt_state_template):
    """Restore the flat {name: array} dict from `<path>.orbax/`, shaped by
    the templates.  Template leaves that carry a ``.sharding`` (live mesh
    arrays / ShapeDtypeStructs with sharding) restore sharded in place;
    plain numpy templates restore host-side."""
    import orbax.checkpoint as ocp

    def abstract(tree, prefix):
        out = {}
        for k, l in _flat_leaves(tree, prefix).items():
            sharding = getattr(l, "sharding", None)
            out[k] = jax.ShapeDtypeStruct(
                np.shape(l), np.asarray(l).dtype if not hasattr(l, "dtype")
                else l.dtype, sharding=sharding)
        return out

    full = os.path.abspath(path) + ".orbax"
    ckptr = _orbax_checkpointer()
    ckptr.wait_until_finished()
    saved_keys = set(ckptr.metadata(full).item_metadata.tree.keys())
    tmpl = abstract(params_template, "p")
    if opt_state_template is not None and any(k.startswith("o.")
                                              for k in saved_keys):
        tmpl.update(abstract(opt_state_template, "o"))
    missing = set(tmpl) - saved_keys
    if missing:
        raise ValueError(f"checkpoint {full} lacks template leaves "
                         f"{sorted(missing)[:4]}…")
    return ckptr.restore(full, args=ocp.args.StandardRestore(tmpl))
