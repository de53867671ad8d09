"""Calibration I/O.

The reference stores rig extrinsics as pickled ``pytransform3d``
``TransformManager`` objects (tm_panoptic.pickle / tm_arp.pickle, consumed at
skeleton_matching/graph_generator.py:32 and pose_estimator/train_pose_estimator.py:138).
We keep compatibility with those fixtures *without* depending on
pytransform3d: a stub unpickler materialises the stored ``transforms`` dict
({(from_frame, to_frame): 4×4}) and we resolve direct/inverse queries
ourselves.  A JSON-based native format is also provided.
"""

from __future__ import annotations

import json
import pickle
from typing import Dict, Optional, Tuple

import numpy as np

from mpe3d_tpu.config import RigConfig
from mpe3d_tpu.geometry.camera import CameraRig, intrinsics_from_rig_config, make_rig


class _Stub:
    """Placeholder for pytransform3d classes inside pickles."""

    def __init__(self, *args, **kwargs):
        pass

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:
            self.__dict__["_state"] = state


class _StubUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if module.startswith("pytransform3d"):
            return type(name, (_Stub,), {"__module__": module})
        return super().find_class(module, name)


class TransformSet:
    """Minimal transform graph: stores (from, to) -> 4×4 and answers
    ``get_transform`` queries like pytransform3d for the rigs we care about
    (star topology around 'root')."""

    def __init__(self, transforms: Dict[Tuple[str, str], np.ndarray]):
        self.transforms = {k: np.asarray(v, np.float64) for k, v in transforms.items()}

    def get_transform(self, from_frame: str, to_frame: str,
                      _visited: Optional[frozenset] = None) -> np.ndarray:
        if (from_frame, to_frame) in self.transforms:
            return self.transforms[(from_frame, to_frame)]
        if (to_frame, from_frame) in self.transforms:
            return np.linalg.inv(self.transforms[(to_frame, from_frame)])
        # multi-hop composition through shared frames; the visited set
        # bounds the recursion — without it an unreachable (mistyped)
        # frame or a cyclic graph recurses forever instead of KeyError
        visited = (_visited or frozenset()) | {from_frame}
        for (a, b), T_ab in self.transforms.items():
            if a == from_frame and b not in visited:
                try:
                    return self.get_transform(b, to_frame, visited) @ T_ab
                except KeyError:
                    continue
            if b == from_frame and a not in visited:
                try:
                    return (self.get_transform(a, to_frame, visited)
                            @ np.linalg.inv(T_ab))
                except KeyError:
                    continue
        raise KeyError(f"No transform {from_frame} -> {to_frame}")

    # ---- serialisation -------------------------------------------------
    def to_json(self) -> str:
        # list-based pairs: frame names may contain spaces (the legacy
        # '"a b"' dict keys could not round-trip those)
        return json.dumps({"transforms": [[a, b, T.tolist()]
                           for (a, b), T in self.transforms.items()]})

    @classmethod
    def from_json(cls, text: str) -> "TransformSet":
        raw = json.loads(text)
        if isinstance(raw, dict) and "transforms" in raw:
            return cls({(a, b): np.array(T)
                        for a, b, T in raw["transforms"]})
        # legacy format: {"a b": T} — only valid for space-free names
        return cls({tuple(k.split(" ")): np.array(v)
                    for k, v in raw.items()})


def load_transform_manager(path: str) -> TransformSet:
    """Load a pytransform3d TransformManager pickle (or our JSON format)
    into a TransformSet."""
    if str(path).endswith(".json"):
        with open(path) as f:
            return TransformSet.from_json(f.read())
    with open(path, "rb") as f:
        tm = _StubUnpickler(f).load()
    transforms = getattr(tm, "transforms", None)
    if transforms is None:
        raise ValueError(f"{path} does not look like a TransformManager pickle")
    return TransformSet(dict(transforms))


def rig_from_files(rig_config: RigConfig, tm_path: str) -> CameraRig:
    """Build the dense CameraRig buffers from a RigConfig + calibration file.

    Direct transform = tm.get_transform('root', cam) (world→camera), inverse
    = its inverse, exactly as the reference loads them
    (reference: skeleton_matching/graph_generator.py:39-52)."""
    ts = load_transform_manager(tm_path)
    T_wc = np.stack([ts.get_transform("root", cam) for cam in rig_config.camera_names])
    K, dist = intrinsics_from_rig_config(rig_config)
    return make_rig(K, dist, T_wc,
                    (rig_config.image_width, rig_config.image_height))
