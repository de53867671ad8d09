"""CMU Panoptic dataset conversor — offline 2D-detection generator.

Re-implements the reference's conversor pipeline (reference:
panoptic_conversor/get_joints_from_panoptic_model{,_multi}.py:84-309) with
the jax PoseResNet backbone (convert/pose_resnet.py) and jax peak finding
(convert/peaks.py) instead of torch + trt_pose CUDA plugins:

  per HD frame per camera:
    image → resize 960×512 → ImageNet-normalize → heatmaps [18, 128, 240]
    → find/refine peaks → scale to camera resolution
    GT 19-joint 3D → project with the Panoptic-toolbox distortion model
    → associate detections↔projections by nearest neighbour
    → per-person skeleton dicts → wire-format JSON
      (single: one entry per person per frame — training format;
       multi: one entry per frame with all people + GT — test format)

Also writes the calibration transform set (root→camera, translation /100
cm→m; reference :111-120) as JSON and as a pickle loadable by
geometry.calib_io.load_transform_manager.
"""

from __future__ import annotations

import json
import os
import pickle
import time
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from mpe3d_tpu.geometry.calib_io import TransformSet

# COCO-19 (Panoptic) → COCO-18 joint id remap; index 2 (bodyCenter) maps to
# the '-1' validity marker (reference: get_joints_from_panoptic_model_multi.py:
# 124-143)
COCO19_TO_COCO18 = {0: 17, 1: 0, 3: 5, 4: 7, 5: 9, 6: 11, 7: 13, 8: 15,
                    9: 6, 10: 8, 11: 10, 12: 12, 13: 14, 14: 16, 15: 1,
                    16: 3, 17: 2, 18: 4}
BODY_CENTER = 2

DEFAULT_NODES = (3, 6, 12, 13, 23)   # HD cameras of panel 0 (reference :108-112)
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
MODEL_INPUT = (960, 512)             # (W, H), reference :42


def project_points_panoptic(X: np.ndarray, K: np.ndarray, R: np.ndarray,
                            t: np.ndarray, Kd: np.ndarray) -> np.ndarray:
    """Panoptic-toolbox projection (≙ panutils.projectPoints): K applied with
    skew, and the toolbox's in-place aliasing reproduced exactly — the y
    tangential term and the K row-1 skew use the already-distorted x.

    X: [3, N] world (dataset frame, cm).  Returns [2, N] pixels.
    """
    x = R @ X + t.reshape(3, 1)
    x = np.asarray(x, np.float64).copy()
    x[0] /= x[2]
    x[1] /= x[2]
    r = x[0] ** 2 + x[1] ** 2
    f = 1 + Kd[0] * r + Kd[1] * r * r + Kd[4] * r ** 3
    x[0] = x[0] * f + 2 * Kd[2] * x[0] * x[1] + Kd[3] * (r + 2 * x[0] ** 2)
    x[1] = x[1] * f + 2 * Kd[3] * x[0] * x[1] + Kd[2] * (r + 2 * x[1] ** 2)
    u = K[0, 0] * x[0] + K[0, 1] * x[1] + K[0, 2]
    v = K[1, 0] * u + K[1, 1] * x[1] + K[1, 2]
    return np.stack([u, v])


def load_calibration(seq_dir: str) -> Dict[Tuple[int, int], Dict]:
    """Read calibration_<seq>.json → {(panel, node): camera dict} with numpy
    K/R/t/distCoef (reference :93-105)."""
    seq = seq_dir.rstrip("/").split("/")[-1]
    with open(os.path.join(seq_dir, f"calibration_{seq}.json")) as f:
        calib = json.load(f)
    cams = {}
    for cam in calib["cameras"]:
        cam = dict(cam)
        cam["K"] = np.asarray(cam["K"], np.float64)
        cam["R"] = np.asarray(cam["R"], np.float64)
        cam["t"] = np.asarray(cam["t"], np.float64).reshape(3, 1)
        cam["distCoef"] = np.asarray(cam["distCoef"], np.float64)
        cams[(cam["panel"], cam["node"])] = cam
    return cams


def selected_tracker_cameras(cams: Dict, nodes: Sequence[int] = DEFAULT_NODES
                             ) -> Dict[str, Dict]:
    """Panel-0 HD cameras → trackera.. names (reference :107-112)."""
    letters = "abcdefghijklmnopqrstuvwxyz"
    return {f"tracker{letters[i]}": cams[(0, n)]
            for i, n in enumerate(nodes)}


def write_transform_set(selected: Dict[str, Dict], out_path: str
                        ) -> TransformSet:
    """root→camera transforms with cm→m translation (reference :115-120).
    Writes both `<out>.json` and `<out>.pickle` (a pickled TransformSet,
    loadable by geometry.calib_io)."""
    transforms = {}
    for name, cam in selected.items():
        T = np.eye(4)
        T[:3, :3] = cam["R"]
        T[:3, 3] = cam["t"][:, 0] / 100.0
        transforms[("root", name)] = T
    ts = TransformSet(transforms)
    with open(out_path + ".json", "w") as f:
        f.write(ts.to_json())
    with open(out_path + ".pickle", "wb") as f:
        pickle.dump(ts, f)
    return ts


# ---------------------------------------------------------------------------
# 2D detection
# ---------------------------------------------------------------------------


class Detector2D:
    """jit-compiled heatmap detector: image → per-joint peak lists."""

    def __init__(self, params, cmap_threshold: float = 0.15,
                 window: int = 5, max_peaks: int = 100):
        import jax
        import jax.numpy as jnp

        from mpe3d_tpu.convert.peaks import find_peaks, refine_peaks
        from mpe3d_tpu.convert.pose_resnet import apply_pose_resnet

        @jax.jit
        def run(p, img):
            """img: [H, W, 3] uint8 RGB already at MODEL_INPUT size."""
            x = img.astype(jnp.float32) / 255.0
            x = (x - IMAGENET_MEAN) / IMAGENET_STD
            hm = apply_pose_resnet(p, x[None])[0]           # [h, w, J]
            cmap = jnp.transpose(hm, (2, 0, 1))             # [J, h, w]
            counts, peaks = find_peaks(cmap, cmap_threshold, window,
                                       max_peaks)
            norm = refine_peaks(peaks, cmap, window)        # [J, K, 2] (x, y)
            return counts, norm

        self._run = run
        self.params = params

    def __call__(self, image_rgb: np.ndarray,
                 resolution: Tuple[int, int]) -> Dict[int, List[List[float]]]:
        """image_rgb: [H, W, 3] uint8 (any size).  Returns COCO-18 joint id →
        list of [x, y] in *camera-resolution* pixels (reference :248-262)."""
        import cv2
        import jax.numpy as jnp

        img = cv2.resize(image_rgb, MODEL_INPUT)
        counts, norm = self._run(self.params, jnp.asarray(img))
        counts = np.asarray(counts)
        norm = np.asarray(norm)
        W, H = resolution
        out: Dict[int, List[List[float]]] = {}
        for j19, n in enumerate(counts):
            if j19 == BODY_CENTER or j19 >= 19:
                continue
            # channel j IS COCO-19 joint j for j in 0..17 (the reference
            # enumerates peaks the same way and skips j==2/bodyCenter,
            # get_joints_from_panoptic_model.py:239-243).  QUIRK shared
            # with the reference: the 18-channel backbone has no channel
            # for COCO-19 joint 18 (right ear), so that joint is never
            # detected by either implementation.
            j18 = COCO19_TO_COCO18.get(j19)
            if j18 is None:
                continue
            pts = [[float(norm[j19, k, 0] * W), float(norm[j19, k, 1] * H)]
                   for k in range(int(n))]
            if pts:
                out[j18] = pts
        return out


# ---------------------------------------------------------------------------
# detection ↔ GT association + emission
# ---------------------------------------------------------------------------


def project_gt_people(bodies: List[Dict], cam: Dict,
                      conf_threshold: float = 0.1
                      ) -> Tuple[Dict, Dict]:
    """Project each GT body into the view (reference :203-243).

    Returns (projected {person: {joint18: [id, x, y, 1, 1]}},
             joints3d {person: {joint18 or '-1': [x, y, z] cm}}).
    """
    W, H = cam["resolution"]
    projected, joints3d = {}, {}
    for body in bodies:
        pid = body["id"]
        skel = np.asarray(body["joints19"], np.float64).reshape(-1, 4).T
        pts = project_points_panoptic(skel[0:3], cam["K"], cam["R"],
                                      cam["t"], cam["distCoef"]).T
        valid = skel[3] > conf_threshold
        kps, j3d = {}, {}
        for i, (x, y) in enumerate(pts):
            if not valid[i]:
                continue
            key = "-1" if i == BODY_CENTER else str(COCO19_TO_COCO18[i])
            j3d[key] = [float(skel[0, i]), float(skel[1, i]),
                        float(skel[2, i])]
            if i == BODY_CENTER or x < 0 or x >= W or y < 0 or y >= H:
                continue
            kps[int(key)] = [int(key), float(x), float(y), 1, 1]
        projected[pid] = kps
        joints3d[pid] = j3d
    return projected, joints3d


def associate(projected: Dict, detected: Dict[int, List[List[float]]],
              max_dist: float) -> Dict:
    """Nearest-neighbour association of detected peaks to projected GT
    joints (reference :266-283, threshold 25 px multi / 15 px single).
    Returns {person: {joint: [id, x, y, 1, 1]}}."""
    out = {}
    for pid, skeleton in projected.items():
        kps = {}
        for j, joint in skeleton.items():
            cands = detected.get(j)
            if not cands:
                continue
            p = np.asarray(joint[1:3])
            d = np.linalg.norm(np.asarray(cands) - p, axis=1)
            k = int(np.argmin(d))
            if d[k] < max_dist:
                kps[j] = [j, float(cands[k][0]), float(cands[k][1]), 1, 1]
        if kps:
            out[pid] = kps
    return out


def convert_sequence(seq_dir: str, detector: Detector2D,
                     nodes: Sequence[int] = DEFAULT_NODES,
                     multi: bool = True, out_dir: str = ".",
                     max_frames: Optional[int] = None) -> str:
    """Full sequence conversion (≙ the reference CLI scripts).

    multi=True  → `<seq>_from_image_multi.json` (one entry per frame, all
                  people + GT — test format; association threshold 25 px)
    multi=False → `<seq>_from_image_single.json` (one entry per person per
                  frame, no GT — training format; threshold 15 px)
    Also writes `tm_<seq>.{json,pickle}`.
    """
    import cv2

    seq = seq_dir.rstrip("/").split("/")[-1]
    cams = load_calibration(seq_dir)
    selected = selected_tracker_cameras(cams, nodes)
    write_transform_set(selected, os.path.join(out_dir, f"tm_{seq}"))

    imgs_root = os.path.join(seq_dir, "hdImgs")
    skel_root = os.path.join(seq_dir, "hdPose3d_stage1_coco19")
    # camera names MUST follow the `nodes` order — the same mapping
    # write_transform_set used above — and dirs outside `nodes` are
    # skipped: a full 31-camera hdImgs download (or a custom node order)
    # would otherwise label node-0 detections 'trackera' while the
    # transform set says 'trackera' is nodes[0] (reference :105-111
    # hardcodes the pairing the same way)
    node_order = {n: i for i, n in enumerate(nodes)}
    cam_dirs = [d for d in sorted(os.listdir(imgs_root))
                if os.path.isdir(os.path.join(imgs_root, d))
                and int(d.split("_")[-1]) in node_order]
    name_of_node = {n: f"tracker{chr(ord('a') + i)}"
                    for n, i in node_order.items()}

    frames_index: Dict[str, Dict[int, str]] = {}
    for d in cam_dirs:
        node = int(d.split("_")[-1])
        for fn in sorted(os.listdir(os.path.join(imgs_root, d))):
            img_id = fn.rsplit(".", 1)[0].split("_")[-1]
            frames_index.setdefault(img_id, {})[node] = \
                os.path.join(imgs_root, d, fn)

    threshold = 25.0 if multi else 15.0
    out_frames: List[Dict] = []
    for n_done, (img_id, by_cam) in enumerate(sorted(frames_index.items())):
        if max_frames is not None and n_done >= max_frames:
            break
        skel_path = os.path.join(skel_root, f"body3DScene_{img_id}.json")
        if not os.path.exists(skel_path):
            continue
        with open(skel_path) as f:
            bodies = json.load(f)["bodies"]

        frame_entry: Dict[str, list] = {}
        per_person_frames: Dict[int, Dict[str, list]] = {}
        for node, img_path in by_cam.items():
            cam = cams[(0, node)]
            image = cv2.cvtColor(cv2.imread(img_path), cv2.COLOR_BGR2RGB)
            detected = detector(image, tuple(cam["resolution"]))
            projected, joints3d = project_gt_people(bodies, cam)
            people = associate(projected, detected, threshold)
            cam_name = name_of_node[node]
            if multi:
                frame_entry[cam_name] = [
                    json.dumps(list(people.values())), time.time(),
                    "no_image", [joints3d[pid] for pid in people]]
            else:
                for pid, kps in people.items():
                    per_person_frames.setdefault(pid, {})[cam_name] = [
                        json.dumps([kps]), time.time(), "no_image"]
        if multi:
            out_frames.append(frame_entry)
        else:
            out_frames.extend(per_person_frames.values())

    suffix = "multi" if multi else "single"
    out_path = os.path.join(out_dir, f"{seq}_from_image_{suffix}.json")
    with open(out_path, "w") as f:
        json.dump(out_frames, f)
    return out_path
