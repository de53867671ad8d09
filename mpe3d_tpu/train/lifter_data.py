"""Lifter training dataset: wire frames → packed input/error arrays.

Re-implements the reference's ``PoseEstimatorDataset`` list path (reference:
utils/pose_estimator_dataset_from_json.py:146-236): per frame, pick the
biggest skeleton per camera (single-person assumption, :49-61), pack the
1260-float network input + 360-float error input, and expand with
camera-dropout augmentation (:219-229, up to ``MAX_COMBINATIONS_NUMBER=5``
random camera subsets, the original always included).

TPU-native differences: all frames are packed in ONE vmapped jit call (the
reference runs per-frame OpenCV + python loops), and augmentation subsets are
applied as on-device masking of the packed tensor instead of re-packing.
Caching mirrors the reference's ``<lastfile>.pytorch`` tensor cache
(:300-304) with an ``.npz``.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mpe3d_tpu.config import RigConfig
from mpe3d_tpu.data.frames import FrameArrays, load_frames, parse_frame
from mpe3d_tpu.geometry.camera import CameraRig
from mpe3d_tpu.lifting.pack import (apply_camera_dropout,
                                    apply_prior_dropout, pack_error_input,
                                    pack_lifter_input)


def biggest_skeleton_obs(frame: FrameArrays, cam_indices: Sequence[int]
                         ) -> Tuple[np.ndarray, ...]:
    """Pick the skeleton with most listed joints per camera (reference
    get_skeleton_indices :49-61).  Returns (kp, valid, prob, observed) with
    shape [C_sel, J, ...]."""
    counts = frame.in_view.sum(axis=2)                    # [C, S]
    best = counts.argmax(axis=1)                          # [C]
    ci = np.asarray(cam_indices)
    sel = best[ci]
    kp = frame.kp[ci, sel]
    valid = frame.valid[ci, sel]
    prob = frame.prob[ci, sel]
    observed = frame.in_view[ci, sel]
    return kp, valid, prob, observed


def random_camera_subsets(flags: np.ndarray, max_count: int,
                          rng: np.random.Generator) -> List[np.ndarray]:
    """Reference ``permutations_generator_random`` (utils/data_augmentation.py:
    29-47): the full set first, then up to max_count−1 random strict non-empty
    subsets of the available cameras."""
    out = [flags.astype(np.float32)]
    avail = np.nonzero(flags)[0]
    n = len(avail)
    if n <= 1:
        return out
    # uniform WITHOUT replacement over the 2^n − 2 strict non-empty
    # subsets — the reference's distribution (it materialises and
    # shuffles them all, utils/data_augmentation.py:36-45; sampling
    # bitmask integers directly is O(max_count) instead of O(2^n·n),
    # which matters in the dataset-build hot loop and for large rigs)
    total = 2 ** n - 2
    k = min(max_count - 1, total)
    if total <= 4096:
        bit_sel = rng.choice(total, size=k, replace=False) + 1
    else:
        chosen = set()
        while len(chosen) < k:
            chosen.add(int(rng.integers(1, total + 1)))
        bit_sel = np.fromiter(chosen, dtype=np.int64)
    for bits in bit_sel:
        m = np.zeros(len(flags), np.float32)
        m[avail[(int(bits) >> np.arange(n)) & 1 == 1]] = 1.0
        out.append(m)
    return out


def build_lifter_dataset(frames: List[Dict], rig_config: RigConfig,
                         rig: CameraRig, augment: bool = True,
                         max_combinations: int = 5, seed: int = 0,
                         cache_path: Optional[str] = None,
                         batch: int = 2048, prior: str = "mean",
                         prior_dropout: float = 0.0,
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (net_inputs [N, Cu*J*14], error_inputs [N, C*J*4]) float32.

    ``prior`` selects the triangulated-prior variant (see
    ``pack_lifter_input``); callers using ``cache_path`` must key the path
    on it — the cache stores packed arrays.  ``prior_dropout`` > 0 zeroes
    each joint's prior fields with that probability on the augmented
    copies (the first, unaugmented copy of every sample is kept intact) —
    trains the no-prior fallback of the residual-prior head."""
    if cache_path and os.path.exists(cache_path):
        data = np.load(cache_path)
        return data["net"], data["err"]

    used_idx = rig_config.used_camera_indices()
    used_rig = rig.select(np.asarray(used_idx))
    all_idx = tuple(range(rig_config.n_cameras))
    J = rig_config.n_joints
    Cu, C = len(used_idx), rig_config.n_cameras
    img = (float(rig_config.image_width), float(rig_config.image_height))

    pack_batch = jax.jit(jax.vmap(
        lambda kp, v, p, o: pack_lifter_input(kp, v, p, o, used_rig, img,
                                              require_valid=True,
                                              prior=prior)))
    err_batch = jax.jit(jax.vmap(pack_error_input))

    kps, vals, probs, obss = [], [], [], []
    ekps, evals, eprobs, eobss = [], [], [], []
    for fr in frames:
        fa = fr if isinstance(fr, FrameArrays) else parse_frame(fr, rig_config)
        kp, v, p, o = biggest_skeleton_obs(fa, used_idx)
        kps.append(kp); vals.append(v); probs.append(p); obss.append(o)
        ekp, ev, ep, eo = biggest_skeleton_obs(fa, all_idx)
        ekps.append(ekp); evals.append(ev); eprobs.append(ep); eobss.append(eo)

    if not kps:
        return (np.zeros((0, Cu * J * 14), np.float32),
                np.zeros((0, C * J * 4), np.float32))

    nets, includes, errs = [], [], []
    for i in range(0, len(kps), batch):
        sl = slice(i, i + batch)
        net, inc = pack_batch(jnp.asarray(np.stack(kps[sl])),
                              jnp.asarray(np.stack(vals[sl])),
                              jnp.asarray(np.stack(probs[sl])),
                              jnp.asarray(np.stack(obss[sl])))
        err = err_batch(jnp.asarray(np.stack(ekps[sl])),
                        jnp.asarray(np.stack(evals[sl])),
                        jnp.asarray(np.stack(eprobs[sl])),
                        jnp.asarray(np.stack(eobss[sl])))
        nets.append(np.asarray(net))
        includes.append(np.asarray(inc))
        errs.append(np.asarray(err))
    net_all = np.concatenate(nets)
    inc_all = np.concatenate(includes)          # [F, Cu, J]
    err_all = np.concatenate(errs)

    # per-frame camera flags (reference :196) and validity gate (:211)
    flags = inc_all.any(axis=2)                 # [F, Cu]
    keep = flags.any(axis=1)
    net_all, err_all, flags = net_all[keep], err_all[keep], flags[keep]

    # --- camera-dropout augmentation as device masking -----------------
    rng = np.random.default_rng(seed)
    sample_idx, masks, first_copy = [], [], []
    for i in range(len(net_all)):
        subsets = (random_camera_subsets(flags[i], max_combinations, rng)
                   if augment else [flags[i].astype(np.float32)])
        for k, m in enumerate(subsets):
            sample_idx.append(i)
            masks.append(m)
            first_copy.append(k == 0)
    sample_idx = np.asarray(sample_idx)
    masks = np.stack(masks)

    # per-joint prior dropout on the augmented copies only
    jkeep = np.ones((len(sample_idx), J), np.float32)
    if prior_dropout > 0.0 and augment:
        aug = ~np.asarray(first_copy)
        jkeep[aug] = (rng.random((int(aug.sum()), J))
                      >= prior_dropout).astype(np.float32)

    dropout = jax.jit(jax.vmap(
        lambda x, m, jk: apply_prior_dropout(
            apply_camera_dropout(x, m, J), jk, J)))
    outs = []
    for i in range(0, len(sample_idx), 4096):
        sl = slice(i, i + 4096)
        outs.append(np.asarray(dropout(jnp.asarray(net_all[sample_idx[sl]]),
                                       jnp.asarray(masks[sl]),
                                       jnp.asarray(jkeep[sl]))))
    net_final = np.concatenate(outs)
    err_final = err_all[sample_idx]

    if cache_path:
        # atomic publish: a concurrent reader (e.g. a TPU training run
        # racing a CPU cache pre-build) must never see a truncated file
        tmp = cache_path + ".tmp.npz"
        np.savez(tmp, net=net_final, err=err_final)
        os.replace(tmp, cache_path)
    return net_final, err_final


def build_lifter_dataset_from_files(paths: Sequence[str],
                                    rig_config: RigConfig, rig: CameraRig,
                                    **kw) -> Tuple[np.ndarray, np.ndarray]:
    from mpe3d_tpu.data.frames import parse_frames_file

    frames: List = []
    for p in paths:
        # C++ fast path; FrameArrays feed build_lifter_dataset directly
        frames.extend(parse_frames_file(p, rig_config))
    cache = kw.pop("cache", False)
    # key the cache on EVERY packing knob that changes the arrays AND on
    # the full input-path list (the reference's <lastfile>.pytorch cache
    # keys on nothing — a silent-staleness trap we do not reproduce)
    cache_path = None
    if cache:
        import hashlib
        prior = kw.get("prior", "mean")
        pdrop = kw.get("prior_dropout", 0.0)
        augment = kw.get("augment", True)
        maxc = kw.get("max_combinations", 5)
        seed = kw.get("seed", 0)
        tag = hashlib.sha1("|".join(os.path.abspath(p)
                                    for p in paths).encode()).hexdigest()[:8]
        suffix = f".{prior}.a{int(augment)}x{maxc}.s{seed}.pd{pdrop}.{tag}"
        cache_path = f"{paths[-1]}.mpe3d{suffix}.npz"
    return build_lifter_dataset(frames, rig_config, rig,
                                cache_path=cache_path, **kw)
