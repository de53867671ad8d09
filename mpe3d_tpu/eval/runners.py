"""Evaluation runners — library equivalents of the reference's test scripts.

  * ``run_pose_metrics``        ≙ test/metrics_from_model.py (backend='mlp')
                                  and test/metrics_from_triangulation.py
                                  (backend='triangulation')
  * ``run_sm_metrics``          ≙ test/sm_metrics.py
  * ``run_sm_metrics_without_gt`` ≙ test/sm_metrics_without_gt.py
  * ``run_reprojection_error``  ≙ test/reprojection_error.py

Each takes parsed wire frames + a PoseEstimationPipeline and returns a
metrics dict; the CLI wraps them 1:1.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from mpe3d_tpu.config import RigConfig
from mpe3d_tpu.data.frames import FrameArrays, parse_frame, parse_frame_gt
from mpe3d_tpu.eval.clustering import clustering_report
from mpe3d_tpu.eval.pose_metrics import PoseEvalAccumulator
from mpe3d_tpu.eval.reprojection import per_camera_stats, reprojection_pixel_errors
from mpe3d_tpu.eval.timing import TimingAccumulator
from mpe3d_tpu.matching.decode import decode_person_proposals
from mpe3d_tpu.pipeline import PoseEstimationPipeline
from mpe3d_tpu.train.matcher_data import build_matcher_scenes


def transform_gt_to_world(gt3d: np.ndarray, dataset_T_wc1: np.ndarray,
                          model_T_c1w: np.ndarray) -> np.ndarray:
    """Dataset-frame GT → model world via camera 1's transforms (reference:
    test/metrics_from_model.py:156-161): world = T_c1w_model · T_wc1_dataset
    · gt.  When both calibrations share a root this is the identity."""
    M = model_T_c1w @ dataset_T_wc1
    return gt3d @ M[:3, :3].T + M[:3, 3]


def run_pose_metrics(frames, rig_config: RigConfig,
                     pipeline: PoseEstimationPipeline, datastep: int = 12,
                     dataset_T_wc1: Optional[np.ndarray] = None,
                     max_skeletons: int = 10, fused: bool = False,
                     stream: int = 0, dedup_gt: bool = False) -> Dict:
    """Full-pipeline 3D accuracy + timing (≙ metrics_from_model.py:104-390).

    ``frames``: raw wire dicts (List[Dict], parsed per frame in python) OR
    the output of ``data.frames.load_eval_frames`` — a
    ``(List[FrameArrays], List[Optional[FrameGroundTruth]])`` tuple from the
    native C++ parser, which is the fast loading path for large recordings.
    ``dataset_T_wc1``: the *dataset* calibration's root→camera1 transform
    when GT lives in a different frame than the model calibration.
    ``fused=True`` runs the single-program pipeline (one device round trip;
    reports t_e2e instead of the t_pp/t_3D split).
    ``stream>0`` (implies fused) keeps that many frames in flight via
    ``infer_stream`` — dispatch/readback round trips overlap, and t_e2e_ms
    becomes steady-state wall-clock per frame.
    ``dedup_gt=True`` drops duplicated GT rows before scoring (a wire-
    protocol artifact that deflates recall on dense scenes; see
    ``data.frames.dedup_ground_truth``).  Default False = the reference's
    raw protocol, bit-for-bit.
    """
    acc = PoseEvalAccumulator(rig_config.used_joints)
    timing = TimingAccumulator()
    model_T_c1w = np.asarray(pipeline.rig.T_cw[1]) \
        if pipeline.rig.n_cameras > 1 else np.eye(4)

    selected = []            # (FrameArrays, gt3d, gt)
    if dedup_gt:
        from mpe3d_tpu.data.frames import dedup_ground_truth
    if isinstance(frames, tuple):
        for i, (fa, gt) in enumerate(zip(*frames)):
            if i % datastep != 0 or gt is None:
                continue
            if dedup_gt:
                gt = dedup_ground_truth(gt)
            gt3d = gt.gt3d
            if dataset_T_wc1 is not None:
                gt3d = transform_gt_to_world(gt3d, dataset_T_wc1,
                                             model_T_c1w)
            selected.append((fa, gt3d, gt))
    else:
        for i, frame in enumerate(frames):
            if i % datastep != 0:
                continue
            gt = parse_frame_gt(frame, rig_config)
            if gt is None:
                continue
            if dedup_gt:
                gt = dedup_ground_truth(gt)
            gt3d = gt.gt3d
            if dataset_T_wc1 is not None:
                gt3d = transform_gt_to_world(gt3d, dataset_T_wc1,
                                             model_T_c1w)
            selected.append((parse_frame(frame, rig_config, max_skeletons),
                             gt3d, gt))
    n_frames = len(selected)

    if stream > 0 and len(pipeline.match_idx) > 1:
        import time as _time
        t0 = _time.perf_counter()
        outs = list(pipeline.infer_stream((fa for fa, _, _ in selected),
                                          depth=stream))
        wall = _time.perf_counter() - t0
        for (fa, gt3d, gt), out_f in zip(selected, outs):
            acc.update(gt3d, gt.gt_valid, gt.person_valid, out_f.poses)
        out = acc.summary()
        out["t_e2e_ms"] = wall / max(n_frames, 1) * 1e3
        out["stream_depth"] = stream
        out["n_frames"] = n_frames
        return out

    for fa, gt3d, gt in selected:
        if fused and len(pipeline.match_idx) > 1:
            with timing.span("t_e2e", 1):
                out_f = pipeline.infer_fused(fa)
            poses = out_f.poses
        else:
            with timing.span("t_pp", 1):
                if len(pipeline.match_idx) == 1:
                    from mpe3d_tpu.matching.decode import single_camera_bypass
                    persons = single_camera_bypass(
                        fa.present[np.asarray(pipeline.match_idx)])
                elif pipeline.decode_on_device:
                    scores, pm, topo, S, persons = pipeline.match_decode(fa)
                else:
                    scores, pm, topo, S = pipeline.match(fa)
                    np.asarray(scores)   # block: t_pp covers the device work
                    eff, order = pipeline.host_decode_scores(
                        fa, scores, topo, S)
                    persons = decode_person_proposals(
                        eff, pm, topo, rig_config.min_number_of_views,
                        pipeline.threshold, order_scores=order)
            with timing.span("t_3D", max(len(persons), 1)):
                poses = pipeline.lift(fa, persons)
        acc.update(gt3d, gt.gt_valid, gt.person_valid, poses)
    out = acc.summary()
    if fused:
        out["t_e2e_ms"] = timing.mean_ms("t_e2e")
    else:
        out["t_pp_ms"] = timing.mean_ms("t_pp")
        out["t_3Dg_ms"] = timing.mean_ms("t_3D")
        out["t_3Di_ms"] = timing.mean_per_person_ms("t_3D")
    out["n_frames"] = n_frames
    return out


# ---------------------------------------------------------------------------
# matching-quality metrics
# ---------------------------------------------------------------------------


def _gt_clusters_from_frame(frame: Dict, rig_config: RigConfig,
                            max_skeletons: int,
                            dist_per_joint: float = 1.0) -> Optional[Dict]:
    """GT person label per (matching camera, slot) by greedy proximity
    clustering of the per-camera GT lists — reference-exact
    (≙ sm_metrics.py:113-161, golden-tested in tests/test_golden_reference
    .py): cameras iterate in FILE order restricted to used_cameras; each
    GT entry matches the existing person with the smallest TOTAL distance
    over shared joint keys INCLUDING the '-1' body-centre entry (a real
    3D point in the wire format, conversor :230); the winner is rejected
    (new person) when it shares no keys or its per-joint mean exceeds 1
    (wire cm units).

    Returns {(cam_idx_in_matching, slot): person_label} or None if any GT
    entry misses the '-1' marker (frame skipped, reference :163)."""
    used = rig_config.used_cameras
    match_cams = list(rig_config.used_cameras_skeleton_matching)
    persons: List[Dict[str, np.ndarray]] = []   # joint-id -> cm coords
    labels = {}
    for cam in frame:                           # FILE order (reference :124)
        if cam not in used:
            continue
        entry = frame[cam]
        if len(entry) < 4:
            continue
        mi = match_cams.index(cam) if cam in match_cams else -1
        for slot, joints in enumerate(entry[3]):
            if "-1" not in joints:
                return None
            best, min_d, n_best = -1, np.inf, 0
            for pid, ref in enumerate(persons):
                d, n = 0.0, 0
                for j, p in ref.items():
                    if j in joints:
                        d += float(np.linalg.norm(
                            np.asarray(joints[j], np.float64) - p))
                        n += 1
                if d < min_d:                   # min TOTAL distance first,
                    best, min_d, n_best = pid, d, n   # cut applied after
            if n_best == 0 or min_d / n_best > dist_per_joint:
                persons.append({j: np.asarray(v, np.float64)
                                for j, v in joints.items()})
                best = len(persons) - 1
            if mi >= 0 and slot < max_skeletons:
                labels[(mi, slot)] = best
    return labels


def _head_to_person(persons) -> Dict:
    """{(matching-camera index, slot): person index} for decoded persons —
    the head-labeling convention shared by both sm-metrics runners."""
    out = {}
    for pi, person in enumerate(persons):
        for mi, s in enumerate(person):
            if s >= 0:
                out[(mi, s)] = pi
    return out


def run_sm_metrics(frames: List[Dict], rig_config: RigConfig,
                   pipeline: PoseEstimationPipeline, datastep: int = 12,
                   max_skeletons: int = 10,
                   unassigned: str = "lump") -> Dict:
    """Matching clustering quality vs GT (≙ sm_metrics.py:92-229): per-frame
    ARI / homogeneity / completeness / V-measure, averaged.

    ``unassigned``: what label heads the decode did NOT assign receive.
    "lump" = the reference protocol bit-for-bit (every unassigned head
    shares the single label ``len(persons)``, sm_metrics.py:211-218):
    unassigned heads of DIFFERENT GT people score as a (wrong) predicted
    pair even though the matcher asserted no association.  "singleton" =
    each unassigned head gets a unique label (the decode's actual claim);
    the ARI analog of the pose-metric ``dedup_gt`` decomposition — report
    it alongside, not instead of, the reference row.  Measured on the
    dense protocol (RESULTS "dense-frame ARI decomposed"): lumping fully
    explains the HOMOGENEITY loss (→1.0 under singleton — the guaranteed
    monotone direction; ARI itself is not monotone, since lumping can
    accidentally pair unassigned heads of the SAME person), while the
    remaining completeness cap is the ghost-label artifact."""
    if unassigned not in ("lump", "singleton"):
        raise ValueError(f"unassigned must be 'lump' or 'singleton', "
                         f"got {unassigned!r}")
    sums = {"ari": 0.0, "homogeneity": 0.0, "completeness": 0.0,
            "v_measure": 0.0}
    n = 0
    for i, frame in enumerate(frames):
        if i % datastep != 0:
            continue
        gt_labels = _gt_clusters_from_frame(frame, rig_config, max_skeletons)
        if not gt_labels:
            continue
        fa = parse_frame(frame, rig_config, max_skeletons)
        if pipeline.decode_on_device:
            scores, pm, topo, S, persons = pipeline.match_decode(fa)
        else:
            scores, pm, topo, S = pipeline.match(fa)
            eff, order = pipeline.host_decode_scores(fa, scores, topo, S)
            persons = decode_person_proposals(
                eff, pm, topo, rig_config.min_number_of_views,
                pipeline.threshold, order_scores=order)
        # per-head labels in (matching camera, slot) order, present heads
        # whose GT slot exists; unassigned heads share one label (reference
        # sm_metrics.py:211-218 leaves them at len(final_output))
        head_to_person = _head_to_person(persons)
        mi_idx = np.asarray(pipeline.match_idx)
        true_l, pred_l = [], []
        next_singleton = len(persons)
        for (mi, s), gl in sorted(gt_labels.items()):
            if s >= S or not fa.present[mi_idx[mi], s]:
                continue
            true_l.append(gl)
            p = head_to_person.get((mi, s))
            if p is None:
                p = next_singleton
                if unassigned == "singleton":
                    next_singleton += 1     # unique label per unassigned head
            pred_l.append(p)
        if not true_l:
            continue
        rep = clustering_report(true_l, pred_l)
        for k in sums:
            sums[k] += rep[k]
        n += 1
    if n == 0:
        return {k: float("nan") for k in sums} | {"n_frames": 0}
    return {k: v / n for k, v in sums.items()} | {"n_frames": n}


def run_sm_metrics_without_gt(inputs: List[List[Dict]],
                              rig_config: RigConfig,
                              pipeline: PoseEstimationPipeline,
                              limit: int = 1000, seed: int = 0) -> Dict:
    """GT-free matcher eval (≙ sm_metrics_without_gt.py:101-167): composite
    single-person test recordings into synthetic scenes (labels known by
    construction), decode once from model scores and once from the labels,
    and compare the two clusterings."""
    S = pipeline.slot_buckets[-1]
    topo = pipeline.topology(S)
    scenes = build_matcher_scenes(inputs, rig_config, topo, limit=limit,
                                  seed=seed, augment=False)
    sums = {"ari": 0.0, "homogeneity": 0.0, "completeness": 0.0,
            "v_measure": 0.0}
    n = 0
    import jax
    import jax.numpy as jnp

    # batched matcher forward: one dispatch + one readback per chunk of
    # scenes, not one per scene — through the axon relay every dispatch
    # after the first readback costs a ~25 ms round trip (CLAUDE.md), so a
    # per-scene loop at limit=1000 would add ~half a minute of pure RTT
    core = pipeline._score_core(S)
    batched = jax.jit(jax.vmap(core, in_axes=(None, 0, 0, 0, 0, 0)))
    CHUNK = 256
    all_scores, all_pm = [], []
    for c0 in range(0, len(scenes), CHUNK):
        sc = scenes.select(slice(c0, c0 + CHUNK))
        s_dev, pm_dev = batched(
            pipeline.matcher_params, jnp.asarray(sc.kp),
            jnp.asarray(sc.valid), jnp.asarray(sc.prob),
            jnp.asarray(sc.observed), jnp.asarray(sc.present))
        all_scores.append(np.asarray(s_dev))
        all_pm.append(np.asarray(pm_dev))
    scores_all = np.concatenate(all_scores) if all_scores else np.zeros((0,))
    pm_all = np.concatenate(all_pm) if all_pm else np.zeros((0,))

    for k in range(len(scenes)):
        sc = scenes.select(k)
        persons_model = decode_person_proposals(
            scores_all[k], pm_all[k], topo,
            rig_config.min_number_of_views, pipeline.threshold)
        persons_label = decode_person_proposals(
            sc.labels, (sc.pair_weight > 0).astype(np.float32), topo,
            rig_config.min_number_of_views, pipeline.threshold)

        lm = _head_to_person(persons_model)
        ll = _head_to_person(persons_label)
        true_l, pred_l = [], []
        for mi in range(topo.n_cameras):
            for s in range(S):
                if sc.present[mi, s]:
                    true_l.append(ll.get((mi, s), len(persons_label)))
                    pred_l.append(lm.get((mi, s), len(persons_model)))
        if not true_l:
            continue
        rep = clustering_report(true_l, pred_l)
        for key in sums:
            sums[key] += rep[key]
        n += 1
    if n == 0:
        return {k: float("nan") for k in sums} | {"n_scenes": 0}
    return {k: v / n for k, v in sums.items()} | {"n_scenes": n}


def run_reprojection_error(frames, rig_config: RigConfig,
                           pipeline: PoseEstimationPipeline,
                           tri_pipeline: Optional[PoseEstimationPipeline] = None,
                           datastep: int = 1, max_skeletons: int = 10,
                           show_gt: bool = False) -> Dict:
    """Per-camera reprojection pixel error of estimated 3D
    (≙ reprojection_error.py:160-431) for rigs without 3D GT.

    ``frames``: raw wire dicts or a ``load_eval_frames`` tuple (see
    ``run_pose_metrics``).  ``show_gt=True`` also reprojects GT 3D poses
    when the frames carry them (the reference's optional GT column,
    reprojection_error.py:384-419) — matched to proposals by best
    permutation of mean joint distance.
    """
    from mpe3d_tpu.eval.pose_metrics import best_permutation, pose_error_table

    C = rig_config.n_cameras
    errs_mlp: List[List[float]] = [[] for _ in range(C)]
    errs_tri: List[List[float]] = [[] for _ in range(C)]
    errs_gt: List[List[float]] = [[] for _ in range(C)]
    n = 0
    if isinstance(frames, tuple):
        pairs = list(zip(*frames))
    else:
        pairs = [(None, None)] * len(frames)   # parsed lazily below
    for i in range(len(pairs)):
        if i % datastep != 0:
            continue
        if isinstance(frames, tuple):
            fa, pre_gt = pairs[i]
        else:
            frame = frames[i]
            fa = parse_frame(frame, rig_config, max_skeletons)
            pre_gt = None
        out = pipeline(fa)
        if len(out.persons) == 0:
            continue
        n += 1
        kp, valid, prob, observed = pipeline.gather_person_obs(fa, out.persons)
        poses_mlp = out.poses
        for tag, errs, pl in (("mlp", errs_mlp, pipeline),
                              ("tri", errs_tri, tri_pipeline)):
            if pl is None:
                continue
            poses = poses_mlp if pl is pipeline else pl.lift(fa, out.persons)
            pe = reprojection_pixel_errors(poses, kp, observed, pl.used_rig)
            for c in range(len(pe)):
                errs[c].extend(pe[c])
        if show_gt:
            gt = pre_gt if isinstance(frames, tuple) \
                else parse_frame_gt(frame, rig_config)
            if gt is not None and len(gt.gt3d):
                table = pose_error_table(gt.gt3d, gt.gt_valid, poses_mlp,
                                         rig_config.used_joints)
                perm = best_permutation(table)
                gt_per_person = np.zeros_like(poses_mlp)
                have = np.zeros(len(poses_mlp), bool)
                for g, r in enumerate(perm):
                    if r < len(poses_mlp):
                        gt_per_person[r] = gt.gt3d[g]
                        have[r] = True
                pe = reprojection_pixel_errors(gt_per_person[have], kp[have],
                                               observed[have],
                                               pipeline.used_rig)
                for c in range(len(pe)):
                    errs_gt[c].extend(pe[c])
    res = {"mlp": per_camera_stats(errs_mlp), "n_frames": n,
           "cameras": list(rig_config.used_cameras)}
    if tri_pipeline is not None:
        res["triangulation"] = per_camera_stats(errs_tri)
    if show_gt:
        res["gt"] = per_camera_stats(errs_gt)
    return res
