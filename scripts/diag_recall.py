"""Diagnose the dense-scene mAP/mR gap: decode-level vs detection-level.

For the dense synthetic eval protocol this script reports, per decode
variant, MPJPE/mAP/mR — and, crucially, the ORACLE-MATCHING bound: proposals
decoded from the GT person labels (same detections, same lifter).  The gap
decode→oracle is what better matching can recover; the gap oracle→100 is
detection-level (people seen by <2 cameras, ghosts) and unrecoverable at
matching level.

Usage: python scripts/diag_recall.py --models runs/eval_wide [--frames 120]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def oracle_persons(frame, rig_config, max_skeletons, fa, match_idx):
    """GT-label proposals [P, C_match] (slot per matching camera, -1=none).

    Labels come from the same proximity clustering as sm-metrics
    (eval/runners._gt_clusters_from_frame); first slot per (person, camera)
    wins, ghosts lose."""
    from mpe3d_tpu.eval.runners import _gt_clusters_from_frame

    labels = _gt_clusters_from_frame(frame, rig_config, max_skeletons)
    if not labels:
        return np.zeros((0, len(match_idx)), np.int32)
    n_persons = max(labels.values()) + 1
    persons = np.full((n_persons, len(match_idx)), -1, np.int32)
    for (mi, slot), pid in sorted(labels.items()):
        if slot < fa.kp.shape[1] and fa.present[match_idx[mi], slot] \
                and persons[pid, mi] < 0:
            persons[pid, mi] = slot
    keep = (persons >= 0).sum(axis=1) >= rig_config.min_number_of_views
    return persons[keep]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", required=True)
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--datastep", type=int, default=1)
    ap.add_argument("--seed", type=int, default=30)
    ap.add_argument("--spread", type=float, default=1.2)
    ap.add_argument("--people", type=int, nargs=2, default=(2, 4))
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/mpe3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from mpe3d_tpu.config import PANOPTIC, LifterConfig, MatcherConfig
    from mpe3d_tpu.data.frames import parse_frame, parse_frame_gt
    from mpe3d_tpu.data.synthetic import (SceneNoise, generate_frames,
                                          synthetic_ring_rig)
    from mpe3d_tpu.eval.pose_metrics import PoseEvalAccumulator
    from mpe3d_tpu.geometry.calib_io import rig_from_files
    from mpe3d_tpu.models.gat import init_matcher
    from mpe3d_tpu.models.mlp import init_lifter
    from mpe3d_tpu.pipeline import PoseEstimationPipeline
    from mpe3d_tpu.train.checkpoint import (lifter_config_from_meta,
                                            load_checkpoint, read_meta)

    rig_config = PANOPTIC
    ref_tm = "/root/reference/tm_panoptic.pickle"
    rig = (rig_from_files(rig_config, ref_tm) if os.path.exists(ref_tm)
           else synthetic_ring_rig(rig_config))
    noise = SceneNoise(pixel_sigma=1.5, joint_dropout=0.05,
                       spurious_rate=0.1, camera_dropout=0.05)
    frames = generate_frames(rig_config, rig, args.frames,
                             n_people=tuple(args.people), seed=args.seed,
                             noise=noise, spread=args.spread)

    mcfg = MatcherConfig(in_dim=rig_config.matcher_feature_dim)
    from mpe3d_tpu.train.checkpoint import matcher_config_from_meta
    mcfg = matcher_config_from_meta(
        read_meta(os.path.join(args.models, "skeleton_matching")), mcfg)
    lcfg = LifterConfig(in_dim=rig_config.lifter_input_dim,
                        out_dim=rig_config.n_joints * 3)
    mparams, _, mmeta = load_checkpoint(
        os.path.join(args.models, "skeleton_matching"),
        init_matcher(jax.random.PRNGKey(0), mcfg))
    lcfg = lifter_config_from_meta(
        read_meta(os.path.join(args.models, "pose_estimator")), lcfg)
    lparams, _, _ = load_checkpoint(
        os.path.join(args.models, "pose_estimator"),
        init_lifter(jax.random.PRNGKey(1), lcfg))
    S = int(mmeta.get("n_slots", 6))

    variants = {
        "baseline": {},
        "geo_rescue": {"geo_rescue": 0.001, "geo_rescue_dist": 0.05},
        "geo_both": {"geo_rerank": 0.3, "geo_rescue": 0.001,
                     "geo_rescue_dist": 0.05},
    }
    pipes = {tag: PoseEstimationPipeline(
        rig_config, rig, mparams, mcfg, lparams, lcfg,
        slot_buckets=(S,), person_buckets=(8,), **kw)
        for tag, kw in variants.items()}
    oracle_pipe = pipes["baseline"]
    match_idx = np.asarray(rig_config.matching_camera_indices())

    from mpe3d_tpu.data.frames import dedup_ground_truth as dedup_gt

    accs = {tag: PoseEvalAccumulator(rig_config.used_joints)
            for tag in list(variants) + ["oracle"]}
    accs_dd = {tag: PoseEvalAccumulator(rig_config.used_joints)
               for tag in list(variants) + ["oracle"]}
    n_gt_total = 0
    n_gt_2view = 0          # GT persons with detections in >= 2 cameras
    proposal_counts = {tag: 0 for tag in accs}
    selected = []           # (fa, gt, persons_gt)
    for i, frame in enumerate(frames):
        if i % args.datastep:
            continue
        gt = parse_frame_gt(frame, rig_config)
        if gt is None:
            continue
        fa = parse_frame(frame, rig_config, max_skeletons=S)
        persons_gt = oracle_persons(frame, rig_config, S, fa, match_idx)
        n_gt_total += len(gt.gt3d)
        n_gt_2view += len(persons_gt)
        selected.append((fa, gt, persons_gt))
    frames_used = len(selected)
    fas = [fa for fa, _, _ in selected]
    # batched fused inference in FIXED-size chunks (pad the tail with a
    # repeat): one compiled [CHUNK]-frame program serves every protocol —
    # remote compiles of the big vmapped program take ~20 min each, so the
    # chunk shape must not depend on how many frames carried GT
    CHUNK = 30
    for tag, pipe in pipes.items():
        outs = []
        for i in range(0, len(fas), CHUNK):
            part = fas[i: i + CHUNK]
            pad = CHUNK - len(part)
            outs.extend(pipe.infer_batch(part + [part[0]] * pad,
                                         slots=S)[:len(part)])
        for (fa, gt, _), out in zip(selected, outs):
            proposal_counts[tag] += len(out.persons)
            accs[tag].update(gt.gt3d, gt.gt_valid, gt.person_valid, out.poses)
            g2 = dedup_gt(gt)
            accs_dd[tag].update(g2.gt3d, g2.gt_valid, g2.person_valid,
                                out.poses)
        print(f"[{tag}] done", flush=True)
    for fa, gt, persons_gt in selected:
        poses_o = oracle_pipe.lift(fa, persons_gt)
        proposal_counts["oracle"] += len(persons_gt)
        accs["oracle"].update(gt.gt3d, gt.gt_valid, gt.person_valid, poses_o)
        g2 = dedup_gt(gt)
        accs_dd["oracle"].update(g2.gt3d, g2.gt_valid, g2.person_valid,
                                 poses_o)
    print("[oracle] done", flush=True)

    report = {"frames": frames_used, "n_gt": n_gt_total,
              "n_gt_with_2view_detections": n_gt_2view,
              "detection_recall_bound_pct":
                  round(100.0 * n_gt_2view / max(n_gt_total, 1), 2),
              "spread": args.spread, "people": list(args.people),
              "models": args.models}
    for tag, acc in accs.items():
        s = acc.summary()
        s.pop("ap_per_threshold", None)
        s["n_proposals"] = proposal_counts[tag]
        report[tag] = s
        print(tag, {k: round(v, 2) for k, v in s.items()
                    if isinstance(v, float)})
        sd = accs_dd[tag].summary()
        sd.pop("ap_per_threshold", None)
        report[f"{tag}_dedup_gt"] = sd
        print(f"{tag}_dedup_gt", {k: round(v, 2) for k, v in sd.items()
                                  if isinstance(v, float)})
    print(json.dumps({k: report[k] for k in
                      ("n_gt", "n_gt_with_2view_detections",
                       "detection_recall_bound_pct")}))
    out = args.out or os.path.join(args.models, "diag_recall.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2, default=float)
    print("wrote", out)


if __name__ == "__main__":
    main()
