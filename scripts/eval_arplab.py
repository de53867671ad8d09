"""ARPLAB full-pipeline quality: reprojection error + 3D metrics.

The reference's second environment (ARP Lab: 4 wall cameras + 2
robot-mounted, zero distortion; parameters.py:79-123) has no 3D ground
truth in the reference either — its quality table is per-camera
reprojection pixel error (test/reprojection_error.py).  This script
reproduces that protocol on seeded synthetic ARP frames, for both the MLP
lifter and the classical triangulation backend, and — because synthetic GT
*is* available here — adds the MPJPE/mAP/mR table the reference cannot
compute for this rig.

Usage: python scripts/eval_arplab.py --matcher models_demo/arplab \
           --lifter runs/arp_lifter [--frames 120]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--matcher", required=True)
    ap.add_argument("--lifter", required=True)
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--datastep", type=int, default=2)
    ap.add_argument("--seed", type=int, default=77)
    ap.add_argument("--spread", default="0.8,2.0")
    ap.add_argument("--min-cam-dist", type=float, default=1.2)
    ap.add_argument("--pixel-sigma", type=float, default=1.5,
                    help="detector pixel noise (robustness sweeps: 3, 5)")
    ap.add_argument("--cam-dropout", type=float, default=0.05,
                    help="per (person, camera) chance of a missing view")
    ap.add_argument("--joint-dropout", type=float, default=0.05)
    ap.add_argument("--outlier-rate", type=float, default=0.0,
                    help="per (joint, camera) chance of a confident large "
                    "mislocalisation (heavy-tailed detector noise)")
    ap.add_argument("--tri-variant", default="median",
                    choices=["median", "irls"],
                    help="classical-backend triangulator: reference-exact "
                    "median pair filter vs Huber-IRLS all-view solve")
    ap.add_argument("--prior-gate", dest="prior_gate_px", type=float,
                    default=None,
                    help="per-joint prior-quality gate in px "
                    "(pipeline prior_gate_px; scripts/diag_prior_gate.py)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (evals are relay-"
                    "independent; numbers carry a backend tag)")
    args = ap.parse_args()
    sp = [float(x) for x in args.spread.split(",")]
    spread = sp[0] if len(sp) == 1 else tuple(sp)

    import jax

    if args.cpu:
        # must precede ANY backend query (CLAUDE.md: sitecustomize
        # registers the axon TPU backend; a dead relay hangs readbacks)
        jax.config.update("jax_platforms", "cpu")

    jax.config.update("jax_compilation_cache_dir", "/tmp/mpe3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from mpe3d_tpu.config import ARPLAB, LifterConfig, MatcherConfig
    from mpe3d_tpu.data.synthetic import (SceneNoise, generate_frames,
                                          synthetic_ring_rig)
    from mpe3d_tpu.eval.runners import (run_pose_metrics,
                                        run_reprojection_error)
    from mpe3d_tpu.geometry.calib_io import rig_from_files
    from mpe3d_tpu.models.gat import init_matcher
    from mpe3d_tpu.pipeline import PoseEstimationPipeline
    from mpe3d_tpu.train.checkpoint import (load_checkpoint,
                                            load_lifter_checkpoint,
                                            read_meta)

    rig_config = ARPLAB
    ref_tm = "/root/reference/tm_arp.pickle"
    rig = (rig_from_files(rig_config, ref_tm) if os.path.exists(ref_tm)
           else synthetic_ring_rig(rig_config))
    noise = SceneNoise(pixel_sigma=args.pixel_sigma,
                       joint_dropout=args.joint_dropout,
                       spurious_rate=0.1, camera_dropout=args.cam_dropout,
                       outlier_rate=args.outlier_rate)
    frames = generate_frames(rig_config, rig, args.frames, n_people=(1, 3),
                             seed=args.seed, noise=noise, spread=spread,
                             min_cam_dist=args.min_cam_dist)

    mcfg = MatcherConfig(in_dim=rig_config.matcher_feature_dim)
    from mpe3d_tpu.train.checkpoint import matcher_config_from_meta
    mcfg = matcher_config_from_meta(
        read_meta(os.path.join(args.matcher, "skeleton_matching")), mcfg)
    lcfg = LifterConfig(in_dim=rig_config.lifter_input_dim,
                        out_dim=rig_config.n_joints * 3)
    mparams, _, mmeta = load_checkpoint(
        os.path.join(args.matcher, "skeleton_matching"),
        init_matcher(jax.random.PRNGKey(0), mcfg))
    # unified variant-aware loader: fp32 training checkpoints AND the
    # int8/bf16 servable exports (models_demo/*) — the pipeline detects
    # quantised trees and serves them (pipeline.py:198)
    lmeta = read_meta(os.path.join(args.lifter, "pose_estimator"))
    lparams, lcfg, _ = load_lifter_checkpoint(
        os.path.join(args.lifter, "pose_estimator"), lcfg)
    S = int(mmeta.get("n_slots", 4))

    prior = lmeta.get("prior", "mean")   # must match training (pack.py)
    pipe = PoseEstimationPipeline(rig_config, rig, mparams, mcfg,
                                  lparams, lcfg, slot_buckets=(S,),
                                  person_buckets=(8,), lifter_prior=prior,
                                  prior_gate_px=args.prior_gate_px)
    tri = PoseEstimationPipeline(rig_config, rig, mparams, mcfg,
                                 backend="triangulation",
                                 tri_variant=args.tri_variant,
                                 slot_buckets=(S,), person_buckets=(8,))

    report = {"env": "ARPLAB", "frames": args.frames, "seed": args.seed,
              **({"prior_gate_px": args.prior_gate_px}
                 if args.prior_gate_px is not None else {}),
              "spread": args.spread, "min_cam_dist": args.min_cam_dist,
              "noise": {"pixel_sigma": args.pixel_sigma,
                        "joint_dropout": args.joint_dropout,
                        "camera_dropout": args.cam_dropout,
                        "outlier_rate": args.outlier_rate},
              "matcher_meta": {k: mmeta.get(k) for k in ("epoch", "val_loss")},
              "lifter_meta": {k: lmeta.get(k)
                              for k in ("epoch", "val_loss", "stored")},
              "backend": jax.default_backend(),
              "lifter_prior": prior}
    if args.tri_variant != "median":
        # provenance: without this, irls and median comparator rows are
        # indistinguishable by report content (eval_synthetic records it)
        report["tri_variant"] = args.tri_variant

    # --- the reference's ARPLAB protocol: per-camera reprojection px ------
    r = run_reprojection_error(frames, rig_config, pipe, tri,
                               datastep=args.datastep, show_gt=True)
    report["reprojection"] = r
    for tag in ("mlp", "triangulation", "gt"):
        if tag in r:
            print(tag, "median px per camera:",
                  [round(m, 2) for m in r[tag]["median_px"]])

    # --- synthetic-GT 3D accuracy (beyond the reference's capability) -----
    for tag, p in (("mlp", pipe), ("triangulation", tri)):
        m = run_pose_metrics(frames, rig_config, p, datastep=args.datastep,
                             fused=True)
        m.pop("ap_per_threshold", None)
        report[f"pose_{tag}"] = m
        print(tag, {k: round(v, 2) for k, v in m.items()
                    if isinstance(v, float)})

    out = args.out or os.path.join(args.lifter, "eval_arplab.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2, default=float)
    print("wrote", out)


if __name__ == "__main__":
    main()
