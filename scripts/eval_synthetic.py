"""Evaluate trained checkpoints on (regenerated, seeded) synthetic data.

Usage: python scripts/eval_synthetic.py --models runs/full_tpu2 [--out FILE]

Reports the reference's headline tables (BASELINE.md):
  * matching ARI/H/C/Vm at 2 / 3 / 5 views (frames restricted to camera
    subsets, like the reference's view-count study; README.md:19-21)
  * MPJPE / mAP / mR for the MLP and triangulation backends
  * fused-pipeline per-frame latency
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument("--frames", type=int, default=240)
    ap.add_argument("--datastep", type=int, default=2)
    ap.add_argument("--seed", type=int, default=30)
    ap.add_argument("--spread", type=float, default=1.2,
                    help="person placement-disc radius (m); 1.2 = dense "
                    "hard-mode scenes, ~2.5 ≈ typical Panoptic density")
    ap.add_argument("--pixel-sigma", type=float, default=1.5,
                    help="detector pixel noise (robustness sweeps: 3, 5)")
    ap.add_argument("--cam-dropout", type=float, default=0.05,
                    help="per (person, camera) chance of a missing view")
    ap.add_argument("--joint-dropout", type=float, default=0.05,
                    help="per (joint, camera) chance of a missing detection")
    ap.add_argument("--spurious-rate", type=float, default=0.1,
                    help="per (person, camera) chance of a ghost skeleton; "
                    "0 with --pixel-sigma 0 ≙ the reference's 'Projected "
                    "2D input' protocol (README.md:35 — GT projections "
                    "fed to the pipeline, no detector artifacts)")
    ap.add_argument("--outlier-rate", type=float, default=0.0,
                    help="per (joint, camera) chance of a confident large "
                    "mislocalisation (heavy-tailed detector noise)")
    ap.add_argument("--tri-variant", default="median",
                    choices=["median", "irls"],
                    help="classical-backend triangulator: reference-exact "
                    "median pair filter vs Huber-IRLS all-view solve "
                    "(geometry/triangulate.py)")
    ap.add_argument("--prior-gate", dest="prior_gate_px", type=float,
                    default=None,
                    help="per-joint prior-quality gate in px "
                    "(pipeline prior_gate_px; scripts/diag_prior_gate.py)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (evals are relay-"
                    "independent; numbers carry a backend tag)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        # must precede ANY backend query (CLAUDE.md: sitecustomize
        # registers the axon TPU backend; a dead relay hangs readbacks)
        jax.config.update("jax_platforms", "cpu")

    from mpe3d_tpu.config import PANOPTIC, LifterConfig, MatcherConfig
    from mpe3d_tpu.data.synthetic import (SceneNoise, generate_frames,
                                          synthetic_ring_rig)
    from mpe3d_tpu.eval.runners import run_pose_metrics, run_sm_metrics
    from mpe3d_tpu.geometry.calib_io import rig_from_files
    from mpe3d_tpu.models.gat import init_matcher
    from mpe3d_tpu.pipeline import PoseEstimationPipeline
    from mpe3d_tpu.train.checkpoint import (load_checkpoint,
                                            load_lifter_checkpoint,
                                            read_meta)

    rig_config = PANOPTIC
    ref_tm = "/root/reference/tm_panoptic.pickle"
    rig = (rig_from_files(rig_config, ref_tm) if os.path.exists(ref_tm)
           else synthetic_ring_rig(rig_config))
    noise = SceneNoise(pixel_sigma=args.pixel_sigma,
                       joint_dropout=args.joint_dropout,
                       spurious_rate=args.spurious_rate,
                       camera_dropout=args.cam_dropout,
                       outlier_rate=args.outlier_rate)
    test_multi = generate_frames(rig_config, rig, args.frames,
                                 n_people=(2, 4), seed=args.seed, noise=noise,
                                 spread=args.spread)

    mcfg = MatcherConfig(in_dim=rig_config.matcher_feature_dim)
    from mpe3d_tpu.train.checkpoint import matcher_config_from_meta
    mcfg = matcher_config_from_meta(
        read_meta(os.path.join(args.models, "skeleton_matching")), mcfg)
    lcfg = LifterConfig(in_dim=rig_config.lifter_input_dim,
                        out_dim=rig_config.n_joints * 3)
    mparams, _, mmeta = load_checkpoint(
        os.path.join(args.models, "skeleton_matching"),
        init_matcher(jax.random.PRNGKey(0), mcfg))
    # unified variant-aware loader: fp32 training checkpoints AND the
    # int8/bf16 servable exports (models_demo/*) — the pipeline detects
    # quantised trees and serves them (pipeline.py:198)
    lmeta = read_meta(os.path.join(args.models, "pose_estimator"))
    lparams, lcfg, _ = load_lifter_checkpoint(
        os.path.join(args.models, "pose_estimator"), lcfg)

    S = int(mmeta.get("n_slots", 6))
    report = {"matcher_meta": {k: mmeta.get(k) for k in ("epoch", "val_loss")},
              "lifter_meta": {k: lmeta.get(k)
                              for k in ("epoch", "val_loss", "stored")},
              "backend": jax.default_backend(),
              "spread": args.spread, "frames": args.frames,
              "seed": args.seed,
              "noise": {"pixel_sigma": args.pixel_sigma,
                        "camera_dropout": args.cam_dropout,
                        "joint_dropout": args.joint_dropout,
                        "spurious_rate": args.spurious_rate,
                        "outlier_rate": args.outlier_rate}}

    # the prior variant is part of the checkpoint contract (pack.py:
    # train and infer with the SAME setting) — read it from the meta like
    # eval_arplab.py/the CLI do.  Before 2026-08-19 this was missing and
    # every Panoptic pipeline eval packed the default MEAN prior under a
    # median-prior-trained checkpoint (small in-distribution skew on this
    # rig: no near-degenerate pairs; re-measured rows -> r2k reports).
    prior = lmeta.get("prior", "mean")
    report["lifter_prior"] = prior
    pipe = PoseEstimationPipeline(rig_config, rig, mparams, mcfg,
                                  lparams, lcfg, slot_buckets=(S,),
                                  person_buckets=(8,), lifter_prior=prior,
                                  prior_gate_px=args.prior_gate_px)
    if args.prior_gate_px is not None:
        report["prior_gate_px"] = args.prior_gate_px
    pipe_tri = PoseEstimationPipeline(rig_config, rig, mparams, mcfg,
                                      backend="triangulation",
                                      tri_variant=args.tri_variant,
                                      slot_buckets=(S,), person_buckets=(8,))
    if args.tri_variant != "median":
        report["tri_variant"] = args.tri_variant

    # --- matching quality by view count (≙ README.md:19-21 table) --------
    subsets = {"2_views": ("trackera", "trackerb"),
               "3_views": ("trackera", "trackerb", "trackerc"),
               "5_views": rig_config.camera_names}
    for tag, cams in subsets.items():
        restricted = [{c: f[c] for c in cams if c in f} for f in test_multi]
        r = run_sm_metrics(restricted, rig_config, pipe,
                           datastep=args.datastep)
        report[f"sm_{tag}"] = r
        print(tag, {k: round(v, 4) for k, v in r.items()
                    if isinstance(v, float)})
        # artifact decomposition: unassigned heads as singletons instead of
        # the reference's single lumped label (the ARI analog of dedup_gt)
        r1 = run_sm_metrics(restricted, rig_config, pipe,
                            datastep=args.datastep, unassigned="singleton")
        report[f"sm_{tag}_singleton"] = r1
        print(f"{tag}_singleton", {k: round(v, 4) for k, v in r1.items()
                                   if isinstance(v, float)})

    # --- 3D accuracy -------------------------------------------------------
    for tag, p in (("mlp", pipe), ("triangulation", pipe_tri)):
        r = run_pose_metrics(test_multi, rig_config, p,
                             datastep=args.datastep, fused=(tag == "mlp"))
        r.pop("ap_per_threshold", None)
        report[f"pose_{tag}"] = r
        print(tag, {k: round(v, 3) for k, v in r.items()
                    if isinstance(v, float)})

    out = args.out or os.path.join(args.models, "eval_report.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2, default=float)
    print("wrote", out)


if __name__ == "__main__":
    main()
