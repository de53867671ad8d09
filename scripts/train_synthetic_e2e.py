"""End-to-end quality validation: train both models on synthetic data and
score the full pipeline against the reference's metric protocol.

Usage: python scripts/train_synthetic_e2e.py [--out DIR] [--quick]

Generates single-person recordings (matcher + lifter training input) and
multi-person test frames with GT on the Panoptic rig, trains the matcher and
lifter, then reports:
  * sm-metrics-without-gt style ARI/H/C/Vm for the trained matcher,
  * MPJPE/mAP/mR for the full pipeline (MLP and triangulation backends),
  * per-frame timing.
Writes report JSON + checkpoints to --out.
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
    ap.add_argument("--out", default="runs/synthetic_e2e")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/mpe3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from mpe3d_tpu.config import (PANOPTIC, LifterConfig, LifterTrainConfig,
                                  MatcherConfig, MatcherTrainConfig)
    from mpe3d_tpu.data.synthetic import (SceneNoise, generate_frames,
                                          generate_single_person_frames,
                                          synthetic_ring_rig)
    from mpe3d_tpu.eval.runners import (run_pose_metrics, run_sm_metrics,
                                        run_sm_metrics_without_gt)
    from mpe3d_tpu.geometry.calib_io import rig_from_files
    from mpe3d_tpu.matching.features import build_topology
    from mpe3d_tpu.pipeline import PoseEstimationPipeline
    from mpe3d_tpu.train.lifter import train_lifter
    from mpe3d_tpu.train.lifter_data import build_lifter_dataset
    from mpe3d_tpu.train.matcher import train_matcher
    from mpe3d_tpu.train.matcher_data import build_matcher_scenes
    from mpe3d_tpu.utils.logging import JsonlLogger

    os.makedirs(args.out, exist_ok=True)
    log = JsonlLogger(os.path.join(args.out, "run.jsonl"))
    rig_config = PANOPTIC
    ref_tm = "/root/reference/tm_panoptic.pickle"
    rig = (rig_from_files(rig_config, ref_tm) if os.path.exists(ref_tm)
           else synthetic_ring_rig(rig_config))

    n_sp = 120 if args.quick else 500
    limit = 800 if args.quick else 12000
    m_epochs = 12 if args.quick else 60
    l_epochs = 60 if args.quick else 1500
    noise = SceneNoise(pixel_sigma=1.5, joint_dropout=0.05,
                       spurious_rate=0.1, camera_dropout=0.05)

    t0 = time.time()
    sp_files = [generate_single_person_frames(rig_config, rig, n_sp, seed=s,
                                              noise=noise)
                for s in (0, 1, 2)]
    dev_files = [generate_single_person_frames(rig_config, rig, n_sp // 3,
                                               seed=s, noise=noise)
                 for s in (10, 11)]
    test_sp = [generate_single_person_frames(rig_config, rig, n_sp // 3,
                                             seed=20, noise=noise)]
    test_multi = generate_frames(rig_config, rig, 120 if args.quick else 240,
                                 n_people=(2, 4), seed=30, noise=noise)
    log.event("data", n_single=3 * n_sp, n_multi=len(test_multi),
              gen_s=round(time.time() - t0, 1))

    # ---- matcher ---------------------------------------------------------
    S = 6
    topo = build_topology(rig_config.n_matching_cameras, S)
    mcfg = MatcherConfig(in_dim=rig_config.matcher_feature_dim)
    mtcfg = MatcherTrainConfig(epochs=m_epochs, limit=limit, eval_every=2,
                               patience=10)
    t0 = time.time()
    train_scenes = build_matcher_scenes(sp_files, rig_config, topo,
                                        limit=limit, seed=0)
    dev_scenes = build_matcher_scenes(dev_files, rig_config, topo,
                                      limit=limit // 4, seed=1)
    log.event("matcher_scenes", train=len(train_scenes), dev=len(dev_scenes),
              build_s=round(time.time() - t0, 1))
    mres = train_matcher(train_scenes, dev_scenes, rig_config, rig, topo,
                         mcfg, mtcfg,
                         checkpoint_path=os.path.join(args.out,
                                                      "skeleton_matching"),
                         log=log)
    log.event("matcher_done", best_val=mres.best_val_loss,
              epochs=mres.epochs_run)

    # ---- lifter ----------------------------------------------------------
    lcfg = LifterConfig(in_dim=rig_config.lifter_input_dim,
                        out_dim=rig_config.n_joints * 3)
    ltcfg = LifterTrainConfig(epochs=l_epochs, batch_size=512, eval_every=10,
                              patience=30, lr=1e-4)
    t0 = time.time()
    net_t, err_t = build_lifter_dataset(
        [f for fl in sp_files for f in fl], rig_config, rig)
    net_d, err_d = build_lifter_dataset(
        [f for fl in dev_files for f in fl], rig_config, rig, augment=False)
    log.event("lifter_data", train=len(net_t), dev=len(net_d),
              build_s=round(time.time() - t0, 1))
    lres = train_lifter(net_t, err_t, net_d, err_d, rig_config, rig,
                        lcfg, ltcfg,
                        checkpoint_path=os.path.join(args.out,
                                                     "pose_estimator"),
                        log=log)
    log.event("lifter_done", best_val=lres.best_val_loss,
              epochs=lres.epochs_run)

    # ---- evaluation ------------------------------------------------------
    report = {"matcher_val_loss": mres.best_val_loss,
              "lifter_val_loss": lres.best_val_loss}
    pipe_mlp = PoseEstimationPipeline(rig_config, rig, mres.params, mcfg,
                                      lres.params, lcfg,
                                      slot_buckets=(S,), person_buckets=(8,))
    pipe_tri = PoseEstimationPipeline(rig_config, rig, mres.params, mcfg,
                                      backend="triangulation",
                                      slot_buckets=(S,), person_buckets=(8,))

    report["sm_without_gt"] = run_sm_metrics_without_gt(
        test_sp, rig_config, pipe_mlp, limit=150)
    log.event("sm_without_gt", **{k: v for k, v in
                                  report["sm_without_gt"].items()})
    report["sm_metrics"] = run_sm_metrics(test_multi, rig_config, pipe_mlp,
                                          datastep=2)
    log.event("sm_metrics", **{k: v for k, v in report["sm_metrics"].items()})

    for tag, pipe in (("mlp", pipe_mlp), ("triangulation", pipe_tri)):
        r = run_pose_metrics(test_multi, rig_config, pipe, datastep=2)
        r.pop("ap_per_threshold", None)
        report[f"pose_{tag}"] = r
        log.event(f"pose_{tag}", **{k: v for k, v in r.items()})

    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=2, default=float)
    print(json.dumps(report, indent=2, default=float))


if __name__ == "__main__":
    main()
