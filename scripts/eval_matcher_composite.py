"""Composite-protocol matcher eval for controlled variant comparisons.

Scores one or more matcher checkpoints with the reference's own published
matcher protocol (sm_metrics_without_gt.py:101-167: composite single-person
recordings → decode(model) vs decode(labels) → ARI/H/C/Vm) on a shared,
seeded test draw — used to compare GAT training variants (dropout, BCE,
residual) under identical data.

Usage: python scripts/eval_matcher_composite.py \
           --matchers runs/m_base runs/m_drop runs/m_bce [--cpu]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--matchers", nargs="+", required=True,
                    help="directories each holding skeleton_matching.npz")
    ap.add_argument("--env", default="PANOPTIC",
                    choices=["PANOPTIC", "ARPLAB"])
    ap.add_argument("--limit", type=int, default=600,
                    help="number of composite scenes")
    ap.add_argument("--n-sp", type=int, default=400)
    ap.add_argument("--seed", type=int, default=777,
                    help="test-data seed (shared across all checkpoints)")
    ap.add_argument("--spread", type=float, default=1.2)
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (leave the TPU free)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/mpe3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from mpe3d_tpu.config import MatcherConfig, get_rig
    from mpe3d_tpu.data.synthetic import (SceneNoise,
                                          generate_single_person_frames,
                                          synthetic_ring_rig)
    from mpe3d_tpu.eval.runners import run_sm_metrics_without_gt
    from mpe3d_tpu.geometry.calib_io import rig_from_files
    from mpe3d_tpu.models.gat import init_matcher
    from mpe3d_tpu.pipeline import PoseEstimationPipeline
    from mpe3d_tpu.train.checkpoint import (load_checkpoint,
                                            matcher_config_from_meta,
                                            read_meta)

    rig_config = get_rig(args.env)
    ref_tm = ("/root/reference/tm_arp.pickle" if args.env == "ARPLAB"
              else "/root/reference/tm_panoptic.pickle")
    rig = (rig_from_files(rig_config, ref_tm) if os.path.exists(ref_tm)
           else synthetic_ring_rig(rig_config))
    noise = SceneNoise(pixel_sigma=1.5, joint_dropout=0.05,
                       spurious_rate=0.1, camera_dropout=0.05)
    test_sp = [generate_single_person_frames(rig_config, rig, args.n_sp,
                                             seed=args.seed + s, noise=noise,
                                             spread=args.spread)
               for s in range(4)]

    report = {}
    for mdir in args.matchers:
        path = os.path.join(mdir, "skeleton_matching")
        meta = read_meta(path)
        mcfg = matcher_config_from_meta(
            meta, MatcherConfig(in_dim=rig_config.matcher_feature_dim))
        mparams, _, _ = load_checkpoint(
            path, init_matcher(jax.random.PRNGKey(0), mcfg))
        S = int(meta.get("n_slots", 6))
        pipe = PoseEstimationPipeline(rig_config, rig, mparams, mcfg,
                                      backend="triangulation",
                                      slot_buckets=(S,), person_buckets=(8,))
        r = run_sm_metrics_without_gt(test_sp, rig_config, pipe,
                                      limit=args.limit, seed=args.seed)
        r["epoch"] = meta.get("epoch")
        r["val_loss"] = meta.get("val_loss")
        report[mdir] = r
        print(mdir, json.dumps(r, default=float))

    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2, default=float)


if __name__ == "__main__":
    main()
