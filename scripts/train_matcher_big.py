"""Large matcher training run: more composites, bigger batch, longer patience.

Usage: python scripts/train_matcher_big.py --out runs/matcher_big
           [--env PANOPTIC|ARPLAB] [--limit 40000] [--epochs 200]
           [--batch-size 60]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--limit", type=int, default=40000)
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--batch-size", type=int, default=60)
    ap.add_argument("--patience", type=int, default=30)
    ap.add_argument("--n-sp", type=int, default=1200)
    ap.add_argument("--n-files", type=int, default=4)
    ap.add_argument("--slots", type=int, default=6)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--env", default="PANOPTIC",
                    choices=["PANOPTIC", "ARPLAB"])
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (leave the TPU free)")
    ap.add_argument("--spread", default="1.2",
                    help="placement-disc radius in m, or 'lo,hi' to sample "
                    "per frame (volume-covering training)")
    ap.add_argument("--feat-drop", type=float, default=0.0,
                    help="GAT feature dropout (train-time; gat2.py:27-34)")
    ap.add_argument("--attn-drop", type=float, default=0.0,
                    help="GAT attention dropout (train-time)")
    ap.add_argument("--residual", action="store_true",
                    help="GAT residual shortcut (gat2.py:42-48,69-75)")
    ap.add_argument("--bce", action="store_true",
                    help="BCE edge loss instead of the reference's MSE "
                    "(train_skeleton_matching.py:33 USE_BCE)")
    args = ap.parse_args()
    sp_parts = [float(x) for x in args.spread.split(",")]
    if len(sp_parts) > 2:
        ap.error("--spread takes one value or lo,hi")
    spread = sp_parts[0] if len(sp_parts) == 1 else tuple(sp_parts)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/mpe3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from mpe3d_tpu.config import get_rig, MatcherConfig, MatcherTrainConfig
    from mpe3d_tpu.data.synthetic import (SceneNoise,
                                          generate_single_person_frames,
                                          synthetic_ring_rig)
    from mpe3d_tpu.geometry.calib_io import rig_from_files
    from mpe3d_tpu.matching.features import build_topology
    from mpe3d_tpu.train.matcher import train_matcher
    from mpe3d_tpu.train.matcher_data import build_matcher_scenes
    from mpe3d_tpu.utils.logging import JsonlLogger

    os.makedirs(args.out, exist_ok=True)
    log = JsonlLogger(os.path.join(args.out, "run.jsonl"))
    rig_config = get_rig(args.env)
    ref_tm = ("/root/reference/tm_arp.pickle" if args.env == "ARPLAB"
              else "/root/reference/tm_panoptic.pickle")
    rig = (rig_from_files(rig_config, ref_tm) if os.path.exists(ref_tm)
           else synthetic_ring_rig(rig_config))
    noise = SceneNoise(pixel_sigma=1.5, joint_dropout=0.05,
                       spurious_rate=0.1, camera_dropout=0.05)

    # more source files → composites with up to n_files people
    sp = [generate_single_person_frames(rig_config, rig, args.n_sp, seed=s,
                                        noise=noise, spread=spread)
          for s in range(args.n_files)]
    dev = [generate_single_person_frames(rig_config, rig, args.n_sp // 4,
                                         seed=100 + s, noise=noise,
                                         spread=spread)
           for s in range(args.n_files)]
    topo = build_topology(rig_config.n_matching_cameras, args.slots)
    train = build_matcher_scenes(sp, rig_config, topo, limit=args.limit,
                                 seed=0)
    devs = build_matcher_scenes(dev, rig_config, topo,
                                limit=args.limit // 5, seed=1)
    log.event("scenes", train=len(train), dev=len(devs))
    tcfg = MatcherTrainConfig(epochs=args.epochs, batch_size=args.batch_size,
                              eval_every=2, patience=args.patience,
                              lr=args.lr, limit=args.limit,
                              use_bce=args.bce)
    cfg = MatcherConfig(in_dim=rig_config.matcher_feature_dim,
                        feat_drop=args.feat_drop, attn_drop=args.attn_drop,
                        residual=args.residual)
    res = train_matcher(train, devs, rig_config, rig, topo, cfg, tcfg,
                        checkpoint_path=os.path.join(args.out,
                                                     "skeleton_matching"),
                        log=log)
    log.event("done", best_val=res.best_val_loss, epochs=res.epochs_run)


if __name__ == "__main__":
    main()
