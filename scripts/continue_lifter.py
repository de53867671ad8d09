"""Continue lifter training from a checkpoint (warm start, lower LR).

Usage: python scripts/continue_lifter.py --models runs/full_tpu2
           [--epochs 3000] [--lr 5e-5]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", required=True)
    ap.add_argument("--epochs", type=int, default=3000)
    ap.add_argument("--lr", type=float, default=5e-5)
    ap.add_argument("--patience", type=int, default=60)
    ap.add_argument("--n-sp", type=int, default=500)
    ap.add_argument("--batch-size", type=int, default=2048)
    ap.add_argument("--seed-base", type=int, default=0,
                    help="bump per leg so each continuation sees fresh frames")
    ap.add_argument("--spread", default="1.2",
                    help="placement-disc radius in m, or 'lo,hi' per frame — "
                    "MATCH the original training spread or the model snaps "
                    "back to the narrow distribution")
    ap.add_argument("--min-cam-dist", type=float, default=0.0)
    ap.add_argument("--ema", type=float, default=0.0,
                    help="Polyak/EMA averaging decay (0 = off; see "
                    "LifterTrainConfig.ema_decay)")
    args = ap.parse_args()
    sp_parts = [float(x) for x in args.spread.split(",")]
    if len(sp_parts) > 2:
        ap.error("--spread takes one value or lo,hi")
    spread = sp_parts[0] if len(sp_parts) == 1 else tuple(sp_parts)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/mpe3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from mpe3d_tpu.config import PANOPTIC, LifterConfig, LifterTrainConfig
    from mpe3d_tpu.data.synthetic import (SceneNoise,
                                          generate_single_person_frames,
                                          synthetic_ring_rig)
    from mpe3d_tpu.geometry.calib_io import rig_from_files
    from mpe3d_tpu.models.mlp import init_lifter
    from mpe3d_tpu.train.checkpoint import (lifter_config_from_meta,
                                            load_checkpoint, read_meta)
    from mpe3d_tpu.train.lifter import train_lifter
    from mpe3d_tpu.train.lifter_data import build_lifter_dataset
    from mpe3d_tpu.utils.logging import JsonlLogger

    rig_config = PANOPTIC
    ref_tm = "/root/reference/tm_panoptic.pickle"
    rig = (rig_from_files(rig_config, ref_tm) if os.path.exists(ref_tm)
           else synthetic_ring_rig(rig_config))
    lcfg = LifterConfig(in_dim=rig_config.lifter_input_dim,
                        out_dim=rig_config.n_joints * 3)
    lcfg = lifter_config_from_meta(
        read_meta(os.path.join(args.models, "pose_estimator")), lcfg)
    params, _, meta = load_checkpoint(
        os.path.join(args.models, "pose_estimator"),
        init_lifter(jax.random.PRNGKey(1), lcfg))
    log = JsonlLogger(os.path.join(args.models, "continue.jsonl"))
    log.event("resume", from_epoch=meta.get("epoch"),
              from_val=meta.get("val_loss"))

    noise = SceneNoise(pixel_sigma=1.5, joint_dropout=0.05,
                       spurious_rate=0.1, camera_dropout=0.05)
    sp = [generate_single_person_frames(rig_config, rig, args.n_sp,
                                        seed=args.seed_base + s, noise=noise,
                                        spread=spread,
                                        min_cam_dist=args.min_cam_dist)
          for s in (0, 1, 2)]
    # dev seeds live in a far-offset range so a later resume leg with
    # --seed-base +10 can never train on a previous leg's dev frames
    # (same +997 convention as train_lifter_big.py)
    dev = [generate_single_person_frames(rig_config, rig, args.n_sp // 3,
                                         seed=args.seed_base + 997 + s,
                                         noise=noise, spread=spread,
                                         min_cam_dist=args.min_cam_dist)
           for s in (0, 1)]
    net_t, err_t = build_lifter_dataset([f for fl in sp for f in fl],
                                        rig_config, rig)
    net_d, err_d = build_lifter_dataset([f for fl in dev for f in fl],
                                        rig_config, rig, augment=False)
    # graceful stop on SIGTERM — see train_lifter_big.py
    import signal
    stop = {"flag": False}
    signal.signal(signal.SIGTERM, lambda *_: stop.update(flag=True))

    tcfg = LifterTrainConfig(epochs=args.epochs, batch_size=args.batch_size,
                             eval_every=10, patience=args.patience,
                             lr=args.lr,
                             ema_decay=args.ema)
    res = train_lifter(net_t, err_t, net_d, err_d, rig_config, rig, lcfg,
                       tcfg, params=params,
                       checkpoint_path=os.path.join(args.models,
                                                    "pose_estimator"),
                       log=log, stop_flag=lambda: stop["flag"])
    log.event("continue_done", best_val=res.best_val_loss,
              epochs=res.epochs_run)


if __name__ == "__main__":
    main()
