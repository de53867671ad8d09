"""Small-scale CPU validation of Polyak/EMA lifter averaging (--ema).

Controlled A/B at reduced width on the Panoptic rig: identical data,
seeds and hyperparameters, three arms (ema off / 0.99 / 0.999), scored by
packed-input MPJPE against synthetic GT (the diag_lifter_prior.py oracle
protocol) plus the dev-loss trace.  Full-scale confirmation belongs on the
TPU legs (train_lifter_big --ema); this experiment establishes direction
and rough magnitude without the chip.

Usage: python scripts/ema_cpu_experiment.py [--out runs/ema_cpu.json]
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
    ap.add_argument("--out", default="runs/ema_cpu.json")
    ap.add_argument("--n-train", type=int, default=2500)
    ap.add_argument("--n-eval", type=int, default=400)
    ap.add_argument("--epochs", type=int, default=240)
    ap.add_argument("--widths", default="256,256")
    ap.add_argument("--decays", default="0.0,0.99,0.999")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/mpe3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from mpe3d_tpu.config import PANOPTIC, LifterConfig, LifterTrainConfig
    from mpe3d_tpu.data.frames import parse_frame_gt
    from mpe3d_tpu.data.synthetic import (SceneNoise, generate_frames,
                                          synthetic_ring_rig)
    from mpe3d_tpu.geometry.calib_io import rig_from_files
    from mpe3d_tpu.models.mlp import apply_lifter
    from mpe3d_tpu.train.lifter import train_lifter
    from mpe3d_tpu.train.lifter_data import build_lifter_dataset

    rig_config = PANOPTIC
    ref_tm = "/root/reference/tm_panoptic.pickle"
    rig = (rig_from_files(rig_config, ref_tm) if os.path.exists(ref_tm)
           else synthetic_ring_rig(rig_config))
    # production-leg noise (train_lifter_big.py) and volume coverage
    noise = SceneNoise(pixel_sigma=1.5, joint_dropout=0.05,
                       spurious_rate=0.1, camera_dropout=0.05)
    spread, mcd = (0.8, 2.0), 1.2
    fr_t = generate_frames(rig_config, rig, args.n_train, n_people=(1, 1),
                           seed=100, noise=noise, spread=spread,
                           min_cam_dist=mcd)
    fr_d = generate_frames(rig_config, rig, 400, n_people=(1, 1),
                           seed=997, noise=noise, spread=spread,
                           min_cam_dist=mcd)
    # eval frames: milder noise, the diag protocol
    fr_e = generate_frames(rig_config, rig, args.n_eval, n_people=(1, 1),
                           seed=4242,
                           noise=SceneNoise(pixel_sigma=1.5,
                                            joint_dropout=0.05),
                           spread=spread, min_cam_dist=mcd)

    prior = "median"
    net_t, err_t = build_lifter_dataset(fr_t, rig_config, rig, augment=True,
                                        max_combinations=2, prior=prior)
    net_d, err_d = build_lifter_dataset(fr_d, rig_config, rig, augment=False,
                                        prior=prior)
    net_e, _ = build_lifter_dataset(fr_e, rig_config, rig, augment=False,
                                    prior=prior)
    gts = np.stack([parse_frame_gt(fr, rig_config).gt3d[0] for fr in fr_e])
    uj = np.asarray(rig_config.used_joints)

    widths = tuple(int(w) for w in args.widths.split(","))
    cfg = LifterConfig(in_dim=rig_config.lifter_input_dim,
                       out_dim=rig_config.n_joints * 3,
                       widths=widths, residual_prior=True)

    def mpjpe(params):
        pred = np.asarray(apply_lifter(params, net_e, cfg))
        pred = pred.reshape(-1, rig_config.n_joints, 3) * 10.0
        err = np.linalg.norm(pred[:, uj] - gts[:, uj], axis=-1)
        return float(err.mean() * 1000.0)

    rows = []
    for d in (float(x) for x in args.decays.split(",")):
        tcfg = LifterTrainConfig(epochs=args.epochs, batch_size=512,
                                 eval_every=10, patience=10**9, lr=3e-4,
                                 loss="huber", ema_decay=d, seed=7)
        t0 = time.time()
        res = train_lifter(net_t, err_t, net_d, err_d, rig_config, rig,
                           cfg, tcfg, log=lambda s: None)
        row = {"ema_decay": d,
               "mpjpe_mm": round(mpjpe({"layers": res.params["layers"]}), 3)
               if isinstance(res.params, dict) and "layers" in res.params
               else round(mpjpe(res.params), 3),
               "best_val_loss": float(res.best_val_loss),
               "final_val_loss": float(res.history[-1]["val_loss"]),
               "epochs": res.epochs_run,
               "wall_s": round(time.time() - t0, 1)}
        rows.append(row)
        print(row, flush=True)

    out = {"protocol": {"n_train": args.n_train, "widths": widths,
                        "epochs": args.epochs, "loss": "huber",
                        "prior": prior, "residual_prior": True,
                        "spread": list(spread), "min_cam_dist": mcd,
                        "backend": "cpu"},
           "rows": rows}
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
