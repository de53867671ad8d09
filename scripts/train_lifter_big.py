"""Large lifter training run: from-scratch (or --resume) on fresh synthetic
single-person recordings with the articulated pose sampler.

Usage: python scripts/train_lifter_big.py --out runs/lifter_big
           [--n-sp 20000] [--files 3] [--epochs 4000] [--batch-size 2048]
           [--lr 1e-4] [--resume]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-sp", type=int, default=20000)
    ap.add_argument("--files", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=4000)
    ap.add_argument("--batch-size", type=int, default=2048)
    ap.add_argument("--patience", type=int, default=60)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--resume", action="store_true",
                    help="warm-start from <out>/pose_estimator if present")
    ap.add_argument("--seed-base", type=int, default=1000,
                    help="data seed base — bump per resume leg so each leg "
                    "trains on fresh frames")
    ap.add_argument("--spread", default="1.2",
                    help="placement-disc radius in m, or 'lo,hi' to sample "
                    "per frame (volume-covering training)")
    ap.add_argument("--min-cam-dist", type=float, default=0.0,
                    help="resample people closer than this to any camera "
                    "(keeps the outlier-dominated loss sane on wide spreads)")
    ap.add_argument("--env", default="PANOPTIC",
                    choices=["PANOPTIC", "ARPLAB"],
                    help="rig preset (ARPLAB = the reference's second "
                    "environment: 6 cameras incl. robot-mounted, "
                    "parameters.py:79-123)")
    ap.add_argument("--loss", default="reference",
                    choices=["reference", "per_term", "huber"],
                    help="reprojection-loss variant (lifting/loss.py): the "
                    "reference's summed-L1-squared stalls at ~2x the DLT "
                    "prior's MPJPE; per_term/huber converge to the "
                    "reprojection least-squares optimum")
    ap.add_argument("--compute-dtype", default="fp32",
                    choices=["fp32", "bf16"],
                    help="training matmul operand dtype (RESULTS MFU "
                    "ladder: bf16 operands, fp32 master+accum)")
    ap.add_argument("--ema", type=float, default=0.0,
                    help="Polyak/EMA weight-averaging decay (0 = off; "
                    "typical 0.999).  Eval/early-stop/checkpoints use the "
                    "averaged weights (LifterTrainConfig.ema_decay).")
    ap.add_argument("--prior-dropout", type=float, default=0.0,
                    help="per-joint chance of zeroing the triangulated-prior "
                    "fields on augmented copies (trains the residual head's "
                    "no-prior fallback; lifting/pack.apply_prior_dropout)")
    ap.add_argument("--outlier-rate", type=float, default=0.0,
                    help="heavy-tailed detector noise in the training data "
                    "(SceneNoise.outlier_rate); match the eval regime")
    ap.add_argument("--residual-prior", action="store_true",
                    help="lifter predicts a correction to its triangulated "
                    "prior (zero-init head; config.LifterConfig) — recorded "
                    "in the checkpoint meta, reconstructed on resume/eval")
    ap.add_argument("--prior", default="mean",
                    choices=["mean", "median", "irls"],
                    help="triangulated-prior variant for the lifter input "
                    "(lifting/pack.py) — use 'median' on ARPLAB: its two "
                    "robot cameras form an 11.5 cm-baseline pair that "
                    "poisons the reference's plain pair mean.  Recorded in "
                    "the checkpoint meta; inference must match.")
    ap.add_argument("--cache-dir", default=None,
                    help="directory for packed-dataset npz caches, keyed by "
                    "every generation/packing knob — lets a CPU process "
                    "pre-build the dataset while the TPU is busy/down")
    ap.add_argument("--build-cache-only", action="store_true",
                    help="build the dataset cache (requires --cache-dir) "
                    "and exit without training")
    ap.add_argument("--widths", default=None,
                    help="comma-separated hidden widths (default: the "
                    "reference architecture 3072,3072,2048,2048,1024x4; "
                    "e.g. 1536,1536,1024,1024,512,512,512,512 trains the "
                    "~4x-smaller compact serving variant)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU jax backend (e.g. for "
                    "--build-cache-only while the TPU is busy)")
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

    from mpe3d_tpu.config import LifterConfig, LifterTrainConfig, get_rig
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

    os.makedirs(args.out, exist_ok=True)
    rig_config = get_rig(args.env)
    ref_tm = ("/root/reference/tm_arp.pickle" if args.env == "ARPLAB"
              else "/root/reference/tm_panoptic.pickle")
    rig = (rig_from_files(rig_config, ref_tm) if os.path.exists(ref_tm)
           else synthetic_ring_rig(rig_config))
    lcfg = LifterConfig(in_dim=rig_config.lifter_input_dim,
                        out_dim=rig_config.n_joints * 3,
                        residual_prior=args.residual_prior)
    if args.widths:
        # compact/capacity-ladder variants: checkpoints record widths in
        # their meta, so every loader (eval scripts, pipeline, CLI)
        # reconstructs the right architecture without a flag
        import dataclasses
        lcfg = dataclasses.replace(
            lcfg, widths=tuple(int(w) for w in args.widths.split(",")))
    log = JsonlLogger(os.path.join(args.out, "run.jsonl"))

    params = None
    ckpt = os.path.join(args.out, "pose_estimator")
    if args.resume and os.path.exists(ckpt + ".npz"):
        lcfg = lifter_config_from_meta(read_meta(ckpt), lcfg)
        params, _, meta = load_checkpoint(
            ckpt, init_lifter(jax.random.PRNGKey(1), lcfg))
        ck_prior = meta.get("prior", "mean")
        if ck_prior != args.prior:
            sys.exit(f"checkpoint {ckpt} was trained with prior={ck_prior}; "
                     f"pass --prior {ck_prior} or start a fresh --out")
        log.event("resume", from_epoch=meta.get("epoch"),
                  from_val=meta.get("val_loss"))

    noise = SceneNoise(pixel_sigma=1.5, joint_dropout=0.05,
                       spurious_rate=0.1, camera_dropout=0.05,
                       outlier_rate=args.outlier_rate)
    cache_t = cache_d = None
    if args.cache_dir:
        os.makedirs(args.cache_dir, exist_ok=True)
        # every knob that changes frame generation or packing is in the key
        key = (f"{args.env}_sb{args.seed_base}_{args.files}x{args.n_sp}"
               f"_sp{args.spread}_mc{args.min_cam_dist}_pr{args.prior}"
               f"_pd{args.prior_dropout}_or{args.outlier_rate}")
        cache_t = os.path.join(args.cache_dir, key + "_train.npz")
        cache_d = os.path.join(args.cache_dir, key + "_dev.npz")
    cached = (cache_t and os.path.exists(cache_t)
              and os.path.exists(cache_d))

    t0 = time.time()
    if cached:                  # frame generation feeds only the packer
        sp, dev = [], [[]]
        log.event("gen", cached=True)
    else:
        sp = [generate_single_person_frames(rig_config, rig, args.n_sp,
                                            seed=args.seed_base + s,
                                            noise=noise, spread=spread,
                                            min_cam_dist=args.min_cam_dist)
              for s in range(args.files)]
        dev = [generate_single_person_frames(rig_config, rig,
                                             max(200, args.n_sp // 10),
                                             seed=args.seed_base + 997 + s,
                                             noise=noise, spread=spread,
                                             min_cam_dist=args.min_cam_dist)
               for s in range(2)]
        log.event("gen", n_train_frames=args.files * args.n_sp,
                  gen_s=round(time.time() - t0, 1))

    t0 = time.time()
    net_t, err_t = build_lifter_dataset([f for fl in sp for f in fl],
                                        rig_config, rig, prior=args.prior,
                                        prior_dropout=args.prior_dropout,
                                        cache_path=cache_t)
    net_d, err_d = build_lifter_dataset([f for fl in dev for f in fl],
                                        rig_config, rig, augment=False,
                                        prior=args.prior,
                                        cache_path=cache_d)
    log.event("dataset", train=len(net_t), dev=len(net_d),
              build_s=round(time.time() - t0, 1))
    if args.build_cache_only:
        print("cache built:", cache_t, cache_d)
        return

    # graceful stop on SIGTERM (e.g. `timeout`-bounded legs): exit at the
    # next epoch boundary so train_lifter's finally-persist runs (a raw
    # SIGTERM would skip it; ≙ the reference's SIGINT guard,
    # train_pose_estimator.py:111-127)
    import signal
    stop = {"flag": False}
    signal.signal(signal.SIGTERM, lambda *_: stop.update(flag=True))

    tcfg = LifterTrainConfig(epochs=args.epochs, batch_size=args.batch_size,
                             eval_every=10, patience=args.patience,
                             lr=args.lr, loss=args.loss,
                             ema_decay=args.ema,
                             compute_dtype=args.compute_dtype)
    res = train_lifter(net_t, err_t, net_d, err_d, rig_config, rig, lcfg,
                       tcfg, params=params, checkpoint_path=ckpt, log=log,
                       stop_flag=lambda: stop["flag"],
                       extra_meta={"prior": args.prior})
    log.event("done", best_val=res.best_val_loss, epochs=res.epochs_run)
    print("best_val", res.best_val_loss, "epochs", res.epochs_run)


if __name__ == "__main__":
    main()
