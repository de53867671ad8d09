"""Diagnose the ARPLAB lifter's MLP-vs-DLT gap at its source.

eval_arplab.py showed the trained ARP MLP (41 mm MPJPE) losing to classical
triangulation (16 mm) on dense (1-3 person) scenes — the opposite of the
Panoptic result.  This script separates the two candidate causes on
single-person frames with oracle (training-style) packing:

  * intrinsic lifter quality: MLP MPJPE vs the DLT *prior it was given as
    input* (fields 11:14 of the 14-number block,
    reference utils/pose_estimator_dataset_from_json.py:199-217) on
    all-camera inputs;
  * robustness: the same comparison under forced camera dropout (the
    partial-visibility regime dense scenes create), where the Panoptic MLP
    earns its keep.

If MLP ≈ prior on all-cam inputs but dense eval is much worse, the gap is
scene packing / matching, not the lifter.  If MLP ≫ prior here too, the
lifter underfits and more training (or lr decay) is the fix.

Usage: python scripts/diag_lifter_prior.py --lifter runs/arp_lifter --env ARPLAB [--n 300]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lifter", required=True)
    ap.add_argument("--env", default="ARPLAB",
                    choices=["PANOPTIC", "ARPLAB"])
    ap.add_argument("--n", type=int, default=300)
    ap.add_argument("--seed", type=int, default=4242)
    ap.add_argument("--spread", default="0.8,2.0")
    ap.add_argument("--min-cam-dist", type=float, default=1.2)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (leave the TPU to training)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    sp = [float(x) for x in args.spread.split(",")]
    spread = sp[0] if len(sp) == 1 else tuple(sp)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/mpe3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from mpe3d_tpu.config import LifterConfig, get_rig
    from mpe3d_tpu.data.frames import parse_frame_gt
    from mpe3d_tpu.data.synthetic import (SceneNoise, generate_frames,
                                          synthetic_ring_rig)
    from mpe3d_tpu.geometry.calib_io import rig_from_files
    from mpe3d_tpu.models.mlp import apply_lifter, init_lifter
    from mpe3d_tpu.train.checkpoint import (lifter_config_from_meta,
                                            load_checkpoint, read_meta)
    from mpe3d_tpu.train.lifter_data import build_lifter_dataset

    rig_config = get_rig(args.env)
    ref_tm = ("/root/reference/tm_arp.pickle" if args.env == "ARPLAB"
              else "/root/reference/tm_panoptic.pickle")
    rig = (rig_from_files(rig_config, ref_tm) if os.path.exists(ref_tm)
           else synthetic_ring_rig(rig_config))
    noise = SceneNoise(pixel_sigma=1.5, joint_dropout=0.05,
                       spurious_rate=0.0, camera_dropout=0.0)
    frames = generate_frames(rig_config, rig, args.n, n_people=(1, 1),
                             seed=args.seed, noise=noise, spread=spread,
                             min_cam_dist=args.min_cam_dist)

    lcfg = LifterConfig(in_dim=rig_config.lifter_input_dim,
                        out_dim=rig_config.n_joints * 3)
    lmeta = read_meta(os.path.join(args.lifter, "pose_estimator"))
    lcfg = lifter_config_from_meta(lmeta, lcfg)
    lparams, _, _ = load_checkpoint(
        os.path.join(args.lifter, "pose_estimator"),
        init_lifter(jax.random.PRNGKey(1), lcfg))

    # oracle packing: exactly the training path, no augmentation
    prior = lmeta.get("prior", "mean")
    net, _err = build_lifter_dataset(frames, rig_config, rig, augment=False,
                                     prior=prior)
    gts = np.stack([parse_frame_gt(fr, rig_config).gt3d[0] for fr in frames])

    used_idx = rig_config.used_camera_indices()
    Cu, J = len(used_idx), rig_config.n_joints
    blocks = net.reshape(-1, Cu, J, 14)
    uj = np.asarray(rig_config.used_joints)

    def mpjpe(pred, gt, mask):  # [N, J, 3] metres -> mm over masked joints
        err = np.linalg.norm(pred[:, uj] - gt[:, uj], axis=-1)   # [N, Ju]
        m = mask[:, uj]
        return float((err * m).sum() / max(m.sum(), 1) * 1000.0)

    fwd = jax.jit(lambda x: apply_lifter(lparams, x, lcfg))
    report = {"lifter_meta": {k: lmeta.get(k) for k in ("epoch", "val_loss")},
              "n": len(net), "rows": {}}

    def run(tag, inputs):
        pred = np.asarray(fwd(jnp.asarray(inputs))).reshape(-1, J, 3) * 10.0
        b = inputs.reshape(-1, Cu, J, 14)
        prior = b[:, 0, :, 11:14] * 10.0          # same value in every block
        pok = b[:, 0, :, 10] > 0                  # prior-valid joints [N, J]
        ones = np.ones_like(pok, np.float32)
        row = {"mlp_mpjpe_mm": mpjpe(pred, gts, ones),
               "mlp_priorok_mm": mpjpe(pred, gts, pok.astype(np.float32)),
               "prior_priorok_mm": mpjpe(prior, gts, pok.astype(np.float32)),
               "mlp_noprior_mm": mpjpe(pred, gts, (~pok).astype(np.float32)),
               "prior_ok_frac": float(pok[:, uj].mean())}
        report["rows"][tag] = row
        print(f"{tag:24s} MLP(all) {row['mlp_mpjpe_mm']:6.1f} | "
              f"MLP(prior-ok) {row['mlp_priorok_mm']:6.1f} | "
              f"prior {row['prior_priorok_mm']:6.1f} | "
              f"MLP(no-prior) {row['mlp_noprior_mm']:6.1f} mm "
              f"(ok {row['prior_ok_frac']:.2f})")

    run("all cameras", net)

    # forced camera dropout, triangulation fields kept (training-aug
    # semantics: reference pose_estimator_dataset_from_json.py:219-229)
    rng = np.random.default_rng(0)
    for keep_n in (4, 3, 2):
        masked = blocks.copy()
        for i in range(len(masked)):
            drop = rng.choice(Cu, size=Cu - keep_n, replace=False)
            masked[i, drop, :, 0:10] = 0.0
        run(f"{keep_n} of {Cu} cameras", masked.reshape(len(masked), -1))

    out = args.out or os.path.join(args.lifter, "diag_lifter_prior.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
