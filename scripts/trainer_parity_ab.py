"""Trainer-level golden parity A/B vs the reference's own training loop.

Round-2 VERDICT item 2: per-step compute parity (packer, loss, forward) was
already golden-tested against reference code run in-process; this closes the
remaining gap by training BOTH stacks end-to-end on identical data from an
identical initialisation and comparing loss trajectories + final packed
MPJPE:

  * the REFERENCE side runs the reference's own pieces — its
    ``PoseEstimatorDataset`` (utils/pose_estimator_dataset_from_json.py),
    its ``PoseEstimatorMLP`` (utils/mlp.py), its ``compute_error``
    (pose_estimator/train_pose_estimator.py:69-102, AST-extracted so the
    surrounding script never executes) — inside a faithful mirror of its
    training loop (train_pose_estimator.py:184-282: Adam(lr), MSELoss of
    the summed error vs zero, clip_grad_norm(10), DataLoader(batch),
    epoch loss = Σ batch_loss·bs / N);
  * OUR side is ``mpe3d_tpu.train.lifter.train_lifter`` (the production
    trainer: jit scan-epoch, optax adam + clip_by_global_norm) fed the
    SAME packed tensors (taken from the reference dataset object) and the
    SAME initial weights (the torch init imported through
    ``convert.torch_import.load_reference_lifter``).

Two modes:
  * default (``--epochs E``, shuffle OFF both sides): deterministic batch
    order — per-epoch train losses must track step-for-step (reported
    max relative deviation; the tests assert it).
  * ``--converge`` (shuffle ON both sides, more epochs): the production
    question — does our trainer reach the same quality?  Both final
    models are scored with the same packed-MPJPE protocol
    (scripts/ema_cpu_experiment.py oracle) on a held-out synthetic set.

Usage:
  python scripts/trainer_parity_ab.py [--epochs 12] [--n-train 256]
  python scripts/trainer_parity_ab.py --converge --epochs 120
Writes reports/trainer_parity_ab.json (or --out).
"""

import argparse
import ast
import json
import os
import sys
import time
import types

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

REF = "/root/reference"
TM = os.path.join(REF, "tm_panoptic.pickle")


# ---------------------------------------------------------------------------
# reference import scaffolding (mirrors tests/test_golden_reference.py)
# ---------------------------------------------------------------------------

def _install_pytransform3d_stub():
    if "pytransform3d" in sys.modules:
        return
    pkg = types.ModuleType("pytransform3d")

    class TransformManager:
        def __init__(self, *a, **k):
            pass

        def __setstate__(self, state):
            self.__dict__.update(state if isinstance(state, dict)
                                 else {"_state": state})

        def get_transform(self, frm, to):
            t = self.transforms
            if (frm, to) in t:
                return np.asarray(t[(frm, to)], np.float64)
            if (to, frm) in t:
                return np.linalg.inv(np.asarray(t[(to, frm)], np.float64))
            raise KeyError((frm, to))

    tm_mod = types.ModuleType("pytransform3d.transform_manager")
    tm_mod.TransformManager = TransformManager
    pkg.transform_manager = tm_mod
    sys.modules["pytransform3d"] = pkg
    sys.modules["pytransform3d.transform_manager"] = tm_mod
    sys.modules["pytransform3d.rotations"] = types.ModuleType(
        "pytransform3d.rotations")
    sys.modules["pytransform3d.transformations"] = types.ModuleType(
        "pytransform3d.transformations")


def _extract_compute_error(namespace):
    """Compile ONLY the reference's compute_error def (the module around it
    is a training script that runs on import)."""
    path = os.path.join(REF, "pose_estimator", "train_pose_estimator.py")
    with open(path) as f:
        tree = ast.parse(f.read())
    fn = next(n for n in tree.body
              if isinstance(n, ast.FunctionDef) and n.name == "compute_error")
    mod = ast.Module(body=[fn], type_ignores=[])
    exec(compile(mod, path, "exec"), namespace)
    return namespace["compute_error"]


class _RefModules:
    """Reference dataset/utils/parameters imported with cwd + sys.path set
    so their import-time calibration load succeeds."""

    def __enter__(self):
        _install_pytransform3d_stub()
        self.old_cwd = os.getcwd()
        self.added = []
        for p in (REF, os.path.join(REF, "utils")):
            if p not in sys.path:
                sys.path.insert(0, p)
                self.added.append(p)
        os.chdir(os.path.join(REF, "utils"))
        import pose_estimator_dataset_from_json as ref_ds
        import pose_estimator_utils as ref_utils
        from parameters import parameters as ref_params
        os.chdir(self.old_cwd)
        return ref_ds, ref_utils, ref_params

    def __exit__(self, *exc):
        os.chdir(self.old_cwd)
        for p in self.added:
            if p in sys.path:
                sys.path.remove(p)
        return False


def reference_training_run(net_err_from, epochs, batch_size, lr, shuffle,
                           init_state_path, log=print):
    """The reference training loop (train_pose_estimator.py:184-282) over
    the reference's own dataset/MLP/compute_error, run in-process on CPU.

    Returns (per-epoch train losses, final state_dict path)."""
    import torch
    from torch import nn

    with _RefModules() as (ref_ds, ref_utils, ref_params):
        from mlp import PoseEstimatorMLP   # REF/utils is on sys.path here

        ns = {"torch": torch, "device": torch.device("cpu"),
              "from_homogeneous": ref_utils.from_homogeneous,
              "from_homogeneous2": ref_utils.from_homogeneous2,
              "apply_distortion": ref_utils.apply_distortion}
        compute_error = _extract_compute_error(ns)

        # camera structures exactly as the trainer builds them (:140-154)
        tm = ref_ds.tm
        camera_d, camera_m, dists = [], [], []
        for ci, cam in enumerate(ref_params.camera_names):
            camera_d.append(torch.from_numpy(
                tm.get_transform("root", cam)).type(torch.float32))
            m = ref_utils.camera_matrix(ci, use_cuda=False)
            camera_m.append(m.type(torch.float32))
            dists.append(ref_utils.get_distortion_coefficients(ci))

        net, err = net_err_from
        ds = torch.utils.data.TensorDataset(torch.from_numpy(net),
                                            torch.from_numpy(err))
        torch.manual_seed(58008)                       # :131
        loader = torch.utils.data.DataLoader(ds, batch_size=batch_size,
                                             shuffle=shuffle)      # :169

        mlp = PoseEstimatorMLP(input_dimensions=net.shape[1],
                               output_dimensions=54)   # :160
        mlp.load_state_dict(torch.load(init_state_path,
                                       weights_only=True))
        loss_function = nn.MSELoss()                   # :174
        optimizer = torch.optim.Adam(mlp.parameters(), lr=lr)   # :179

        joint_list = list(range(18))
        losses = []
        for epoch in range(epochs):                    # :189
            mlp.train()
            batch_loss = 0.0
            for raw_inputs, orig_inputs in loader:     # :197-227
                optimizer.zero_grad()
                bs = raw_inputs.size()[0]
                outputs = mlp(raw_inputs)
                error = compute_error(ref_params, joint_list, raw_inputs,
                                      orig_inputs, outputs, bs,
                                      camera_d, camera_m, dists)
                target = torch.zeros(error.size())
                loss = loss_function(error, target)
                loss.backward()
                torch.nn.utils.clip_grad_norm_(parameters=mlp.parameters(),
                                               max_norm=10, norm_type=2.0)
                optimizer.step()
                batch_loss += loss.item() * bs
            loss_data = batch_loss / len(ds)           # :230
            losses.append(loss_data)
            log(f"[ref] epoch {epoch:4d} loss {loss_data:.5f}")
        return losses, mlp.state_dict()


def pack_with_reference_dataset(frames):
    """(net [N,1260], err [N,360]) through the reference's OWN packer."""
    import tempfile

    from mpe3d_tpu.config import PANOPTIC
    from mpe3d_tpu.data.synthetic import write_frames

    with _RefModules() as (ref_ds, _u, _p):
        with tempfile.TemporaryDirectory() as td:
            path = os.path.join(td, "frames.json")
            write_frames(frames, path)
            old = os.getcwd()
            os.chdir(td)            # the dataset resolves nothing relative,
            try:                    # but keep any stray writes out of REF
                ds = ref_ds.PoseEstimatorDataset(
                    [path], PANOPTIC.camera_names, list(range(18)),
                    data_augmentation=False, reload=False, save=False)
            finally:
                os.chdir(old)
    return (np.ascontiguousarray(ds.data.numpy(), dtype=np.float32),
            np.ascontiguousarray(ds.orig_data.numpy(), dtype=np.float32))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--n-train", type=int, default=256)
    ap.add_argument("--n-eval", type=int, default=200)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--converge", action="store_true",
                    help="shuffle ON both sides + packed-MPJPE eval of the "
                    "final models (the quality-parity question)")
    ap.add_argument("--out", default="reports/trainer_parity_ab.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/mpe3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import torch

    from mpe3d_tpu.config import PANOPTIC, LifterTrainConfig
    from mpe3d_tpu.convert.torch_import import load_reference_lifter
    from mpe3d_tpu.data.frames import parse_frame_gt
    from mpe3d_tpu.data.synthetic import (SceneNoise,
                                          generate_single_person_frames)
    from mpe3d_tpu.geometry.calib_io import rig_from_files
    from mpe3d_tpu.models.mlp import apply_lifter
    from mpe3d_tpu.train.lifter import train_lifter
    from mpe3d_tpu.train.lifter_data import build_lifter_dataset

    assert os.path.exists(TM), "reference fixtures unavailable"
    rig = rig_from_files(PANOPTIC, TM)
    noise = SceneNoise(pixel_sigma=1.0, joint_dropout=0.08,
                       spurious_rate=0.0, camera_dropout=0.1)
    frames_t = generate_single_person_frames(PANOPTIC, rig, args.n_train,
                                             seed=11, noise=noise)
    frames_d = generate_single_person_frames(PANOPTIC, rig, 64,
                                             seed=12, noise=noise)

    # identical data: packed ONCE by the reference's own dataset class
    t0 = time.time()
    net_t, err_t = pack_with_reference_dataset(frames_t)
    net_d, err_d = pack_with_reference_dataset(frames_d)
    # drop the tail so both loops see identical full batches (our
    # scan-epoch drops remainders; the reference DataLoader keeps them)
    nt = len(net_t) // args.batch_size * args.batch_size
    net_t, err_t = net_t[:nt], err_t[:nt]
    print(f"packed {nt} train / {len(net_d)} dev samples through the "
          f"reference dataset in {time.time()-t0:.1f}s")

    # identical init: the reference MLP's torch init, imported to jax
    torch.manual_seed(58008)                           # :131
    with _RefModules():
        from mlp import PoseEstimatorMLP
        mlp0 = PoseEstimatorMLP(input_dimensions=net_t.shape[1],
                                output_dimensions=54)
    os.makedirs("reports", exist_ok=True)
    init_path = "/tmp/trainer_parity_init.pt"
    torch.save(mlp0.state_dict(), init_path)
    init_params, lifter_cfg = load_reference_lifter(init_path)

    shuffle = bool(args.converge)

    # --- reference side -------------------------------------------------
    t0 = time.time()
    ref_losses, ref_final_state = reference_training_run(
        (net_t, err_t), args.epochs, args.batch_size, args.lr, shuffle,
        init_path)
    ref_wall = time.time() - t0
    final_path = "/tmp/trainer_parity_ref_final.pt"
    torch.save({"model_state_dict": ref_final_state}, final_path)

    # --- our side -------------------------------------------------------
    tcfg = LifterTrainConfig(epochs=args.epochs, batch_size=args.batch_size,
                             lr=args.lr, eval_every=1, patience=10**9,
                             loss="reference", shuffle=shuffle,
                             save_rel_improve=0.0, seed=58008)
    t0 = time.time()
    res = train_lifter(net_t, err_t, net_d, err_d, PANOPTIC, rig,
                       lifter_cfg, tcfg, params=init_params,
                       log=lambda s: print(f"[ours] {s}"))
    our_wall = time.time() - t0
    our_losses = [h["train_loss"] for h in res.history]

    n = min(len(ref_losses), len(our_losses))
    rel = [abs(a - b) / max(abs(a), 1e-9)
           for a, b in zip(ref_losses[:n], our_losses[:n])]
    print(f"\nper-epoch train-loss relative deviation: "
          f"max {max(rel):.4%}, final {rel[-1]:.4%}")

    report = {
        "protocol": {"n_train": nt, "epochs": args.epochs,
                     "batch_size": args.batch_size, "lr": args.lr,
                     "shuffle": shuffle, "identical_init": True,
                     "identical_data": "reference PoseEstimatorDataset",
                     "widths": list(lifter_cfg.widths)},
        "ref_train_losses": [round(x, 6) for x in ref_losses],
        "our_train_losses": [round(x, 6) for x in our_losses],
        "rel_dev_max": max(rel), "rel_dev_final": rel[-1],
        "ref_wall_s": round(ref_wall, 1), "our_wall_s": round(our_wall, 1),
    }

    if args.converge:
        # packed-MPJPE of both finals, same oracle protocol (WITH GT —
        # generate_single_person_frames emits the GT-free training format)
        from mpe3d_tpu.data.synthetic import generate_frames
        frames_e = generate_frames(
            PANOPTIC, rig, args.n_eval, n_people=(1, 1), seed=4242,
            noise=SceneNoise(pixel_sigma=1.0, joint_dropout=0.05))
        net_e, _ = build_lifter_dataset(frames_e, PANOPTIC, rig,
                                        augment=False)
        gts = np.stack([parse_frame_gt(fr, PANOPTIC).gt3d[0]
                        for fr in frames_e])
        uj = np.asarray(PANOPTIC.used_joints)

        def mpjpe(params):
            pred = np.asarray(apply_lifter(params, net_e, lifter_cfg))
            pred = pred.reshape(-1, PANOPTIC.n_joints, 3) * 10.0
            return float(np.linalg.norm(pred[:, uj] - gts[:, uj],
                                        axis=-1).mean() * 1000.0)

        ref_params, _ = load_reference_lifter(final_path)
        ours_params = (res.params["model"] if isinstance(res.params, dict)
                       and "model" in res.params else res.params)
        report["mpjpe_ref_mm"] = round(mpjpe(ref_params), 3)
        report["mpjpe_ours_mm"] = round(mpjpe(ours_params), 3)
        report["mpjpe_init_mm"] = round(mpjpe(init_params), 3)
        print(f"packed MPJPE: init {report['mpjpe_init_mm']:.1f} mm | "
              f"reference-trained {report['mpjpe_ref_mm']:.1f} mm | "
              f"ours-trained {report['mpjpe_ours_mm']:.1f} mm")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
