"""Self-supervised lifter training — pjit data-parallel over the mesh.

Re-implements the reference trainer (reference:
pose_estimator/train_pose_estimator.py:120-282): Adam(1e-4), batch 2096,
grad-norm clip 10, eval every 5 epochs, early-stop patience 20, MSE of the
summed per-sample reprojection error against zero.  TPU-native: the training
step is one jit-compiled program with the batch sharded over the mesh's data
axis (XLA inserts the gradient psum over ICI); the reference's 18×5 python
projection loop is a single vectorized op (lifting/loss.py).

``optimise_matrices`` (reference :8,148-154,175-177) — refining the camera
calibration jointly with the MLP — is supported by lifting the rig into the
optimized pytree.
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mpe3d_tpu.config import LifterConfig, LifterTrainConfig, RigConfig
from mpe3d_tpu.geometry.camera import CameraRig
from mpe3d_tpu.lifting.loss import reprojection_loss
from mpe3d_tpu.models.mlp import apply_lifter, init_lifter
from mpe3d_tpu.parallel.mesh import (data_sharding, lifter_tp_shardings,
                                     make_mesh, replicate, replicated,
                                     shard_batch, shard_tree)
from mpe3d_tpu.train.checkpoint import save_checkpoint, wait_for_async_saves


@dataclass
class LifterTrainResult:
    params: Dict
    history: List[Dict] = field(default_factory=list)
    best_val_loss: float = float("inf")
    epochs_run: int = 0
    # the gradient-refined calibration when optimise_matrices was on —
    # the MLP co-adapts to it, so inference must use THIS rig, not the
    # original (the reference trains the refinement but never persists
    # it, silently discarding the co-adaptation)
    rig: Optional[CameraRig] = None


def make_train_step(rig: CameraRig, n_joints: int, cfg: LifterConfig,
                    tcfg: LifterTrainConfig, tx: optax.GradientTransformation,
                    optimise_matrices: bool = False):
    """Build the jitted train step.  If ``optimise_matrices``, the rig's
    T_wc/K/dist join the optimized variables (reference :148-154)."""

    import jax.numpy as _jnp
    _cdt_map = {"bf16": _jnp.bfloat16, "bfloat16": _jnp.bfloat16,
                "fp32": None, "float32": None, None: None}
    if tcfg.compute_dtype not in _cdt_map:
        raise ValueError(f"compute_dtype must be one of "
                         f"{sorted(k for k in _cdt_map if k)} or None, "
                         f"got {tcfg.compute_dtype!r}")
    cdt = _cdt_map[tcfg.compute_dtype]

    def loss_fn(trainable, static_rig, net, err):
        params = trainable["model"]
        r = trainable.get("rig", static_rig)
        pred = apply_lifter(params, net, cfg, compute_dtype=cdt)
        return reprojection_loss(pred, err, r, n_joints,
                                 kind=tcfg.loss,
                                 huber_delta=tcfg.huber_delta)

    def _step(trainable, opt_state, net, err):
        loss, grads = jax.value_and_grad(loss_fn)(trainable, rig, net, err)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, loss

    step = jax.jit(_step)

    def _ema(ema, trainable):
        d = tcfg.ema_decay
        return jax.tree_util.tree_map(lambda e, p: e * d + p * (1.0 - d),
                                      ema, trainable)

    ema_update = jax.jit(_ema, donate_argnames=("ema",))

    @functools.partial(jax.jit,
                       static_argnames=("k_batches", "batch_size",
                                        "batch_sharding"),
                       donate_argnames=("trainable", "opt_state", "ema"))
    def epoch_step(trainable, opt_state, net_all, err_all, key,
                   k_batches, batch_size, batch_sharding=None, ema=None):
        """One dispatch for a whole epoch: shuffle ON DEVICE, then lax.scan
        over the batches.  The dataset is uploaded once and stays resident —
        no per-epoch host→device traffic.  ``ema`` (optional, config
        ``ema_decay``) is the Polyak average, updated after every step
        inside the scan.  Returns per-batch losses [K]."""
        n = k_batches * batch_size
        if tcfg.shuffle:
            perm = jax.random.permutation(key, net_all.shape[0])[:n]
        else:
            perm = jnp.arange(n)      # parity A/B: reference DataLoader
            # order with shuffle=False is the dataset order
        nets = net_all[perm].reshape(k_batches, batch_size, -1)
        errs = err_all[perm].reshape(k_batches, batch_size, -1)
        if batch_sharding is not None:
            nets = jax.lax.with_sharding_constraint(nets, batch_sharding)
            errs = jax.lax.with_sharding_constraint(errs, batch_sharding)

        def body(carry, xs):
            tr, os_, em = carry
            tr, os_, loss = _step(tr, os_, xs[0], xs[1])
            if em is not None:       # static: ema-ness fixed at trace time
                em = _ema(em, tr)
            return (tr, os_, em), loss
        (trainable, opt_state, ema), losses = jax.lax.scan(
            body, (trainable, opt_state, ema), (nets, errs))
        return trainable, opt_state, losses, ema

    @jax.jit
    def eval_loss(trainable, net, err):
        return loss_fn(trainable, rig, net, err)

    return step, eval_loss, epoch_step, ema_update


def train_lifter(net_train: np.ndarray, err_train: np.ndarray,
                 net_dev: np.ndarray, err_dev: np.ndarray,
                 rig_config: RigConfig, rig: CameraRig,
                 cfg: Optional[LifterConfig] = None,
                 tcfg: Optional[LifterTrainConfig] = None,
                 mesh=None, checkpoint_path: Optional[str] = None,
                 params: Optional[Dict] = None,
                 opt_state=None,
                 log: Callable[[str], None] = print,
                 stop_flag: Optional[Callable[[], bool]] = None,
                 extra_meta: Optional[Dict] = None
                 ) -> LifterTrainResult:
    """Full training loop with dev-set early stopping.

    net/err arrays: packed dataset (train/lifter_data.py).  ``mesh`` defaults
    to all devices on the data axis.  ``params``/``opt_state`` resume a
    previous leg (CLI ``train-lifter --resume``); opt_state resume is
    replicated-layout only (tensor-parallel meshes re-init the optimizer).
    ``extra_meta``: caller keys merged into the checkpoint meta (e.g. the
    dataset's triangulated-prior variant, ``{"prior": "median"}``, which
    inference must match — lifting/pack.py).
    """
    init_opt_state = opt_state
    cfg = cfg or LifterConfig(
        in_dim=rig_config.lifter_input_dim,
        out_dim=rig_config.n_joints * 3)
    tcfg = tcfg or LifterTrainConfig()
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    J = rig_config.n_joints

    key = jax.random.PRNGKey(tcfg.seed)
    if params is None:
        params = init_lifter(key, cfg)
    trainable = {"model": params}
    if tcfg.optimise_matrices:
        trainable["rig"] = rig

    tx = optax.chain(optax.clip_by_global_norm(tcfg.grad_clip_norm),
                     optax.adam(tcfg.lr))
    step, eval_loss, epoch_step, ema_update = make_train_step(
        rig, J, cfg, tcfg, tx, tcfg.optimise_matrices)

    if mesh.shape.get("model", 1) > 1:
        # tensor-parallel layout for the MLP (parallel/mesh.py): rig and any
        # other leaves stay replicated; the optimizer state inherits the
        # parameter shardings through jit's output-sharding propagation.
        shardings = {k: (lifter_tp_shardings(mesh, v) if k == "model"
                         else jax.tree_util.tree_map(
                             lambda _: replicated(mesh), v))
                     for k, v in trainable.items()}
        trainable = shard_tree(trainable, shardings)
        if init_opt_state is not None:
            log("[train_lifter] opt_state resume ignored under tensor "
                "parallelism (optimizer re-initialised)")
        opt_state = jax.jit(tx.init)(trainable)
    else:
        trainable = replicate(mesh, trainable)
        opt_state = replicate(mesh, init_opt_state if init_opt_state
                              is not None else tx.init(trainable))
    batch_sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, "data"))
    # Polyak average: seeded FROM the current params (no zero-init bias
    # correction needed; a resumed leg starts its average at the loaded
    # weights).  Same structure/sharding as `trainable`.
    ema = (jax.tree_util.tree_map(lambda x: x + 0 if hasattr(x, "dtype")
                                  else x, trainable)
           if tcfg.ema_decay > 0 else None)
    # dataset uploaded ONCE, device-resident for all epochs
    bs = max(tcfg.batch_size // n_dev * n_dev, n_dev)
    k_batches = len(net_train) // bs
    if tcfg.scan_epoch and k_batches > 0:
        net_dev_res = replicate(mesh, jnp.asarray(net_train))
        err_dev_res = replicate(mesh, jnp.asarray(err_train))
    epoch_key = jax.random.PRNGKey(tcfg.seed + 1)

    # pad batch to a multiple of the device count for even sharding
    def batches(net, err, rng):
        order = (rng.permutation(len(net)) if tcfg.shuffle
                 else np.arange(len(net)))
        bs = max(tcfg.batch_size // n_dev * n_dev, n_dev)
        for i in range(0, len(order), bs):
            sel = order[i: i + bs]
            if len(sel) % n_dev:
                sel = sel[: len(sel) // n_dev * n_dev]
            if len(sel) == 0:
                continue
            yield shard_batch(mesh, (jnp.asarray(net[sel]),
                                     jnp.asarray(err[sel])))

    result = LifterTrainResult(params=None)
    rng = np.random.default_rng(tcfg.seed)
    best, patience = float("inf"), 0
    # best params live ON DEVICE between saves: pulling the full parameter
    # tree host-side at every improving eval dominated wall clock through
    # remote-TPU relays (see LifterTrainConfig.save_rel_improve)
    best_device, best_meta, last_saved = None, {}, float("inf")
    t0 = time.time()
    try:
        for epoch in range(tcfg.epochs):
            if stop_flag and stop_flag():
                break
            # losses stay on device until epoch end: device→host readbacks are
            # expensive through remote-TPU relays (see pipeline.py)
            if tcfg.scan_epoch and k_batches > 0:
                epoch_key, k = jax.random.split(epoch_key)
                trainable, opt_state, losses_d, ema = epoch_step(
                    trainable, opt_state, net_dev_res, err_dev_res, k,
                    k_batches=k_batches, batch_size=bs,
                    batch_sharding=batch_sharding, ema=ema)
                train_loss = float(jnp.mean(losses_d))
            else:
                losses, sizes = [], []
                for net_b, err_b in batches(net_train, err_train, rng):
                    trainable, opt_state, loss = step(trainable, opt_state,
                                                      net_b, err_b)
                    if ema is not None:
                        ema = ema_update(ema, trainable)
                    losses.append(loss)
                    sizes.append(net_b.shape[0])
                host = jax.device_get(losses)
                train_loss = (sum(l * b for l, b in zip(host, sizes))
                              / max(sum(sizes), 1))
            # loss-derived px-per-coordinate scale (logging only): the
            # reference loss is (Σ|e|)², per_term is mean(Δu²+Δv²), huber ≈
            # per_term/2 below the knee
            if tcfg.loss == "per_term":
                mae_per_coord = (train_loss / 2.0) ** 0.5
            elif tcfg.loss == "huber":
                mae_per_coord = train_loss ** 0.5
            else:
                mae_per_coord = ((train_loss ** 0.5)
                                 / rig_config.n_cameras / J / 2)

            if epoch % tcfg.eval_every == 0:
                # with EMA on, the averaged weights ARE the model being
                # trained: eval/early-stop/checkpoints all use them
                eval_tree = ema if ema is not None else trainable
                vlosses, vsizes = [], []
                for net_b, err_b in batches(net_dev, err_dev,
                                            np.random.default_rng(0)):
                    vlosses.append(eval_loss(eval_tree, net_b, err_b))
                    vsizes.append(net_b.shape[0])
                vhost = jax.device_get(vlosses)
                val_loss = (sum(l * b for l, b in zip(vhost, vsizes))
                            / max(sum(vsizes), 1))
                result.history.append({"epoch": epoch, "train_loss": train_loss,
                                       "val_loss": val_loss,
                                       "mae_per_coord": mae_per_coord,
                                       "elapsed_s": time.time() - t0})
                log(f"epoch {epoch:5d} | loss {train_loss:.5f} | "
                    f"val {val_loss:.5f} | mae/coord {mae_per_coord:.5f} | "
                    f"patience {patience}")
                if val_loss < best:
                    best = val_loss
                    patience = 0
                    result.best_val_loss = best
                    # on-device copy — `trainable`/`ema` are donated into
                    # the next epoch_step, so a bare reference would dangle
                    best_device = jax.tree_util.tree_map(lambda x: x + 0
                                                         if hasattr(x, "dtype")
                                                         else x, eval_tree)
                    best_meta = {"epoch": epoch, "val_loss": val_loss,
                                 "train_loss": train_loss,
                                 "lifter_config": cfg, "train_config": tcfg,
                                 **(extra_meta or {})}
                    if val_loss <= last_saved * (1.0 - tcfg.save_rel_improve):
                        last_saved = val_loss
                        if tcfg.checkpoint_backend == "orbax":
                            # async: the device tree streams to disk on a
                            # background thread — no blocking device_get in
                            # the training loop (the npz path measured 26 s
                            # per save through a remote-TPU relay)
                            if checkpoint_path:
                                save_checkpoint(checkpoint_path,
                                                best_device["model"],
                                                meta=best_meta,
                                                backend="orbax", wait=False)
                        else:
                            result.params = \
                                jax.device_get(best_device)["model"]
                            if checkpoint_path:
                                save_checkpoint(checkpoint_path,
                                                result.params, meta=best_meta)
                else:
                    patience += 1
                    if patience >= tcfg.patience:
                        result.epochs_run = epoch + 1
                        break
            result.epochs_run = epoch + 1
    finally:
        # persist the tracked best even on interruption (relay
        # drops and Ctrl-C are routine on multi-hour remote legs)
        if best_device is not None:
            # one host pull covers both the result and the final save
            # (the orbax path defers it to here; the npz path may need a
            # refresh when the tracked best is newer than the last save)
            if best < last_saved or result.params is None:
                result.params = jax.device_get(best_device)["model"]
            if "rig" in best_device:      # optimise_matrices: surface the
                result.rig = jax.device_get(best_device["rig"])  # refined rig
            if best < last_saved and checkpoint_path:
                save_checkpoint(checkpoint_path, result.params,
                                meta=best_meta,
                                backend=tcfg.checkpoint_backend)
        elif result.params is None:      # never evaluated
            try:
                result.params = jax.device_get(trainable)["model"]
            except Exception:
                # trainable may be a donated/deleted buffer if the step
                # itself raised — don't mask the original exception
                pass
        wait_for_async_saves()           # in-loop orbax saves must commit
    return result
