"""Matcher (GAT) training — batched scenes, pjit data-parallel.

Re-implements the reference trainer (reference:
skeleton_matching/train_skeleton_matching.py:31-58,158-251): Adam(1e-4,
weight_decay 1e-20), batch 15 scenes, MSE on the sigmoid scores of the
edge-nodes (USE_BCE=False), eval every 5 epochs, early-stop patience 5.

The reference batches graphs with ``dgl.batch`` + index offsetting
(:67-84); here scenes live on a static (C, S) topology so a batch is one
stacked tensor and the model is vmapped — one jit program, batch sharded on
the mesh's data axis.  Pair multiplicity (duplicated edge-nodes in the
reference's graphs) enters through the head-softmax weights and the
loss weights (train/matcher_data.py).
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mpe3d_tpu.config import MatcherConfig, MatcherTrainConfig, RigConfig
from mpe3d_tpu.geometry.camera import CameraRig
from mpe3d_tpu.matching.features import (PairTopology, edge_node_features,
                                         head_features)
from mpe3d_tpu.models.gat import TopologyArrays, apply_matcher, init_matcher
from mpe3d_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from mpe3d_tpu.train.checkpoint import save_checkpoint, wait_for_async_saves
from mpe3d_tpu.train.matcher_data import MatcherScenes


@dataclass
class MatcherTrainResult:
    params: Dict
    history: List[Dict] = field(default_factory=list)
    best_val_loss: float = float("inf")
    epochs_run: int = 0


def bce_per_element(scores: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """torch nn.BCELoss semantics on sigmoid scores: per-element binary
    cross-entropy with the log clamped at -100 (reference:
    train_skeleton_matching.py:32-38 USE_BCE).

    ``jnp.maximum`` BEFORE the log keeps gradients finite when a score
    saturates to exactly 0.0/1.0 in fp32 (sigmoid does this at |logit| ≳
    16.6): clipping log(0) = -inf instead would differentiate to
    0 · inf = NaN and poison the whole parameter tree through Adam.
    ``log(1e-37) ≈ -85.2`` so the -100 clamp is parity-only headroom.
    (The floor must be a NORMAL fp32: XLA flushes subnormals to zero, and
    a flushed floor makes maximum(0, 0) a tie whose 0.5 gradient lets the
    log's inf back through.)
    """
    tiny = 1e-37
    log_s = jnp.clip(jnp.log(jnp.maximum(scores, tiny)), -100.0)
    log_c = jnp.clip(jnp.log(jnp.maximum(1.0 - scores, tiny)), -100.0)
    return -(labels * log_s + (1.0 - labels) * log_c)


def make_matcher_step(rig: CameraRig, rig_config: RigConfig,
                      topo: PairTopology, cfg: MatcherConfig,
                      tx: optax.GradientTransformation,
                      use_bce: bool = False):
    """Jitted train/eval steps over batched scenes.

    ``rig`` must be the matching-camera sub-rig in matching order.
    ``use_bce`` selects nn.BCELoss over nn.MSELoss (reference:
    train_skeleton_matching.py:32-38).  When cfg.feat_drop/attn_drop are
    non-zero, train steps take a PRNG key and run the model in dropout
    mode; eval always runs deterministic (torch model.eval()).
    """
    img = (float(rig_config.image_width), float(rig_config.image_height))
    alt = rig_config.graph_alternative
    dropout_on = cfg.feat_drop > 0.0 or cfg.attn_drop > 0.0

    if alt == "1":
        from mpe3d_tpu.matching.alt1 import (alt1_edge_node_features,
                                             alt1_node_features,
                                             apply_matcher_alt1,
                                             build_alt1_topology)
        topo1 = build_alt1_topology(topo, rig_config.n_joints,
                                    rig_config.joint_format)
        efeats1 = alt1_edge_node_features(topo.n_pairs, cfg.in_dim)

        def scene_scores(params, kp, valid, prob, obs, present, weight,
                         key=None):
            feats_hj, live = alt1_node_features(
                kp, valid, prob, obs, present, img, rig_config.joint_format)
            feats = jnp.concatenate([feats_hj, jnp.asarray(efeats1)])
            return apply_matcher_alt1(params, feats, live,
                                      (weight > 0).astype(kp.dtype), topo1,
                                      cfg, pair_softmax_weight=weight,
                                      dropout_key=key)
    else:
        topo_dev = TopologyArrays.from_topology(topo)
        efeats = edge_node_features(topo.n_pairs, cfg.in_dim)

        def scene_scores(params, kp, valid, prob, obs, present, weight,
                         key=None):
            hfeats, _ = head_features(kp, valid, prob, obs, present, rig, img,
                                      alt=alt)
            return apply_matcher(params, hfeats, efeats, topo_dev,
                                 (weight > 0).astype(kp.dtype), cfg,
                                 pair_softmax_weight=weight,
                                 dropout_key=key)

    def loss_fn(params, batch, key=None):
        kp, valid, prob, obs, present, labels, weight = batch
        if key is not None and dropout_on:
            keys = jax.random.split(key, kp.shape[0])
            scores = jax.vmap(scene_scores,
                              in_axes=(None, 0, 0, 0, 0, 0, 0, 0))(
                params, kp, valid, prob, obs, present, weight, keys)
        else:
            scores = jax.vmap(scene_scores, in_axes=(None, 0, 0, 0, 0, 0, 0))(
                params, kp, valid, prob, obs, present, weight)
        # mean over all edge-nodes in the batch, duplicates counted twice
        # (reference: train_skeleton_matching.py:179 + dgl.batch collate)
        if use_bce:
            per = bce_per_element(scores, labels)
        else:
            per = (scores - labels) ** 2
        per = per * weight
        return jnp.sum(per) / jnp.maximum(jnp.sum(weight), 1.0)

    def _step(params, opt_state, batch, key=None):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    step = jax.jit(_step)

    @functools.partial(jax.jit,
                       static_argnames=("k_batches", "batch_size",
                                        "batch_sharding"),
                       donate_argnames=("params", "opt_state"))
    def epoch_step(params, opt_state, scenes_res, key,
                   k_batches, batch_size, batch_sharding=None):
        """One dispatch per epoch: shuffle the device-resident scene tensors
        on device, then lax.scan over the batches (zero per-epoch host
        traffic).  scenes_res: 7-tuple of [N, ...] arrays."""
        perm_key, drop_key = jax.random.split(key)
        n = k_batches * batch_size
        perm = jax.random.permutation(perm_key, scenes_res[0].shape[0])[:n]
        batches = []
        for f in scenes_res:
            b = f[perm].reshape(k_batches, batch_size, *f.shape[1:])
            if batch_sharding is not None:
                b = jax.lax.with_sharding_constraint(b, batch_sharding)
            batches.append(b)
        dkeys = jax.random.split(drop_key, k_batches)

        def body(carry, xs):
            p, o = carry
            batch, dk = xs[:-1], xs[-1]
            p, o, loss = _step(p, o, batch, dk if dropout_on else None)
            return (p, o), loss
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), tuple(batches) + (dkeys,))
        return params, opt_state, losses

    @jax.jit
    def eval_step(params, batch):
        return loss_fn(params, batch)

    @functools.partial(jax.jit, static_argnames=("k_batches", "batch_size",
                                                 "batch_sharding"))
    def eval_epoch(params, dev_res, k_batches, batch_size,
                   batch_sharding=None):
        """ALL dev batches in one dispatch (lax.scan of loss_fn) — the dev
        loop's per-batch dispatches cost ~25 ms each through a remote-TPU
        relay (see pipeline.py).  dev_res must be padded to
        k_batches*batch_size rows with zero-weight repeats; returns the
        mean of per-batch losses (same normalisation as the host loop:
        each batch-mean divides by its own real weight sum)."""
        batches = []
        n = k_batches * batch_size
        for f in dev_res:
            b = f[:n].reshape(k_batches, batch_size, *f.shape[1:])
            if batch_sharding is not None:
                b = jax.lax.with_sharding_constraint(b, batch_sharding)
            batches.append(b)

        def body(carry, batch):
            return carry, loss_fn(params, batch)
        _, losses = jax.lax.scan(body, None, tuple(batches))
        return jnp.mean(losses)

    return step, eval_step, scene_scores, epoch_step, eval_epoch


def train_matcher(train_scenes: Optional[MatcherScenes],
                  dev_scenes: MatcherScenes,
                  rig_config: RigConfig, rig: CameraRig, topo: PairTopology,
                  cfg: Optional[MatcherConfig] = None,
                  tcfg: Optional[MatcherTrainConfig] = None,
                  mesh=None, checkpoint_path: Optional[str] = None,
                  params: Optional[Dict] = None,
                  opt_state=None,
                  synth_bank=None,
                  synth_scenes_per_epoch: Optional[int] = None,
                  log: Callable[[str], None] = print) -> MatcherTrainResult:
    """Full matcher training loop with dev early stopping.

    ``rig`` is the FULL rig; the matching sub-rig is derived here.
    ``params``/``opt_state``: resume from a previous leg (the reference
    saves checkpoints but can never resume, train_skeleton_matching.py:230;
    this deliberately exceeds it — SURVEY §5).  Checkpoints include the
    optimizer state so ``load_checkpoint`` round-trips both.

    ``synth_bank`` (a train/matcher_synth.py::SceneBank): synthesize the
    training composites ON DEVICE inside the epoch scan (jax RNG) instead
    of streaming host-built scenes — ``train_scenes`` may then be None
    and every epoch draws ``synth_scenes_per_epoch`` fresh scenes
    (default: the host dataset size convention, tcfg.limit).  The dev set
    stays host-built (the golden-parity synthesizer).  Requires
    tcfg.scan_epoch.
    """
    cfg = cfg or MatcherConfig(in_dim=rig_config.matcher_feature_dim)
    tcfg = tcfg or MatcherTrainConfig()
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    match_rig = rig.select(np.asarray(rig_config.matching_camera_indices()))

    if params is None:
        params = init_matcher(jax.random.PRNGKey(tcfg.seed), cfg)
    # optax.adamw is DEcoupled weight decay vs torch Adam's L2-coupled
    # (reference train_skeleton_matching.py:151); at wd=1e-20 the two are
    # numerically indistinguishable.
    tx = optax.adamw(tcfg.lr, weight_decay=tcfg.weight_decay)
    if opt_state is None:
        opt_state = tx.init(params)
    step, eval_step, _, epoch_step, eval_epoch = make_matcher_step(
        match_rig, rig_config, topo, cfg, tx, use_bce=tcfg.use_bce)
    dropout_on = cfg.feat_drop > 0.0 or cfg.attn_drop > 0.0
    params = replicate(mesh, params)
    opt_state = replicate(mesh, opt_state)
    batch_sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, "data"))
    # scene tensors uploaded ONCE, device-resident for all epochs
    bs = max(tcfg.batch_size // n_dev * n_dev, n_dev)
    epoch_step_bank, bank_res = None, None
    if synth_bank is not None:
        if not tcfg.scan_epoch:
            raise ValueError("synth_bank requires tcfg.scan_epoch")
        from mpe3d_tpu.train.matcher_synth import synth_scenes

        n_epoch_scenes = synth_scenes_per_epoch or tcfg.limit
        k_batches = max(n_epoch_scenes // bs, 1)
        bank_res = tuple(replicate(mesh, a)
                         for a in synth_bank.device_arrays())
        segs, tops = synth_bank.file_segments, synth_bank.top_sets
        shard1 = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("data"))

        @functools.partial(jax.jit,
                           static_argnames=("k_batches", "batch_size"),
                           donate_argnames=("params", "opt_state"))
        def epoch_step_bank(params, opt_state, bank_res, key,
                            k_batches, batch_size):
            """One dispatch per epoch: every batch is synthesized on
            device from the bank inside the scan body, then stepped."""
            def body(carry, k):
                p, o = carry
                ks, dk = jax.random.split(k)
                batch = synth_scenes(bank_res, ks, batch_size, topo,
                                     segs, tops)
                batch = tuple(
                    jax.lax.with_sharding_constraint(b, shard1)
                    for b in batch)
                p, o, loss = step(p, o, batch,
                                  dk if dropout_on else None)
                return (p, o), loss
            keys = jax.random.split(key, k_batches)
            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), keys)
            return params, opt_state, losses
    else:
        k_batches = len(train_scenes) // bs
    if synth_bank is None and tcfg.scan_epoch and k_batches > 0:
        scenes_res = tuple(replicate(mesh, jnp.asarray(f)) for f in (
            train_scenes.kp, train_scenes.valid, train_scenes.prob,
            train_scenes.observed, train_scenes.present,
            train_scenes.labels, train_scenes.pair_weight))
    # dev tensors likewise device-resident, padded to k_dev full batches
    # with zero-weight repeats, so the whole dev eval is ONE dispatch
    dev_res, k_dev = None, 0
    if tcfg.scan_epoch and len(dev_scenes) > 0:
        k_dev = -(-len(dev_scenes) // bs)
        idx = np.resize(np.arange(len(dev_scenes)), k_dev * bs)
        s = dev_scenes.select(idx)
        w = s.pair_weight.copy()
        w[len(dev_scenes):] = 0.0
        dev_res = tuple(replicate(mesh, jnp.asarray(f)) for f in (
            s.kp, s.valid, s.prob, s.observed, s.present, s.labels, w))
    epoch_key = jax.random.PRNGKey(tcfg.seed + 1)

    def batches(scenes: MatcherScenes, rng: np.random.Generator):
        order = rng.permutation(len(scenes))
        bs = max(tcfg.batch_size // n_dev * n_dev, n_dev)
        for i in range(0, len(order), bs):
            sel = order[i: i + bs]
            if len(sel) % n_dev:
                # pad with repeats but zero weights so loss is unaffected
                need = (-len(sel)) % n_dev
                extra = order[:need] if len(order) >= need else sel[:need]
                s = scenes.select(np.concatenate([sel, extra]))
                w = s.pair_weight.copy()
                w[len(sel):] = 0.0
                batch = (s.kp, s.valid, s.prob, s.observed, s.present,
                         s.labels, w)
            else:
                s = scenes.select(sel)
                batch = (s.kp, s.valid, s.prob, s.observed, s.present,
                         s.labels, s.pair_weight)
            yield shard_batch(mesh, tuple(jnp.asarray(b) for b in batch))

    result = MatcherTrainResult(params=params)
    rng = np.random.default_rng(tcfg.seed)
    best, patience = float("inf"), 0
    t0 = time.time()
    try:
        for epoch in range(tcfg.epochs):
            # keep losses on device until epoch end (readbacks are expensive
            # through remote-TPU relays; see pipeline.py)
            if epoch_step_bank is not None:
                epoch_key, k = jax.random.split(epoch_key)
                params, opt_state, losses_d = epoch_step_bank(
                    params, opt_state, bank_res, k, k_batches=k_batches,
                    batch_size=bs)
                train_loss = float(jnp.mean(losses_d))
            elif tcfg.scan_epoch and k_batches > 0:
                epoch_key, k = jax.random.split(epoch_key)
                params, opt_state, losses_d = epoch_step(
                    params, opt_state, scenes_res, k, k_batches=k_batches,
                    batch_size=bs, batch_sharding=batch_sharding)
                train_loss = float(jnp.mean(losses_d))
            else:
                losses = []
                for batch in batches(train_scenes, rng):
                    dk = None
                    if dropout_on:
                        epoch_key, dk = jax.random.split(epoch_key)
                    params, opt_state, loss = step(params, opt_state, batch, dk)
                    losses.append(loss)
                host = jax.device_get(losses)
                train_loss = sum(host) / max(len(host), 1)

            if epoch % tcfg.eval_every == 0:
                if dev_res is not None:
                    val_loss = float(eval_epoch(params, dev_res, k_batches=k_dev,
                                                batch_size=bs,
                                                batch_sharding=batch_sharding))
                else:
                    vlosses = [eval_step(params, batch)
                               for batch in batches(dev_scenes,
                                                    np.random.default_rng(0))]
                    vhost = jax.device_get(vlosses)
                    val_loss = sum(vhost) / max(len(vhost), 1)
                result.history.append({"epoch": epoch, "train_loss": train_loss,
                                       "val_loss": val_loss,
                                       "elapsed_s": time.time() - t0})
                log(f"epoch {epoch:5d} | loss {train_loss:.6f} | "
                    f"val {val_loss:.6f} | patience {patience}")
                if val_loss < best:
                    best = val_loss
                    patience = 0
                    result.params = jax.device_get(params)
                    result.best_val_loss = best
                    if checkpoint_path:
                        # orbax backend: async commit on a background thread
                        # (matcher trees are small, but the relay round trip
                        # isn't); npz: synchronous, as before.  opt_state
                        # passes as an ON-DEVICE snapshot (x + 0 — the live
                        # tree is donated into the next epoch_step and would
                        # dangle) so the saver thread does the D2H pull; a
                        # device_get here would block the training loop on
                        # the relay round trip the backend exists to hide
                        opt_snap = jax.tree_util.tree_map(
                            lambda x: x + 0 if hasattr(x, "dtype") else x,
                            opt_state)
                        save_checkpoint(checkpoint_path, result.params,
                                        opt_state=opt_snap,
                                        meta={"epoch": epoch,
                                              "val_loss": val_loss,
                                              "matcher_config": cfg,
                                              "train_config": tcfg,
                                              "n_slots": topo.n_slots},
                                        backend=tcfg.checkpoint_backend,
                                        wait=False)
                else:
                    patience += 1
                    if patience >= tcfg.patience:
                        result.epochs_run = epoch + 1  # the epoch DID run
                        break
            result.epochs_run = epoch + 1
        if not result.history:
            result.params = jax.device_get(params)
    finally:
        # an interrupted run (Ctrl-C / relay drop — routine on
        # multi-hour legs) must still surface async save failures
        wait_for_async_saves()
    return result
