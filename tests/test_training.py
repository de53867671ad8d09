"""Training smoke tests: both trainers learn on synthetic data, sharded over
the 8 virtual CPU devices (data-parallel pjit; SURVEY.md §2c plan)."""

import jax
import numpy as np
import pytest

from mpe3d_tpu.config import (PANOPTIC, LifterConfig, LifterTrainConfig,
                              MatcherConfig, MatcherTrainConfig)
from mpe3d_tpu.data.synthetic import SceneNoise, generate_single_person_frames
from mpe3d_tpu.matching.features import build_topology
from mpe3d_tpu.parallel.mesh import make_mesh
from mpe3d_tpu.train.lifter import train_lifter
from mpe3d_tpu.train.lifter_data import build_lifter_dataset
from mpe3d_tpu.train.matcher import train_matcher
from mpe3d_tpu.train.matcher_data import build_matcher_scenes


@pytest.fixture(scope="module")
def single_person_files(panoptic_rig):
    noise = SceneNoise(pixel_sigma=1.0, joint_dropout=0.03,
                       spurious_rate=0.1, camera_dropout=0.05)
    return [generate_single_person_frames(PANOPTIC, panoptic_rig, 30,
                                          seed=s, noise=noise)
            for s in (0, 1, 2)]


def test_mesh_uses_all_devices():
    mesh = make_mesh()
    assert mesh.devices.size == len(jax.devices()) >= 8


def test_matcher_scenes_shapes(single_person_files):
    topo = build_topology(5, 4)
    scenes = build_matcher_scenes(single_person_files, PANOPTIC, topo,
                                  limit=40, seed=0)
    assert len(scenes) > 10
    assert scenes.kp.shape[1:] == (5, 4, 18, 2)
    assert scenes.labels.shape[1] == topo.n_pairs
    # every scene has at least one positive pair or is single-camera
    pos = (scenes.labels * (scenes.pair_weight > 0)).sum(axis=1)
    assert (pos > 0).mean() > 0.5
    # labels only where weight > 0
    assert np.all(scenes.labels[scenes.pair_weight == 0] == 0)
    # multiplicity: real-real pairs weighted 2
    assert set(np.unique(scenes.pair_weight)) <= {0.0, 1.0, 2.0}


def test_matcher_training_learns(single_person_files, panoptic_rig):
    topo = build_topology(5, 4)
    train = build_matcher_scenes(single_person_files[:2], PANOPTIC, topo,
                                 limit=60, seed=0)
    dev = build_matcher_scenes(single_person_files[2:], PANOPTIC, topo,
                               limit=20, seed=1)
    cfg = MatcherConfig(in_dim=PANOPTIC.matcher_feature_dim,
                        hidden=(8, 8), heads=(2, 2))
    tcfg = MatcherTrainConfig(epochs=8, batch_size=16, eval_every=2,
                              patience=10, lr=3e-4)
    res = train_matcher(train, dev, PANOPTIC, panoptic_rig, topo,
                        cfg, tcfg, log=lambda s: None)
    assert len(res.history) >= 2
    first, last = res.history[0], res.history[-1]
    assert last["train_loss"] < first["train_loss"]
    assert res.best_val_loss < 0.3      # below trivial all-0.5 MSE (0.25)


def test_lifter_dataset_and_training(single_person_files, panoptic_rig):
    net, err = build_lifter_dataset(
        single_person_files[0] + single_person_files[1], PANOPTIC,
        panoptic_rig, augment=True, max_combinations=3, seed=0)
    assert net.shape[1] == PANOPTIC.lifter_input_dim == 1260
    assert err.shape[1] == PANOPTIC.loss_input_dim == 360
    assert len(net) == len(err) > 60    # augmentation expands frames

    net_dev, err_dev = build_lifter_dataset(
        single_person_files[2], PANOPTIC, panoptic_rig, augment=False)

    cfg = LifterConfig(widths=(256, 128))
    tcfg = LifterTrainConfig(epochs=10, batch_size=64, eval_every=3,
                             patience=10, lr=1e-3)
    res = train_lifter(net, err, net_dev, err_dev, PANOPTIC, panoptic_rig,
                       cfg, tcfg, log=lambda s: None)
    assert len(res.history) >= 2
    assert res.history[-1]["train_loss"] < res.history[0]["train_loss"]


def test_lifter_ema_training(single_person_files, panoptic_rig, tmp_path):
    """Polyak/EMA averaging (extension; LifterTrainConfig.ema_decay).
    decay→0 degenerates to the raw final iterate (plumbing check: eval/
    snapshot/save all run through the EMA tree); a real decay yields
    averaged params that differ from the raw run but train identically
    (EMA never feeds back into the optimizer)."""
    net, err = build_lifter_dataset(
        single_person_files[0] + single_person_files[1], PANOPTIC,
        panoptic_rig, augment=False)
    net_dev, err_dev = build_lifter_dataset(
        single_person_files[2], PANOPTIC, panoptic_rig, augment=False)
    cfg = LifterConfig(widths=(64,))

    def run(decay, **kw):
        tcfg = LifterTrainConfig(epochs=6, batch_size=64, eval_every=2,
                                 patience=10, lr=1e-3, ema_decay=decay, **kw)
        return train_lifter(net, err, net_dev, err_dev, PANOPTIC,
                            panoptic_rig, cfg, tcfg, log=lambda s: None)

    res_off = run(0.0)
    res_eps = run(1e-12)       # EMA ≈ the raw final iterate
    for a, b in zip(jax.tree_util.tree_leaves(res_off.params),
                    jax.tree_util.tree_leaves(res_eps.params)):
        assert np.allclose(a, b, atol=1e-5)

    res_ema = run(0.99)        # few steps: average lags the raw iterate
    assert np.isfinite(res_ema.best_val_loss)
    diffs = [float(np.abs(a - b).max())
             for a, b in zip(jax.tree_util.tree_leaves(res_off.params),
                             jax.tree_util.tree_leaves(res_ema.params))]
    assert max(diffs) > 1e-6   # EMA params are genuinely averaged

    # the non-scan path applies the same averaging
    res_ns = run(0.99, scan_epoch=False)
    assert np.isfinite(res_ns.best_val_loss)

    # checkpointed params ARE the EMA copy
    from mpe3d_tpu.models.mlp import init_lifter
    from mpe3d_tpu.train.checkpoint import load_checkpoint

    tcfg = LifterTrainConfig(epochs=4, batch_size=64, eval_every=1,
                             patience=10, lr=1e-3, ema_decay=0.99,
                             save_rel_improve=0.0)
    path = str(tmp_path / "pose_estimator")
    res_ck = train_lifter(net, err, net_dev, err_dev, PANOPTIC,
                          panoptic_rig, cfg, tcfg, checkpoint_path=path,
                          log=lambda s: None)
    loaded, _, meta = load_checkpoint(
        path, init_lifter(jax.random.PRNGKey(1), cfg))
    for a, b in zip(jax.tree_util.tree_leaves(res_ck.params),
                    jax.tree_util.tree_leaves(loaded)):
        assert np.allclose(a, b)
    assert meta["train_config"]["ema_decay"] == 0.99


def test_checkpoint_roundtrip(tmp_path):
    from mpe3d_tpu.models.mlp import init_lifter
    from mpe3d_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    cfg = LifterConfig(widths=(32,))
    params = init_lifter(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, params, meta={"lifter_config": cfg, "epoch": 3})
    template = init_lifter(jax.random.PRNGKey(1), cfg)
    loaded, _, meta = load_checkpoint(path, template)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(loaded)):
        assert np.allclose(a, b)
    assert meta["epoch"] == 3
    assert meta["lifter_config"]["widths"] == [32]


def test_lifter_training_tensor_parallel(single_person_files, panoptic_rig):
    """dp×tp mesh (4 data × 2 model): Megatron-style sharded MLP training
    matches the replicated run's math (same seeds → same losses)."""
    from mpe3d_tpu.parallel.mesh import lifter_tp_shardings, make_mesh

    net, err = build_lifter_dataset(
        single_person_files[0], PANOPTIC, panoptic_rig, augment=False)
    net_dev, err_dev = build_lifter_dataset(
        single_person_files[2], PANOPTIC, panoptic_rig, augment=False)

    cfg = LifterConfig(widths=(256, 128))
    tcfg = LifterTrainConfig(epochs=4, batch_size=32, eval_every=2,
                             patience=10, lr=1e-3)
    mesh_tp = make_mesh(n_data=4, n_model=2)
    res_tp = train_lifter(net, err, net_dev, err_dev, PANOPTIC, panoptic_rig,
                          cfg, tcfg, mesh=mesh_tp, log=lambda s: None)
    res_dp = train_lifter(net, err, net_dev, err_dev, PANOPTIC, panoptic_rig,
                          cfg, tcfg, log=lambda s: None)
    assert res_tp.history[-1]["train_loss"] < res_tp.history[0]["train_loss"]
    # same math, different layout: losses agree to float tolerance
    for htp, hdp in zip(res_tp.history, res_dp.history):
        assert abs(htp["val_loss"] - hdp["val_loss"]) \
            <= 1e-3 * max(abs(hdp["val_loss"]), 1.0)

    # EMA composes with the tp layout (averaged tree inherits the
    # shardings through the scan; eval/checkpoint read the EMA copy)
    tcfg_ema = LifterTrainConfig(epochs=4, batch_size=32, eval_every=2,
                                 patience=10, lr=1e-3, ema_decay=0.9)
    res_ema = train_lifter(net, err, net_dev, err_dev, PANOPTIC,
                           panoptic_rig, cfg, tcfg_ema, mesh=mesh_tp,
                           log=lambda s: None)
    assert np.isfinite(res_ema.best_val_loss)
    assert res_ema.params is not None

    # layout sanity: alternating column/row-parallel, output head replicated
    sh = lifter_tp_shardings(mesh_tp, res_tp.params and
                             {"layers": [{"w": np.zeros((1260, 256)),
                                          "b": np.zeros(256)},
                                         {"w": np.zeros((256, 128)),
                                          "b": np.zeros(128)},
                                         {"w": np.zeros((128, 54)),
                                          "b": np.zeros(54)}]})
    specs = [tuple(l["w"].spec) for l in sh["layers"]]
    assert specs[0] == (None, "model")
    assert specs[1] == ("model",) or specs[1] == ("model", None)
    assert specs[2] == ()


def test_matcher_bce_loss_matches_numpy(single_person_files, panoptic_rig):
    """use_bce=True selects real BCELoss semantics (reference
    train_skeleton_matching.py:32-38) — checked against a numpy formula
    on the model's own scores (VERDICT round-1 'dead flag' fix)."""
    import jax.numpy as jnp
    import optax

    from mpe3d_tpu.models.gat import init_matcher
    from mpe3d_tpu.train.matcher import make_matcher_step

    topo = build_topology(5, 4)
    scenes = build_matcher_scenes(single_person_files[:1], PANOPTIC, topo,
                                  limit=8, seed=0)
    cfg = MatcherConfig(in_dim=PANOPTIC.matcher_feature_dim,
                        hidden=(8, 8), heads=(2, 2))
    match_rig = panoptic_rig.select(
        np.asarray(PANOPTIC.matching_camera_indices()))
    tx = optax.adam(1e-4)
    _, eval_mse, scene_scores, _, _ = make_matcher_step(
        match_rig, PANOPTIC, topo, cfg, tx, use_bce=False)
    _, eval_bce, _, _, _ = make_matcher_step(
        match_rig, PANOPTIC, topo, cfg, tx, use_bce=True)
    params = init_matcher(jax.random.PRNGKey(0), cfg)
    batch = tuple(jnp.asarray(a) for a in (
        scenes.kp, scenes.valid, scenes.prob, scenes.observed,
        scenes.present, scenes.labels, scenes.pair_weight))
    mse = float(eval_mse(params, batch))
    bce = float(eval_bce(params, batch))
    scores = np.stack([
        np.asarray(scene_scores(params, *[jnp.asarray(a[i]) for a in (
            scenes.kp, scenes.valid, scenes.prob, scenes.observed,
            scenes.present, scenes.pair_weight)]))
        for i in range(len(scenes))])
    w, y = scenes.pair_weight, scenes.labels
    p = np.clip(scores, 1e-12, 1 - 1e-7)
    exp_bce = float((-(y * np.log(p) + (1 - y) * np.log1p(-p)) * w).sum()
                    / w.sum())
    exp_mse = float((((scores - y) ** 2) * w).sum() / w.sum())
    assert abs(mse - exp_mse) < 1e-5
    assert abs(bce - exp_bce) < 1e-4
    assert abs(bce - mse) > 1e-3        # the flag changes the function


def test_matcher_training_with_dropout_and_bce(single_person_files,
                                               panoptic_rig):
    """End-to-end: dropout + BCE training runs under the scan-epoch path
    and still learns."""
    topo = build_topology(5, 4)
    train = build_matcher_scenes(single_person_files[:2], PANOPTIC, topo,
                                 limit=60, seed=0)
    dev = build_matcher_scenes(single_person_files[2:], PANOPTIC, topo,
                               limit=20, seed=1)
    cfg = MatcherConfig(in_dim=PANOPTIC.matcher_feature_dim,
                        hidden=(8, 8), heads=(2, 2),
                        feat_drop=0.1, attn_drop=0.1)
    tcfg = MatcherTrainConfig(epochs=8, batch_size=16, eval_every=2,
                              patience=10, lr=3e-4, use_bce=True)
    res = train_matcher(train, dev, PANOPTIC, panoptic_rig, topo,
                        cfg, tcfg, log=lambda s: None)
    assert len(res.history) >= 2
    assert res.history[-1]["train_loss"] < res.history[0]["train_loss"]


def test_matcher_checkpoint_resume_roundtrip(single_person_files,
                                             panoptic_rig, tmp_path):
    """Checkpoints carry optimizer state; a resumed leg picks both up
    (CLI --resume path; the reference can only save)."""
    import optax

    from mpe3d_tpu.models.gat import init_matcher
    from mpe3d_tpu.train.checkpoint import load_checkpoint

    topo = build_topology(5, 4)
    train = build_matcher_scenes(single_person_files[:2], PANOPTIC, topo,
                                 limit=40, seed=0)
    dev = build_matcher_scenes(single_person_files[2:], PANOPTIC, topo,
                               limit=15, seed=1)
    cfg = MatcherConfig(in_dim=PANOPTIC.matcher_feature_dim,
                        hidden=(8, 8), heads=(2, 2))
    tcfg = MatcherTrainConfig(epochs=4, batch_size=16, eval_every=2,
                              patience=10, lr=3e-4)
    ck = str(tmp_path / "skeleton_matching")
    res1 = train_matcher(train, dev, PANOPTIC, panoptic_rig, topo, cfg, tcfg,
                         checkpoint_path=ck, log=lambda s: None)
    tmpl_p = init_matcher(jax.random.PRNGKey(0), cfg)
    tmpl_o = optax.adamw(tcfg.lr, weight_decay=tcfg.weight_decay).init(tmpl_p)
    params, opt_state, meta = load_checkpoint(ck, tmpl_p, tmpl_o)
    assert opt_state is not None          # optimizer state round-trips
    # meta JSON stringifies numpy scalars (json default=str)
    assert abs(float(meta["val_loss"]) - float(res1.best_val_loss)) < 1e-6
    res2 = train_matcher(train, dev, PANOPTIC, panoptic_rig, topo, cfg, tcfg,
                         params=params, opt_state=opt_state,
                         log=lambda s: None)
    assert res2.history[0]["train_loss"] <= res1.history[0]["train_loss"]


def test_matcher_eval_epoch_matches_per_batch(single_person_files,
                                              panoptic_rig):
    """The scanned one-dispatch dev eval (eval_epoch) reproduces the
    per-batch eval loop's mean-of-batch-means exactly, including the
    zero-weight padding of the last partial batch."""
    import jax
    import jax.numpy as jnp
    import optax

    from mpe3d_tpu.models.gat import init_matcher
    from mpe3d_tpu.train.matcher import make_matcher_step

    topo = build_topology(5, 4)
    scenes = build_matcher_scenes(single_person_files[:2], PANOPTIC, topo,
                                  limit=11, seed=3)   # 11 = 2 batches + 3
    cfg = MatcherConfig(in_dim=PANOPTIC.matcher_feature_dim,
                        hidden=(8, 8), heads=(2, 2))
    match_rig = panoptic_rig.select(
        np.asarray(PANOPTIC.matching_camera_indices()))
    _, eval_step, _, _, eval_epoch = make_matcher_step(
        match_rig, PANOPTIC, topo, cfg, optax.adam(1e-4))
    params = init_matcher(jax.random.PRNGKey(0), cfg)

    bs, n = 4, len(scenes)
    k = -(-n // bs)
    idx = np.resize(np.arange(n), k * bs)
    s = scenes.select(idx)
    w = s.pair_weight.copy()
    w[n:] = 0.0
    fields = (s.kp, s.valid, s.prob, s.observed, s.present, s.labels, w)

    # per-batch loop over the SAME sequential grouping
    per_batch = []
    for i in range(k):
        sl = slice(i * bs, (i + 1) * bs)
        per_batch.append(float(eval_step(
            params, tuple(jnp.asarray(f[sl]) for f in fields))))
    expect = sum(per_batch) / k

    got = float(eval_epoch(params, tuple(jnp.asarray(f) for f in fields),
                           k_batches=k, batch_size=bs))
    assert abs(got - expect) < 1e-6, (got, expect)


def test_bce_finite_gradients_at_saturation():
    """BCE stays NaN-free when scores saturate to exactly 0/1 in fp32
    (advisor-class bug: clip-of-inf → 0·inf = NaN grads)."""
    import jax
    import jax.numpy as jnp

    from mpe3d_tpu.train.matcher import bce_per_element

    scores = jnp.asarray([0.0, 1.0, 0.5, 1e-20, 1.0 - 1e-7])
    labels = jnp.asarray([0.0, 1.0, 1.0, 1.0, 0.0])

    def loss(s):
        return jnp.sum(bce_per_element(s, labels))

    val, grad = jax.value_and_grad(loss)(scores)
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(grad))), grad
    # value parity with torch's clamp on the interior points
    import torch
    tv = torch.nn.BCELoss(reduction="none")(
        torch.tensor([0.5, 1.0 - 1e-7]), torch.tensor([1.0, 0.0]))
    ours = np.asarray(bce_per_element(jnp.asarray([0.5, 1.0 - 1e-7]),
                                      jnp.asarray([1.0, 0.0])))
    assert np.allclose(ours, tv.numpy(), rtol=1e-4, atol=1e-6)
