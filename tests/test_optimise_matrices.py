"""Calibration-refinement training path (reference optimise_matrices flag,
pose_estimator/train_pose_estimator.py:8,148-154,175-177)."""

import jax
import jax.numpy as jnp
import numpy as np

from mpe3d_tpu.config import PANOPTIC, LifterConfig, LifterTrainConfig
from mpe3d_tpu.geometry.camera import CameraRig
from mpe3d_tpu.lifting.loss import reprojection_loss
from mpe3d_tpu.models.mlp import apply_lifter, init_lifter


def test_rig_receives_gradients(panoptic_rig):
    cfg = LifterConfig(widths=(32,))
    params = init_lifter(jax.random.PRNGKey(0), cfg)
    rig_j = jax.tree_util.tree_map(jnp.asarray, panoptic_rig)

    def loss_fn(trainable, net, err):
        pred = apply_lifter(trainable["model"], net, cfg)
        return reprojection_loss(pred, err, trainable["rig"], 18)

    rng = np.random.default_rng(0)
    net = jnp.asarray(rng.normal(size=(4, cfg.in_dim)).astype(np.float32))
    err = jnp.zeros((4, 360)).at[:, 0::4].set(1.0) \
        .at[:, 1::4].set(500.0).at[:, 2::4].set(300.0)
    grads = jax.grad(loss_fn)({"model": params, "rig": rig_j}, net, err)
    g_rig: CameraRig = grads["rig"]
    # the projection chain touches T_wc, K and dist — all must get signal
    assert float(jnp.abs(g_rig.T_wc).max()) > 0
    assert float(jnp.abs(g_rig.K).max()) > 0
    assert float(jnp.abs(g_rig.dist).max()) > 0
    # K_inv / T_cw are unused by the loss → zero gradient
    assert float(jnp.abs(g_rig.K_inv).max()) == 0


def test_train_lifter_optimise_matrices_smoke(panoptic_rig):
    from mpe3d_tpu.train.lifter import train_lifter

    rng = np.random.default_rng(1)
    net = rng.normal(size=(64, PANOPTIC.lifter_input_dim)).astype(np.float32)
    err = np.zeros((64, 360), np.float32)
    err[:, 0::4] = 1.0
    err[:, 1::4] = rng.uniform(100, 900, (64, 90))
    err[:, 2::4] = rng.uniform(100, 500, (64, 90))
    cfg = LifterConfig(widths=(32,))
    tcfg = LifterTrainConfig(epochs=8, batch_size=32, eval_every=2,
                             patience=10, optimise_matrices=True, lr=1e-3)
    res = train_lifter(net, err, net[:16], err[:16], PANOPTIC, panoptic_rig,
                       cfg, tcfg, log=lambda s: None)
    assert len(res.history) >= 2
    losses = [h["train_loss"] for h in res.history]
    assert all(np.isfinite(l) for l in losses), losses
    assert min(losses) < losses[0]

def test_refined_rig_surfaced_and_roundtrips(panoptic_rig, tmp_path):
    """optimise_matrices must SURFACE the refined calibration (the MLP
    co-adapts to it; the reference trains the refinement but discards it)
    and the npz persistence must roundtrip exactly."""
    from mpe3d_tpu.geometry.camera import load_rig_npz, save_rig_npz
    from mpe3d_tpu.train.lifter import train_lifter

    rng = np.random.default_rng(2)
    net = rng.normal(size=(64, PANOPTIC.lifter_input_dim)).astype(np.float32)
    err = np.zeros((64, 360), np.float32)
    err[:, 0::4] = 1.0
    err[:, 1::4] = rng.uniform(100, 900, (64, 90))
    err[:, 2::4] = rng.uniform(100, 500, (64, 90))
    cfg = LifterConfig(widths=(32,))
    tcfg = LifterTrainConfig(epochs=4, batch_size=32, eval_every=2,
                             patience=10, optimise_matrices=True, lr=1e-3)
    res = train_lifter(net, err, net[:16], err[:16], PANOPTIC, panoptic_rig,
                       cfg, tcfg, log=lambda s: None)
    assert res.rig is not None
    # training moved the calibration away from the input rig
    assert not np.allclose(np.asarray(res.rig.T_wc),
                           np.asarray(panoptic_rig.T_wc))
    p = str(tmp_path / "refined_rig.npz")
    save_rig_npz(p, res.rig)
    loaded = load_rig_npz(p)
    for f in type(res.rig)._fields:
        np.testing.assert_array_equal(np.asarray(getattr(res.rig, f)),
                                      np.asarray(getattr(loaded, f)))

    # a lifter trained WITHOUT the flag must not surface a rig
    tcfg2 = LifterTrainConfig(epochs=2, batch_size=32, eval_every=2,
                              patience=10, lr=1e-3)
    res2 = train_lifter(net, err, net[:16], err[:16], PANOPTIC, panoptic_rig,
                        cfg, tcfg2, log=lambda s: None)
    assert res2.rig is None
