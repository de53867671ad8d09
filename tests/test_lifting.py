"""Tests for lifter input packing and the reprojection loss."""

import jax.numpy as jnp
import numpy as np

from mpe3d_tpu.config import PANOPTIC
from mpe3d_tpu.data.synthetic import _project_np, sample_person, scene_center
from mpe3d_tpu.geometry.camera import cam_centers_world
from mpe3d_tpu.lifting.loss import reprojection_error, reprojection_loss
from mpe3d_tpu.lifting.pack import (apply_camera_dropout, pack_error_input,
                                    pack_lifter_input)


def _clean_person_obs(panoptic_rig, rng):
    """A noiseless person observed by all cameras: kp/valid/prob/observed.

    Projects with *radial-only* distortion so pixels match the loss's
    projection model exactly (the loss reproduces the reference's
    radial-only apply_distortion, utils/pose_estimator_utils.py:44-50)."""
    person = sample_person(rng, PANOPTIC, scene_center(panoptic_rig))
    C, J = panoptic_rig.n_cameras, 18
    kp = np.zeros((C, J, 2), np.float32)
    for c in range(C):
        dist = np.asarray(panoptic_rig.dist[c]).copy()
        dist[2:4] = 0.0   # zero the tangential terms
        pix, _ = _project_np(person, np.asarray(panoptic_rig.T_wc[c]),
                             np.asarray(panoptic_rig.K[c]), dist)
        kp[c] = pix
    valid = np.ones((C, J), np.float32)
    prob = np.full((C, J), 0.9, np.float32)
    observed = np.ones((C, J), bool)
    return person, kp, valid, prob, observed


def test_pack_layout_and_prior(panoptic_rig, rng):
    person, kp, valid, prob, observed = _clean_person_obs(panoptic_rig, rng)
    C, J = kp.shape[:2]
    W, H = PANOPTIC.image_width, PANOPTIC.image_height

    net, include = pack_lifter_input(
        jnp.asarray(kp), jnp.asarray(valid), jnp.asarray(prob),
        jnp.asarray(observed), panoptic_rig, (W, H))
    assert net.shape == (C * J * 14,)
    x = np.asarray(net).reshape(C, J, 14)

    # fields 0-3
    assert np.allclose(x[..., 0], valid)
    assert np.allclose(x[..., 1], (kp[..., 0] - W / 2) / (W / 2), atol=1e-5)
    assert np.allclose(x[..., 2], (kp[..., 1] - H / 2) / (H / 2), atol=1e-5)
    assert np.allclose(x[..., 3], prob)

    # fields 4-6: camera origin / 10, same for every joint of a camera
    centers = np.asarray(cam_centers_world(panoptic_rig.T_cw))
    assert np.allclose(x[:, :, 4:7], centers[:, None, :] / 10.0, atol=1e-5)

    # fields 10-13: triangulated prior — joint 0 skipped (reference quirk
    # pos[0] > 0), all others close to the true 3D, identical across cameras
    assert np.all(x[:, 0, 10] == 0.0)
    assert np.all(x[:, 1:, 10] == 1.0)
    tri = x[0, 1:, 11:14] * 10.0
    assert np.allclose(tri, person[1:], atol=0.02)
    assert np.allclose(x[0, :, 10:], x[1, :, 10:])


def test_pack_median_prior_variant(panoptic_rig, rng):
    """prior='median' swaps only fields 10-13 for the median-filtered
    triangulation (the classical backend's semantics); everything else is
    bit-identical to the default reference-exact 'mean' packing."""
    import pytest

    from mpe3d_tpu.geometry.triangulate import triangulate_median_filtered

    person, kp, valid, prob, observed = _clean_person_obs(panoptic_rig, rng)
    C, J = kp.shape[:2]
    W, H = PANOPTIC.image_width, PANOPTIC.image_height
    args = (jnp.asarray(kp), jnp.asarray(valid), jnp.asarray(prob),
            jnp.asarray(observed), panoptic_rig, (W, H))
    net_mean, _ = pack_lifter_input(*args)
    net_med, _ = pack_lifter_input(*args, prior="median")
    xm = np.asarray(net_mean).reshape(C, J, 14)
    xd = np.asarray(net_med).reshape(C, J, 14)
    assert np.array_equal(xm[..., :10], xd[..., :10])

    tri_obs = observed.astype(np.float32) * (np.arange(J) > 0)[None, :]
    xyz, ok = triangulate_median_filtered(jnp.asarray(kp),
                                          jnp.asarray(tri_obs), panoptic_rig)
    xyz, ok = np.asarray(xyz), np.asarray(ok)
    assert np.allclose(xd[0, :, 10], ok.astype(np.float32))
    assert np.allclose(xd[0, :, 11:14],
                       xyz * ok[:, None].astype(np.float32) / 10.0, atol=1e-6)
    assert np.allclose(xd[0, :, 10:], xd[1, :, 10:])

    with pytest.raises(ValueError):
        pack_lifter_input(*args, prior="nope")


def test_pack_irls_prior_variant(panoptic_rig, rng):
    """prior='irls' swaps only fields 10-13 for the Huber-IRLS all-view
    triangulation (geometry/triangulate.py::triangulate_irls); observation
    fields stay bit-identical and the prior matches the direct call."""
    from mpe3d_tpu.geometry.triangulate import triangulate_irls

    person, kp, valid, prob, observed = _clean_person_obs(panoptic_rig, rng)
    C, J = kp.shape[:2]
    W, H = PANOPTIC.image_width, PANOPTIC.image_height
    args = (jnp.asarray(kp), jnp.asarray(valid), jnp.asarray(prob),
            jnp.asarray(observed), panoptic_rig, (W, H))
    net_mean, _ = pack_lifter_input(*args)
    net_irls, _ = pack_lifter_input(*args, prior="irls")
    xm = np.asarray(net_mean).reshape(C, J, 14)
    xi = np.asarray(net_irls).reshape(C, J, 14)
    assert np.array_equal(xm[..., :10], xi[..., :10])

    tri_obs = observed.astype(np.float32) * (np.arange(J) > 0)[None, :]
    xyz, ok = triangulate_irls(jnp.asarray(kp), jnp.asarray(tri_obs),
                               panoptic_rig)
    xyz, ok = np.asarray(xyz), np.asarray(ok)
    assert np.allclose(xi[0, :, 10], ok.astype(np.float32))
    assert np.allclose(xi[0, :, 11:14],
                       xyz * ok[:, None].astype(np.float32) / 10.0, atol=1e-6)
    # clean all-camera observations: the IRLS prior lands on the true person
    assert np.allclose(xi[0, 1:, 11:14] * 10.0, person[1:], atol=0.02)


def test_pack_require_valid_filters_joints(panoptic_rig, rng):
    person, kp, valid, prob, observed = _clean_person_obs(panoptic_rig, rng)
    valid[:, 5] = 0.0   # invalid joint still observed
    net, include = pack_lifter_input(
        jnp.asarray(kp), jnp.asarray(valid), jnp.asarray(prob),
        jnp.asarray(observed), panoptic_rig,
        (PANOPTIC.image_width, PANOPTIC.image_height), require_valid=True)
    x = np.asarray(net).reshape(kp.shape[0], 18, 14)
    assert np.all(x[:, 5, :10] == 0.0)         # obs fields zeroed
    assert np.all(x[:, 5, 10] == 1.0)          # prior still present
    assert not np.asarray(include)[:, 5].any()


def test_camera_dropout_zeroes_obs_keeps_prior(panoptic_rig, rng):
    _, kp, valid, prob, observed = _clean_person_obs(panoptic_rig, rng)
    net, _ = pack_lifter_input(
        jnp.asarray(kp), jnp.asarray(valid), jnp.asarray(prob),
        jnp.asarray(observed), panoptic_rig,
        (PANOPTIC.image_width, PANOPTIC.image_height))
    keep = jnp.asarray([1.0, 0.0, 1.0, 1.0, 0.0])
    out = np.asarray(apply_camera_dropout(net, keep, 18)).reshape(5, 18, 14)
    orig = np.asarray(net).reshape(5, 18, 14)
    assert np.all(out[1, :, :10] == 0.0)
    assert np.all(out[4, :, :10] == 0.0)
    assert np.allclose(out[1, :, 10:], orig[1, :, 10:])
    assert np.allclose(out[0], orig[0])


def test_prior_dropout_zeroes_prior_keeps_obs(panoptic_rig, rng):
    """apply_prior_dropout zeroes fields 10-13 of dropped joints across ALL
    cameras and leaves observation fields untouched (the complement of
    camera dropout)."""
    from mpe3d_tpu.lifting.pack import apply_prior_dropout

    _, kp, valid, prob, observed = _clean_person_obs(panoptic_rig, rng)
    net, _ = pack_lifter_input(
        jnp.asarray(kp), jnp.asarray(valid), jnp.asarray(prob),
        jnp.asarray(observed), panoptic_rig,
        (PANOPTIC.image_width, PANOPTIC.image_height))
    jkeep = np.ones(18, np.float32)
    jkeep[[2, 7, 11]] = 0.0
    out = np.asarray(apply_prior_dropout(net, jnp.asarray(jkeep),
                                         18)).reshape(5, 18, 14)
    orig = np.asarray(net).reshape(5, 18, 14)
    dropped = [2, 7, 11]
    keptj = [j for j in range(18) if j not in dropped]
    assert np.all(out[:, dropped, 10:] == 0.0)
    assert np.allclose(out[:, dropped, :10], orig[:, dropped, :10])
    assert np.allclose(out[:, keptj], orig[:, keptj])


def test_pack_prior_gate_noop_on_clean_input(panoptic_rig, rng):
    """A clean person's priors reproject within noise — the gate must be a
    bit-exact no-op there (the in-distribution safety property measured in
    scripts/diag_prior_gate.py: 3.7 mm with and without the gate)."""
    _, kp, valid, prob, observed = _clean_person_obs(panoptic_rig, rng)
    img = (PANOPTIC.image_width, PANOPTIC.image_height)
    plain, _ = pack_lifter_input(
        jnp.asarray(kp), jnp.asarray(valid), jnp.asarray(prob),
        jnp.asarray(observed), panoptic_rig, img)
    gated, _ = pack_lifter_input(
        jnp.asarray(kp), jnp.asarray(valid), jnp.asarray(prob),
        jnp.asarray(observed), panoptic_rig, img, prior_gate_px=8.0)
    assert np.array_equal(np.asarray(plain), np.asarray(gated))


def test_pack_prior_gate_drops_poisoned_prior(panoptic_rig, rng):
    """A large mislocalisation in ONE camera poisons the mean-pair
    triangulation of that joint; the gate must zero that joint's prior
    fields (10-13) in EVERY camera block and leave everything else — the
    other joints and all observation fields — untouched."""
    _, kp, valid, prob, observed = _clean_person_obs(panoptic_rig, rng)
    bad_j = 6
    kp = kp.copy()
    kp[2, bad_j] += 220.0                     # confident outlier detection
    img = (PANOPTIC.image_width, PANOPTIC.image_height)
    plain, _ = pack_lifter_input(
        jnp.asarray(kp), jnp.asarray(valid), jnp.asarray(prob),
        jnp.asarray(observed), panoptic_rig, img)
    gated, _ = pack_lifter_input(
        jnp.asarray(kp), jnp.asarray(valid), jnp.asarray(prob),
        jnp.asarray(observed), panoptic_rig, img, prior_gate_px=8.0)
    xp = np.asarray(plain).reshape(5, 18, 14)
    xg = np.asarray(gated).reshape(5, 18, 14)
    assert np.all(xp[:, bad_j, 10] == 1.0)    # ungated: prior kept
    assert np.all(xg[:, bad_j, 10:] == 0.0)   # gated: flag + coords zeroed
    keptj = [j for j in range(18) if j != bad_j]
    assert np.array_equal(xg[:, keptj], xp[:, keptj])
    assert np.array_equal(xg[..., :10], xp[..., :10])   # obs fields intact


def test_pack_prior_gate_median_survives_one_outlier(panoptic_rig, rng):
    """Chain11 regression (the mean→median gate statistic): with a ROBUST
    median-filtered prior, one confident outlier detection must NOT fire
    the gate — the prior is still good, only one camera's residual is
    inflated.  The old masked-mean statistic fired here (measured pipeline
    A/B: mean-gated 16.55 mm vs ungated 13.55 mm at outlier_rate 0.07);
    the masked-median statistic must keep the prior."""
    _, kp, valid, prob, observed = _clean_person_obs(panoptic_rig, rng)
    bad_j = 6
    kp = kp.copy()
    kp[2, bad_j] += 220.0                     # confident outlier detection
    img = (PANOPTIC.image_width, PANOPTIC.image_height)
    plain, _ = pack_lifter_input(
        jnp.asarray(kp), jnp.asarray(valid), jnp.asarray(prob),
        jnp.asarray(observed), panoptic_rig, img, prior="median")
    gated, _ = pack_lifter_input(
        jnp.asarray(kp), jnp.asarray(valid), jnp.asarray(prob),
        jnp.asarray(observed), panoptic_rig, img, prior="median",
        prior_gate_px=8.0)
    # the median prior rejected the outlier, so the gate sees 4 tiny
    # residuals + 1 huge one — median tiny — and must be a bit-exact no-op
    assert np.array_equal(np.asarray(plain), np.asarray(gated))
    xg = np.asarray(gated).reshape(5, 18, 14)
    assert np.all(xg[:, bad_j, 10] == 1.0)    # prior kept everywhere


def test_build_dataset_prior_dropout(panoptic_rig):
    """prior_dropout > 0 produces augmented copies with some joints'
    prior fields zeroed while every sample's first copy stays intact."""
    from mpe3d_tpu.data.synthetic import generate_single_person_frames
    from mpe3d_tpu.train.lifter_data import build_lifter_dataset

    frames = generate_single_person_frames(PANOPTIC, panoptic_rig, 12,
                                           seed=3)
    net0, _ = build_lifter_dataset(frames, PANOPTIC, panoptic_rig,
                                   seed=11, prior_dropout=0.0)
    net1, _ = build_lifter_dataset(frames, PANOPTIC, panoptic_rig,
                                   seed=11, prior_dropout=0.5)
    assert net0.shape == net1.shape
    b0 = net0.reshape(len(net0), 5, 18, 14)
    b1 = net1.reshape(len(net1), 5, 18, 14)
    # observation fields never change
    assert np.allclose(b0[..., :10], b1[..., :10])
    # some prior fields got zeroed where they were nonzero before
    changed = (b0[..., 10:] != b1[..., 10:]).any(axis=(1, 2, 3))
    assert changed.any()
    assert np.all(b1[..., 10:][b0[..., 10:] != b1[..., 10:]] == 0.0)


def test_reprojection_error_zero_at_gt(panoptic_rig, rng):
    person, kp, valid, prob, observed = _clean_person_obs(panoptic_rig, rng)
    err_in = pack_error_input(jnp.asarray(kp), jnp.asarray(valid),
                              jnp.asarray(prob), jnp.asarray(observed))
    pred = jnp.asarray(person.reshape(1, -1) / 10.0)   # decameters
    err = reprojection_error(pred, err_in[None], panoptic_rig, 18)
    # pixels were generated with the loss's own projection model → only
    # fp32 rounding remains (~0.04 px per (cam, joint) term at 1920x1080)
    assert float(err[0]) < 10.0

    wrong = pred + 0.05   # 0.5 m off
    err2 = reprojection_error(wrong, err_in[None], panoptic_rig, 18)
    assert float(err2[0]) > 10.0 * float(err[0])

    loss = reprojection_loss(pred, err_in[None], panoptic_rig, 18)
    assert np.isclose(float(loss), float(err[0]) ** 2, rtol=1e-4)


def test_reprojection_loss_variants(panoptic_rig, rng):
    """per_term = masked mean of Δu²+Δv²; huber matches per_term/2 for
    small residuals and grows linearly for large ones; both are ~zero at
    the ground truth and positive away from it."""
    import pytest

    person, kp, valid, prob, observed = _clean_person_obs(panoptic_rig, rng)
    err_in = pack_error_input(jnp.asarray(kp), jnp.asarray(valid),
                              jnp.asarray(prob), jnp.asarray(observed))[None]
    pred = jnp.asarray(person.reshape(1, -1) / 10.0)
    wrong = pred + 0.05                                # 0.5 m off

    for kind in ("per_term", "huber"):
        at_gt = float(reprojection_loss(pred, err_in, panoptic_rig, 18,
                                        kind=kind))
        off = float(reprojection_loss(wrong, err_in, panoptic_rig, 18,
                                      kind=kind))
        assert at_gt < 0.01, (kind, at_gt)             # px² fp32 rounding
        assert off > 100.0 * max(at_gt, 1e-6), kind

    # closed-form check on a hand-made residual field: shift predictions so
    # every term has the same |Δ|, then per_term == 2·d², and huber (below
    # the knee) == d² (0.5·d² per coordinate, two coordinates)
    from mpe3d_tpu.lifting.loss import _reprojection_residuals
    d, vmask = _reprojection_residuals(wrong, err_in, panoptic_rig, 18)
    d, vmask = np.asarray(d), np.asarray(vmask)
    expect = float((np.sum(d * d, axis=-1) * vmask).sum() / vmask.sum())
    got = float(reprojection_loss(wrong, err_in, panoptic_rig, 18,
                                  kind="per_term"))
    assert np.isclose(got, expect, rtol=1e-5)

    # huge-delta huber == per_term / 2 exactly
    h = float(reprojection_loss(wrong, err_in, panoptic_rig, 18,
                                kind="huber", huber_delta=1e9))
    assert np.isclose(h, got / 2.0, rtol=1e-5)

    with pytest.raises(ValueError):
        reprojection_loss(pred, err_in, panoptic_rig, 18, kind="nope")


def test_reprojection_error_masks_invalid(panoptic_rig, rng):
    person, kp, valid, prob, observed = _clean_person_obs(panoptic_rig, rng)
    kp_broken = kp.copy()
    kp_broken[2, :, :] += 500.0   # corrupt one camera completely
    valid_masked = valid.copy()
    valid_masked[2, :] = 0.0
    err_ok = reprojection_error(
        jnp.asarray(person.reshape(1, -1) / 10.0),
        pack_error_input(jnp.asarray(kp_broken), jnp.asarray(valid_masked),
                         jnp.asarray(prob), jnp.asarray(observed))[None],
        panoptic_rig, 18)
    err_bad = reprojection_error(
        jnp.asarray(person.reshape(1, -1) / 10.0),
        pack_error_input(jnp.asarray(kp_broken), jnp.asarray(valid),
                         jnp.asarray(prob), jnp.asarray(observed))[None],
        panoptic_rig, 18)
    assert float(err_ok[0]) < 10.0
    assert float(err_bad[0]) > 1000.0
