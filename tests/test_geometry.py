"""Geometry-core unit tests: distortion/undistortion/projection/triangulation
round-trips, validated against closed-form cases and OpenCV where available
(the reference delegates these to cv2; see SURVEY.md §2b)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mpe3d_tpu.config import PANOPTIC
from mpe3d_tpu.geometry import (
    cam_centers_world,
    full_distort,
    pixel_rays_world,
    project_points,
    radial_distort,
    triangulate_irls,
    triangulate_mean,
    triangulate_median_filtered,
    triangulate_pair,
    undistort_points,
    undistorted_rays_world,
)
from mpe3d_tpu.geometry.calib_io import load_transform_manager, rig_from_files

try:
    import cv2

    HAS_CV2 = True
except ImportError:  # pragma: no cover
    HAS_CV2 = False

REF_TM = "/root/reference/tm_panoptic.pickle"


def test_radial_distort_zero_coeffs_is_identity():
    xy = jnp.array([[0.1, -0.2], [0.0, 0.0], [0.5, 0.5]])
    dist = jnp.zeros(5)
    np.testing.assert_allclose(radial_distort(xy, dist), xy, atol=1e-7)
    np.testing.assert_allclose(full_distort(xy, dist), xy, atol=1e-7)


def test_undistort_inverts_full_distortion(panoptic_rig):
    """distort(undistort(x)) == x for realistic Panoptic coefficients."""
    rng = np.random.default_rng(0)
    K = panoptic_rig.K[0]
    dist = panoptic_rig.dist[0]
    # points well inside the image
    pix = jnp.asarray(rng.uniform([400, 300], [1500, 800], size=(64, 2)),
                      jnp.float32)
    xn = undistort_points(pix, K, dist)
    # re-apply the full distortion model and K
    xd = full_distort(xn, dist)
    u = xd[:, 0] * K[0, 0] + K[0, 2]
    v = xd[:, 1] * K[1, 1] + K[1, 2]
    np.testing.assert_allclose(np.stack([u, v], -1), pix, atol=0.05)


@pytest.mark.skipif(not HAS_CV2, reason="cv2 not available")
def test_undistort_matches_opencv(panoptic_rig):
    rng = np.random.default_rng(1)
    for ci in range(3):
        K = np.asarray(panoptic_rig.K[ci], np.float64)
        dist = np.asarray(panoptic_rig.dist[ci], np.float64)
        pix = rng.uniform([300, 200], [1600, 900], size=(32, 2))
        ours = np.asarray(
            undistort_points(jnp.asarray(pix, jnp.float32),
                             jnp.asarray(K, jnp.float32),
                             jnp.asarray(dist, jnp.float32)))
        ref = cv2.undistortPoints(pix.reshape(-1, 1, 2), K, dist).reshape(-1, 2)
        np.testing.assert_allclose(ours, ref, atol=2e-4)


@pytest.mark.skipif(not HAS_CV2, reason="cv2 not available")
def test_triangulate_pair_matches_opencv(panoptic_rig):
    rng = np.random.default_rng(2)
    T_wc = np.asarray(panoptic_rig.T_wc, np.float64)
    P1, P2 = T_wc[0, :3, :], T_wc[1, :3, :]
    # random world points in front of both cameras
    pts_w = rng.uniform([-1, -1, 0.2], [1, 1, 1.5], size=(16, 3))
    # ideal normalized projections
    def proj(P, X):
        x = (P[:, :3] @ X.T).T + P[:, 3]
        return x[:, :2] / x[:, 2:3]

    xn1, xn2 = proj(P1, pts_w), proj(P2, pts_w)
    ours = np.asarray(triangulate_pair(
        jnp.asarray(xn1, jnp.float32), jnp.asarray(xn2, jnp.float32),
        jnp.asarray(P1, jnp.float32), jnp.asarray(P2, jnp.float32)))
    ref_h = cv2.triangulatePoints(P1, P2, xn1.T, xn2.T)
    ref = (ref_h[:3] / ref_h[3]).T
    np.testing.assert_allclose(ours, ref, atol=1e-3)
    np.testing.assert_allclose(ours, pts_w, atol=1e-3)


def test_project_then_triangulate_roundtrip(panoptic_rig):
    """World points -> pixels (with distortion) -> triangulate -> same points."""
    rig = panoptic_rig
    rng = np.random.default_rng(3)
    J = 18
    pts_w = jnp.asarray(rng.uniform([-0.8, -0.8, 0.1], [0.8, 0.8, 1.6],
                                    size=(J, 3)), jnp.float32)
    # project into every camera: [C, J, 2]
    pix = project_points(pts_w[None, :, :], rig.T_wc[:, None], rig.K[:, None],
                         rig.dist[:, None], tangential=True)
    valid = jnp.ones((rig.n_cameras, J))
    xyz, ok = triangulate_mean(pix, valid, rig)
    assert bool(jnp.all(ok))
    np.testing.assert_allclose(np.asarray(xyz), np.asarray(pts_w), atol=5e-3)

    xyz2, ok2 = triangulate_median_filtered(pix, valid, rig)
    assert bool(jnp.all(ok2))
    np.testing.assert_allclose(np.asarray(xyz2), np.asarray(pts_w), atol=5e-3)


def test_triangulate_median_rejects_outlier_pair(panoptic_rig):
    """Corrupt one camera's observation: the median filter should reject the
    contaminated pairs while the plain mean is dragged off."""
    rig = panoptic_rig
    rng = np.random.default_rng(4)
    pts_w = jnp.asarray(rng.uniform([-0.5, -0.5, 0.3], [0.5, 0.5, 1.2],
                                    size=(1, 3)), jnp.float32)
    pix = project_points(pts_w[None, :, :], rig.T_wc[:, None], rig.K[:, None],
                         rig.dist[:, None], tangential=True)
    pix = pix.at[0, 0].add(jnp.asarray([250.0, -180.0]))  # corrupt camera 0
    valid = jnp.ones((rig.n_cameras, 1))
    xyz_med, _ = triangulate_median_filtered(pix, valid, rig)
    xyz_mean, _ = triangulate_mean(pix, valid, rig)
    err_med = float(jnp.linalg.norm(xyz_med[0] - pts_w[0]))
    err_mean = float(jnp.linalg.norm(xyz_mean[0] - pts_w[0]))
    assert err_med < 0.02
    assert err_med < err_mean


def test_masked_joints_marked_invalid(panoptic_rig):
    rig = panoptic_rig
    pix = jnp.zeros((rig.n_cameras, 4, 2))
    valid = jnp.zeros((rig.n_cameras, 4)).at[0, 0].set(1.0)  # 1 view only
    _, ok = triangulate_mean(pix, valid, rig)
    assert not bool(jnp.any(ok))


def test_triangulate_irls_clean_roundtrip(panoptic_rig):
    """On clean projections the Huber weights never kick in and IRLS must
    reproduce the world points like the other triangulators."""
    rig = panoptic_rig
    rng = np.random.default_rng(5)
    J = 18
    pts_w = jnp.asarray(rng.uniform([-0.8, -0.8, 0.1], [0.8, 0.8, 1.6],
                                    size=(J, 3)), jnp.float32)
    pix = project_points(pts_w[None, :, :], rig.T_wc[:, None], rig.K[:, None],
                         rig.dist[:, None], tangential=True)
    valid = jnp.ones((rig.n_cameras, J))
    xyz, ok = triangulate_irls(pix, valid, rig)
    assert bool(jnp.all(ok))
    np.testing.assert_allclose(np.asarray(xyz), np.asarray(pts_w), atol=5e-3)


def test_triangulate_irls_downweights_outlier_camera(panoptic_rig):
    """One confident outlier camera under realistic pixel noise: IRLS must
    land near the true point (the outlier's Huber weight collapses) and
    beat both reference-style pair aggregations, which each feed the bad
    camera into C-1 pairs.  (Noise matters: on NOISELESS input the median
    filter is exact — all clean pairs agree to float precision — which is
    not the regime any of this runs in; the σ=1.5 px here matches the
    quality-table protocol.)"""
    rig = panoptic_rig
    rng = np.random.default_rng(6)
    pts_w = jnp.asarray(rng.uniform([-0.5, -0.5, 0.3], [0.5, 0.5, 1.2],
                                    size=(6, 3)), jnp.float32)
    pix = project_points(pts_w[None, :, :], rig.T_wc[:, None], rig.K[:, None],
                         rig.dist[:, None], tangential=True)
    pix = pix + jnp.asarray(rng.normal(0.0, 1.5, size=pix.shape), jnp.float32)
    pix = pix.at[2, :].add(jnp.asarray([230.0, -160.0]))  # corrupt camera 2
    valid = jnp.ones((rig.n_cameras, 6))
    xyz_irls, ok = triangulate_irls(pix, valid, rig)
    xyz_med, _ = triangulate_median_filtered(pix, valid, rig)
    xyz_mean, _ = triangulate_mean(pix, valid, rig)
    assert bool(jnp.all(ok))
    e_irls = float(jnp.linalg.norm(xyz_irls - pts_w, axis=-1).mean())
    e_med = float(jnp.linalg.norm(xyz_med - pts_w, axis=-1).mean())
    e_mean = float(jnp.linalg.norm(xyz_mean - pts_w, axis=-1).mean())
    assert e_irls < 0.01
    assert e_irls < e_med and e_irls < e_mean


def test_triangulate_irls_two_view_ok_semantics(panoptic_rig):
    """ok requires >= 2 valid cameras; a 2-view joint still triangulates
    (IRLS downweights but cannot drop below the normal-equation floor)."""
    rig = panoptic_rig
    rng = np.random.default_rng(7)
    pts_w = jnp.asarray(rng.uniform([-0.5, -0.5, 0.3], [0.5, 0.5, 1.2],
                                    size=(3, 3)), jnp.float32)
    pix = project_points(pts_w[None, :, :], rig.T_wc[:, None], rig.K[:, None],
                         rig.dist[:, None], tangential=True)
    valid = jnp.zeros((rig.n_cameras, 3))
    valid = valid.at[0, :].set(1.0).at[3, :].set(1.0)   # 2 views
    xyz, ok = triangulate_irls(pix, valid, rig)
    assert bool(jnp.all(ok))
    np.testing.assert_allclose(np.asarray(xyz), np.asarray(pts_w), atol=1e-2)

    valid1 = jnp.zeros((rig.n_cameras, 3)).at[0, :].set(1.0)  # 1 view
    xyz1, ok1 = triangulate_irls(pix, valid1, rig)
    assert not bool(jnp.any(ok1))
    assert bool(jnp.all(xyz1 == 0.0))


def test_pixel_ray_points_at_world_point(panoptic_rig):
    """The back-projected undistorted ray from the observed pixel must be
    parallel to (point - camera_center)."""
    rig = panoptic_rig
    pts_w = jnp.asarray([[0.3, -0.2, 1.0]], jnp.float32)
    pix = project_points(pts_w[None], rig.T_wc[:, None], rig.K[:, None],
                         rig.dist[:, None], tangential=True)  # [C, 1, 2]
    rays = undistorted_rays_world(pix, rig.K[:, None], rig.dist[:, None],
                                  rig.T_cw[:, None])           # [C, 1, 3]
    centers = cam_centers_world(rig.T_cw)                      # [C, 3]
    to_point = pts_w[0][None] - centers                        # [C, 3]
    cosang = np.sum(np.asarray(rays[:, 0]) * np.asarray(to_point), -1) / (
        np.linalg.norm(rays[:, 0], axis=-1) * np.linalg.norm(to_point, axis=-1))
    np.testing.assert_allclose(cosang, 1.0, atol=1e-4)


def test_raw_pixel_ray_matches_reference_formula(panoptic_rig):
    """Matcher alt-3 ray = R_cw · K⁻¹ · [u, v, 1]
    (reference: skeleton_matching/graph_generator.py:481-490)."""
    rig = panoptic_rig
    pix = jnp.asarray([[640.0, 360.0]])
    ray = pixel_rays_world(pix, rig.K_inv[0], rig.T_cw[0])
    K_inv = np.asarray(rig.K_inv[0])
    R = np.asarray(rig.T_cw[0, :3, :3])
    expected = R @ (K_inv @ np.array([640.0, 360.0, 1.0]))
    np.testing.assert_allclose(np.asarray(ray[0]), expected, rtol=1e-5)


@pytest.mark.skipif(not __import__("os").path.exists(REF_TM),
                    reason="reference pickle fixture not mounted")
def test_transform_manager_pickle_loader():
    ts = load_transform_manager(REF_TM)
    T = ts.get_transform("root", "trackera")
    assert T.shape == (4, 4)
    np.testing.assert_allclose(T[3], [0, 0, 0, 1], atol=1e-9)
    Ti = ts.get_transform("trackera", "root")
    np.testing.assert_allclose(T @ Ti, np.eye(4), atol=1e-9)
    # camera-to-camera goes through root
    Tab = ts.get_transform("trackera", "trackerb")
    expected = ts.get_transform("root", "trackerb") @ Ti
    np.testing.assert_allclose(Tab, expected, atol=1e-9)

    # JSON round-trip
    ts2 = type(ts).from_json(ts.to_json())
    np.testing.assert_allclose(ts2.get_transform("root", "trackera"), T)


@pytest.mark.skipif(not __import__("os").path.exists(REF_TM),
                    reason="reference pickle fixture not mounted")
def test_rig_from_reference_fixture():
    rig = rig_from_files(PANOPTIC, REF_TM)
    assert rig.n_cameras == 5
    assert rig.K.shape == (5, 3, 3)
    # T_cw inverse consistency
    prod = np.einsum("cij,cjk->cik", np.asarray(rig.T_wc), np.asarray(rig.T_cw))
    np.testing.assert_allclose(prod, np.tile(np.eye(4), (5, 1, 1)), atol=1e-5)


def test_triangulate_irls_behind_camera_two_view_not_degenerate():
    """The behind-camera weight cut must not reduce a joint below 2
    weighted views: a 2-view joint whose LS solution lands on one
    camera's plane previously collapsed onto the Tikhonov floor and
    returned an off-ray artifact while ok stayed True.  With the
    survivor guard the full 2-view LS solution is kept (bounded,
    on-geometry).  Construction: opposite-facing cameras 4 m apart,
    camera A sees its image centre (ray = the z-axis), camera B an
    offset observation — the two rays' closest point is B's own centre
    (0,0,4), which has zero depth in B, tripping the cut."""
    from mpe3d_tpu.geometry.camera import make_rig

    K = np.tile(np.array([[500., 0, 320], [0, 500., 240], [0, 0, 1]],
                         np.float32), (2, 1, 1))
    dist = np.zeros((2, 5), np.float32)
    TA = np.eye(4, dtype=np.float32)
    Ry = np.array([[-1, 0, 0], [0, 1, 0], [0, 0, -1]], np.float32)
    TB = np.eye(4, dtype=np.float32)
    TB[:3, :3] = Ry
    TB[:3, 3] = -Ry @ np.array([0, 0, 4], np.float32)
    rig2 = make_rig(K, dist, np.stack([TA, TB]), (640, 480))
    pix = np.zeros((2, 1, 2), np.float32)
    pix[0, 0] = [320, 240]
    pix[1, 0] = [820, 240]
    xyz, ok = triangulate_irls(jnp.asarray(pix), jnp.ones((2, 1)), rig2)
    assert bool(jnp.all(ok))
    # the 2-view LS solution is the closest point between the rays,
    # (0, 0, 4); the pre-fix Tikhonov artifact was (-1.91, 0, 1.91)
    np.testing.assert_allclose(np.asarray(xyz)[0], [0.0, 0.0, 4.0],
                               atol=1e-3)
