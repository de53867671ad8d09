"""On-device matcher scene synthesis (train/matcher_synth.py) vs the host
synthesizer (train/matcher_data.py::build_matcher_scenes) — distribution
parity on the marginals the documented deviations preserve, plus shape
and semantic invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpe3d_tpu.config import PANOPTIC
from mpe3d_tpu.data.synthetic import (SceneNoise, generate_frames,
                                      synthetic_ring_rig)
from mpe3d_tpu.matching.features import build_topology
from mpe3d_tpu.train.matcher_data import build_matcher_scenes
from mpe3d_tpu.train.matcher_synth import build_scene_bank, synth_scenes


@pytest.fixture(scope="module")
def recordings():
    rig_config = PANOPTIC
    rig = synthetic_ring_rig(rig_config)
    noise = SceneNoise(pixel_sigma=1.0, joint_dropout=0.05,
                       spurious_rate=0.08, camera_dropout=0.05)
    inputs = [generate_frames(rig_config, rig, 40, n_people=(1, 1),
                              seed=10 + i, noise=noise, with_gt=False)
              for i in range(3)]
    return rig_config, inputs


def _device_batch(rig_config, inputs, topo, n, seed=0, augment=True):
    bank = build_scene_bank(inputs, rig_config,
                            min_views=rig_config.min_number_of_views)
    if not augment:
        # full-set-only pool: keep one entry per frame (the first per
        # frame is always the full set)
        af = np.asarray(bank.aug_frame)
        keep = np.r_[True, af[1:] != af[:-1]]
        idx = np.nonzero(keep)[0]
        new_segs = []
        for (a0, a1) in bank.file_segments:
            sel = (idx >= a0) & (idx < a1)
            lo = int(np.searchsorted(idx, a0))
            new_segs.append((lo, lo + int(sel.sum())))
        bank.aug_frame = jnp.asarray(af[idx])
        bank.aug_mask = jnp.asarray(np.asarray(bank.aug_mask)[idx])
        bank.file_segments = tuple(new_segs)
    out = jax.jit(
        lambda key: synth_scenes(bank.device_arrays(), key, n, topo,
                                 bank.file_segments, bank.top_sets)
    )(jax.random.PRNGKey(seed))
    return bank, tuple(np.asarray(f) for f in out)


def test_synth_shapes_and_invariants(recordings):
    rig_config, inputs = recordings
    topo = build_topology(len(rig_config.used_cameras_skeleton_matching), 6)
    n = 64
    _, (kp, valid, prob, obs, present, labels, weight) = _device_batch(
        rig_config, inputs, topo, n)
    C, S, J = topo.n_cameras, topo.n_slots, rig_config.n_joints
    assert kp.shape == (n, C, S, J, 2)
    assert labels.shape == (n, topo.n_pairs)
    # labels only on live pairs; weights in {0, 1, 2}
    assert np.all((labels == 0) | (weight > 0))
    assert set(np.unique(weight)) <= {0.0, 1.0, 2.0}
    # observed implies present slot
    slot_obs = obs.any(axis=3)
    assert np.all(~slot_obs | present)
    # at least some live scenes and some positive labels
    live = weight.sum(axis=1) > 0
    assert live.mean() > 0.5
    assert labels.sum() > 0


def test_synth_matches_host_marginals(recordings):
    """Label density, multiplicity mix, present-count and composite-size
    histograms match the host synthesizer on the same recordings (loose
    tolerances — both are ~1k-sample estimates)."""
    rig_config, inputs = recordings
    topo = build_topology(len(rig_config.used_cameras_skeleton_matching), 6)

    host = build_matcher_scenes(inputs, rig_config, topo, limit=400,
                                seed=3, augment=True)
    assert len(host) > 100
    n = 1024
    _, (kp, valid, prob, obs, present, labels, weight) = _device_batch(
        rig_config, inputs, topo, n, seed=7)
    live = weight.sum(axis=1) > 0
    kp, present = kp[live], present[live]
    labels, weight = labels[live], weight[live]

    # per-scene positive-label fraction among live pairs
    def pos_frac(lab, w):
        return (lab.sum(axis=1) / np.maximum((w > 0).sum(axis=1), 1))
    hp = pos_frac(host.labels, host.pair_weight)
    dp = pos_frac(labels, weight)
    assert abs(hp.mean() - dp.mean()) < 0.25 * max(hp.mean(), 1e-6), (
        hp.mean(), dp.mean())

    # multiplicity mix among live pairs (weight==1 vs ==2)
    def dup_frac(w):
        return (w == 2.0).sum() / np.maximum((w > 0).sum(), 1)
    assert abs(dup_frac(host.pair_weight) - dup_frac(weight)) < 0.15

    # mean populated slots per scene
    hs = host.present.sum(axis=(1, 2)).mean()
    ds = present.sum(axis=(1, 2)).mean()
    assert abs(hs - ds) < 0.25 * hs, (hs, ds)


def test_synth_null_scene_semantics(recordings):
    """Overflowing composites are emitted as null scenes (weight 0), so a
    too-small S yields nulls rather than crashes or mislabels."""
    rig_config, inputs = recordings
    topo = build_topology(len(rig_config.used_cameras_skeleton_matching), 1)
    n = 64
    _, out = _device_batch(rig_config, inputs, topo, n, seed=1)
    weight = out[6]
    # with one slot per camera, multi-person composites must overflow;
    # some scenes are null, the live ones carry consistent labels
    assert (weight.sum(axis=1) == 0).any()
    labels = out[5]
    assert np.all((labels == 0) | (weight > 0))


def test_synth_trains(recordings):
    """A few scan epochs on device-synthesized scenes reduce the loss on a
    host-built dev set (the end-to-end wiring train_matcher uses)."""
    import optax

    from mpe3d_tpu.config import MatcherConfig
    from mpe3d_tpu.models.gat import init_matcher
    from mpe3d_tpu.train.matcher import make_matcher_step

    rig_config, inputs = recordings
    rig = synthetic_ring_rig(rig_config)
    match_rig = rig.select(np.asarray(rig_config.matching_camera_indices()))
    topo = build_topology(len(rig_config.used_cameras_skeleton_matching), 4)
    cfg = MatcherConfig(in_dim=rig_config.matcher_feature_dim,
                        hidden=(8, 8), heads=(2, 2))
    tx = optax.adam(1e-3)
    params = init_matcher(jax.random.PRNGKey(0), cfg)
    opt_state = tx.init(params)
    step, eval_step, _, _, _ = make_matcher_step(match_rig, rig_config,
                                                 topo, cfg, tx)
    bank = build_scene_bank(inputs, rig_config,
                            min_views=rig_config.min_number_of_views)
    dev = build_matcher_scenes(inputs, rig_config, topo, limit=60, seed=9,
                               augment=False)
    dev_batch = tuple(jnp.asarray(f) for f in (
        dev.kp, dev.valid, dev.prob, dev.observed, dev.present,
        dev.labels, dev.pair_weight))

    @jax.jit
    def synth_epoch(params, opt_state, key):
        def body(carry, k):
            p, o = carry
            batch = synth_scenes(bank.device_arrays(), k, 16, topo,
                                 bank.file_segments, bank.top_sets)
            p, o, loss = step(p, o, batch)
            return (p, o), loss
        keys = jax.random.split(key, 4)
        (p, o), losses = jax.lax.scan(body, (params, opt_state), keys)
        return p, o, losses

    l0 = float(eval_step(params, dev_batch))
    key = jax.random.PRNGKey(42)
    for _ in range(6):
        key, k = jax.random.split(key)
        params, opt_state, _ = synth_epoch(params, opt_state, k)
    l1 = float(eval_step(params, dev_batch))
    assert np.isfinite(l1)
    assert l1 < l0, (l0, l1)


def test_train_matcher_with_bank(recordings, tmp_path):
    """train_matcher(synth_bank=...) runs scan epochs with on-device
    synthesis, reports finite losses, and checkpoints."""
    from mpe3d_tpu.config import MatcherConfig, MatcherTrainConfig
    from mpe3d_tpu.train.matcher import train_matcher

    rig_config, inputs = recordings
    rig = synthetic_ring_rig(rig_config)
    topo = build_topology(len(rig_config.used_cameras_skeleton_matching), 4)
    cfg = MatcherConfig(in_dim=rig_config.matcher_feature_dim,
                        hidden=(8, 8), heads=(2, 2))
    tcfg = MatcherTrainConfig(epochs=3, batch_size=8, eval_every=1,
                              limit=32)
    bank = build_scene_bank(inputs, rig_config)
    dev = build_matcher_scenes(inputs, rig_config, topo, limit=40, seed=5,
                               augment=False)
    res = train_matcher(None, dev, rig_config, rig, topo, cfg, tcfg,
                        checkpoint_path=str(tmp_path / "m"),
                        synth_bank=bank)
    assert res.epochs_run == 3
    assert all(np.isfinite(h["train_loss"]) for h in res.history)
    assert np.isfinite(res.best_val_loss)
