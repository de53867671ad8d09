"""Orbax checkpoint backend: async background saves, sharded-aware restore,
format auto-detection (train/checkpoint.py).  The reference only has
synchronous torch.save (train_skeleton_matching.py:229-246,
train_pose_estimator.py:269-277); this backend is the TPU-idiomatic
extension — saves overlap training and sharded ``jax.Array`` trees are
written per-shard without a host gather."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mpe3d_tpu.config import (PANOPTIC, LifterConfig, LifterTrainConfig,
                              MatcherConfig)
from mpe3d_tpu.models.mlp import init_lifter
from mpe3d_tpu.train.checkpoint import (checkpoint_exists, load_checkpoint,
                                        save_checkpoint,
                                        wait_for_async_saves)


def _tree_allclose(a, b):
    for x, y in zip(jax.tree_util.tree_leaves(a),
                    jax.tree_util.tree_leaves(b)):
        assert np.allclose(np.asarray(x), np.asarray(y))


def test_orbax_roundtrip_params_opt_meta(tmp_path):
    cfg = LifterConfig(widths=(32,))
    params = init_lifter(jax.random.PRNGKey(0), cfg)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    path = str(tmp_path / "ck")
    save_checkpoint(path, params, opt_state=opt_state,
                    meta={"lifter_config": cfg, "epoch": 7},
                    backend="orbax")
    assert checkpoint_exists(path)
    loaded, opt_loaded, meta = load_checkpoint(
        path, init_lifter(jax.random.PRNGKey(1), cfg), tx.init(params))
    _tree_allclose(params, loaded)
    _tree_allclose(opt_state, opt_loaded)
    assert meta["epoch"] == 7
    assert meta["lifter_config"]["widths"] == [32]


def test_orbax_async_save_commits_after_wait(tmp_path):
    cfg = LifterConfig(widths=(16,))
    params = init_lifter(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "ck")
    save_checkpoint(path, params, backend="orbax", wait=False)
    wait_for_async_saves()
    loaded, opt_loaded, _ = load_checkpoint(
        path, init_lifter(jax.random.PRNGKey(1), cfg))
    _tree_allclose(params, loaded)
    assert opt_loaded is None


def test_orbax_save_without_opt_state_loads_with_template(tmp_path):
    # an orbax checkpoint written params-only must load cleanly even when
    # the caller supplies an opt_state template (resume ergonomics)
    cfg = LifterConfig(widths=(16,))
    params = init_lifter(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "ck")
    save_checkpoint(path, params, backend="orbax")
    tmpl_o = optax.adam(1e-3).init(params)
    loaded, opt_loaded, _ = load_checkpoint(
        path, init_lifter(jax.random.PRNGKey(1), cfg), tmpl_o)
    _tree_allclose(params, loaded)
    assert opt_loaded is None


def test_orbax_shape_mismatch_raises(tmp_path):
    params = init_lifter(jax.random.PRNGKey(0), LifterConfig(widths=(16,)))
    path = str(tmp_path / "ck")
    save_checkpoint(path, params, backend="orbax")
    bad = init_lifter(jax.random.PRNGKey(1), LifterConfig(widths=(32,)))
    with pytest.raises(Exception):
        load_checkpoint(path, bad)


def test_orbax_overwrite_replaces_previous_version(tmp_path):
    cfg = LifterConfig(widths=(16,))
    p1 = init_lifter(jax.random.PRNGKey(0), cfg)
    p2 = init_lifter(jax.random.PRNGKey(2), cfg)
    path = str(tmp_path / "ck")
    save_checkpoint(path, p1, meta={"epoch": 1}, backend="orbax")
    save_checkpoint(path, p2, meta={"epoch": 2}, backend="orbax")
    loaded, _, meta = load_checkpoint(path, p1)
    _tree_allclose(p2, loaded)
    assert meta["epoch"] == 2


def test_orbax_save_never_deletes_live_before_commit(tmp_path):
    # durability: the live <path>.orbax/ must survive until the replacement
    # is fully on disk — arrays commit into <path>.orbax.next/ and swap in
    cfg = LifterConfig(widths=(16,))
    p1 = init_lifter(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "ck")
    save_checkpoint(path, p1, meta={"epoch": 1}, backend="orbax")
    import os
    assert os.path.isdir(path + ".orbax")
    assert not os.path.isdir(path + ".orbax.next")


def test_orbax_committed_staging_is_adopted(tmp_path):
    # crash between staging commit and swap: .orbax.next/ + .json.next
    # exist, .orbax/ holds the previous save — loaders must adopt staging
    import os
    cfg = LifterConfig(widths=(16,))
    p1 = init_lifter(jax.random.PRNGKey(0), cfg)
    p2 = init_lifter(jax.random.PRNGKey(2), cfg)
    path = str(tmp_path / "ck")
    save_checkpoint(path, p1, meta={"epoch": 1}, backend="orbax")
    save_checkpoint(path, p2, meta={"epoch": 2}, backend="orbax")
    # simulate the crash window: demote the committed save to staging
    os.rename(path + ".orbax", path + ".orbax.next")
    os.rename(path + ".json", path + ".json.next")
    from mpe3d_tpu.train.checkpoint import read_meta
    assert checkpoint_exists(path)
    assert read_meta(path)["epoch"] == 2          # sidecar adopted too
    loaded, _, meta = load_checkpoint(path, p1)
    _tree_allclose(p2, loaded)
    assert meta["epoch"] == 2
    assert os.path.isdir(path + ".orbax")
    assert not os.path.isdir(path + ".orbax.next")


def test_backend_switch_never_loads_stale_twin(tmp_path):
    # npz leg then orbax leg at the same path: the orbax save removes the
    # npz twin, so a later load cannot return leg-1 arrays with leg-2 meta
    import os
    cfg = LifterConfig(widths=(16,))
    p1 = init_lifter(jax.random.PRNGKey(0), cfg)
    p2 = init_lifter(jax.random.PRNGKey(2), cfg)
    path = str(tmp_path / "ck")
    save_checkpoint(path, p1, meta={"epoch": 1}, backend="npz")
    save_checkpoint(path, p2, meta={"epoch": 2}, backend="orbax")
    assert not os.path.exists(path + ".npz")
    loaded, _, meta = load_checkpoint(path, p1)
    _tree_allclose(p2, loaded)
    assert meta["epoch"] == 2
    # and the reverse: npz save removes the orbax twin
    save_checkpoint(path, p1, meta={"epoch": 3}, backend="npz")
    assert not os.path.isdir(path + ".orbax")
    loaded, _, meta = load_checkpoint(path, p2)
    _tree_allclose(p1, loaded)
    assert meta["epoch"] == 3


def test_async_save_failure_surfaces_on_wait(tmp_path):
    # a failed background save must not be silent: wait_for_async_saves
    # re-raises, and the pending list is drained for the next run
    path = str(tmp_path / "sub" / "ck")
    cfg = LifterConfig(widths=(16,))
    params = init_lifter(jax.random.PRNGKey(0), cfg)
    bad = {"layers": [{"w": object()}]}           # unsaveable leaf
    with pytest.raises(Exception):
        save_checkpoint(path, bad, backend="orbax", wait=False)
        wait_for_async_saves()
    wait_for_async_saves()                        # drained: no re-raise
    save_checkpoint(path, params, backend="orbax", wait=False)
    wait_for_async_saves()
    loaded, _, _ = load_checkpoint(path, params)
    _tree_allclose(params, loaded)


def test_orbax_sharded_save_restores_sharded(tmp_path):
    # a data-parallel-sharded tree saves from its shards and restores with
    # the template's sharding intact (multi-chip training checkpoints)
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mpe3d_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    n = mesh.devices.size
    sh = NamedSharding(mesh, P("data"))
    tree = {"w": jax.device_put(jnp.arange(n * 16.0).reshape(n, 16), sh),
            "b": jax.device_put(jnp.ones((n,)), sh)}
    path = str(tmp_path / "ck")
    save_checkpoint(path, tree, backend="orbax")
    tmpl = {"w": jax.ShapeDtypeStruct((n, 16), jnp.float32, sharding=sh),
            "b": jax.ShapeDtypeStruct((n,), jnp.float32, sharding=sh)}
    loaded, _, _ = load_checkpoint(path, tmpl)
    assert loaded["w"].sharding == sh
    _tree_allclose(tree, loaded)


def test_concurrent_readers_during_async_saves(tmp_path):
    """read_meta/checkpoint_exists from another thread while async saves
    finalize: the flock'd swap must never crash a reader or destroy the
    just-committed checkpoint (the unlocked rmtree+rename interleave
    could)."""
    import threading
    import time

    from mpe3d_tpu.train.checkpoint import read_meta

    cfg = LifterConfig(widths=(16,))
    trees = [init_lifter(jax.random.PRNGKey(i), cfg) for i in range(6)]
    path = str(tmp_path / "ck")
    save_checkpoint(path, trees[0], meta={"i": 0}, backend="orbax")
    stop, reader_errs = threading.Event(), []
    reader_deadline = time.monotonic() + 120.0   # bounded: a reader can
    # never spin forever even if stop is lost (round-2 VERDICT: sleepless
    # readers at 100% CPU starved the 1-core host while a save wedged)

    def reader():
        while not stop.is_set() and time.monotonic() < reader_deadline:
            try:
                assert checkpoint_exists(path)
                m = read_meta(path)
                assert "i" in m
            except Exception as e:  # noqa: BLE001 — the assertion target
                reader_errs.append(e)
                return
            time.sleep(0.001)      # yield: keep hammering the swap window
            # without monopolising the single core

    threads = [threading.Thread(target=reader) for _ in range(3)]
    for t in threads:
        t.start()
    for i, tree in enumerate(trees[1:], start=1):
        save_checkpoint(path, tree, meta={"i": i}, backend="orbax",
                        wait=False)
    wait_for_async_saves()
    stop.set()
    for t in threads:
        t.join(timeout=30)
    assert not reader_errs, reader_errs
    loaded, _, meta = load_checkpoint(path, trees[0])
    _tree_allclose(trees[-1], loaded)
    assert meta["i"] == len(trees) - 1


class _WedgedCheckpointer:
    """Stand-in for the orbax Checkpointer whose save blocks until
    released — models the round-2 VERDICT failure (a rare
    orbax/tensorstore interleave on a 1-core host futex-blocked forever
    inside save, stale tmp dir on disk, training + session hung)."""

    def __init__(self):
        import threading
        self.release = threading.Event()
        self.calls = 0

    def save(self, path, args=None, force=False):
        self.calls += 1
        assert self.release.wait(timeout=60), "test leaked a wedged writer"


def test_orbax_wedged_save_recovers_via_npz_fallback(tmp_path, monkeypatch):
    """Watchdog fence: a wedged orbax array write must not hang training —
    after the deadline the SAME snapshot commits synchronously through the
    npz backend, wait_for_async_saves returns, and a late completion of
    the abandoned writer can never resurrect a stale orbax artifact."""
    import time

    from mpe3d_tpu.train import checkpoint as ck

    wedged = _WedgedCheckpointer()
    monkeypatch.setattr(ck, "_ORBAX_CKPTR", wedged)
    monkeypatch.setenv("MPE3D_ORBAX_WATCHDOG_S", "1")

    cfg = LifterConfig(widths=(16,))
    params = init_lifter(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "ck")
    try:
        save_checkpoint(path, params, meta={"epoch": 9}, backend="orbax",
                        wait=False)
        t0 = time.monotonic()
        wait_for_async_saves()                       # must NOT hang
        assert time.monotonic() - t0 < 30
        assert wedged.calls == 1
        assert os.path.exists(path + ".npz")          # npz fallback committed
        assert not os.path.isdir(path + ".orbax")
        loaded, _, meta = load_checkpoint(path, params)
        for x, y in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(loaded)):
            assert np.allclose(np.asarray(x), np.asarray(y))
        assert meta["epoch"] == 9
    finally:
        wedged.release.set()
    # let the abandoned writer run its fence, then confirm it did not
    # resurrect any orbax artifact over the npz recovery save
    deadline = time.monotonic() + 10
    while time.monotonic() < deadline and any(
            t.name == "mpe3d-ckpt-orbax-write" for t in
            __import__("threading").enumerate()):
        time.sleep(0.05)
    assert not os.path.isdir(path + ".orbax.next")
    assert os.path.exists(path + ".npz")
    _, _, meta = load_checkpoint(path, params)
    assert meta["epoch"] == 9


def test_wait_for_async_saves_deadline_raises_with_stack(tmp_path):
    """wait_for_async_saves can no longer block unboundedly: a save that
    does not commit within the deadline raises TimeoutError carrying the
    saver thread's stack, and the undrained future stays pending."""
    import threading

    from mpe3d_tpu.train import checkpoint as ck

    release = threading.Event()

    def blocked_task():
        release.wait(timeout=60)

    path = os.path.abspath(str(tmp_path / "stuck"))
    fut = ck._save_executor().submit(blocked_task)
    ck._PENDING_SAVES.append((path, fut))
    try:
        with pytest.raises(TimeoutError, match="did not commit within"):
            wait_for_async_saves(timeout=0.5)
        # the wedged save is re-tracked so a later wait still sees it
        assert any(p == path for p, _ in ck._PENDING_SAVES)
    finally:
        release.set()
        fut.result(timeout=60)
        ck._PENDING_SAVES = [pf for pf in ck._PENDING_SAVES if pf[0] != path]


def test_load_checkpoint_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_checkpoint(str(tmp_path / "nope"),
                        init_lifter(jax.random.PRNGKey(0),
                                    LifterConfig(widths=(16,))))


def test_lifter_trainer_orbax_backend_end_to_end(tmp_path, panoptic_rig):
    # in-loop saves stream the DEVICE tree asynchronously; the finally
    # block commits the tracked best — the checkpoint on disk must equal
    # result.params
    from mpe3d_tpu.data.synthetic import generate_single_person_frames
    from mpe3d_tpu.train.lifter import train_lifter
    from mpe3d_tpu.train.lifter_data import build_lifter_dataset

    frames = generate_single_person_frames(PANOPTIC, panoptic_rig, 20,
                                           seed=0)
    net, err = build_lifter_dataset(frames, PANOPTIC, panoptic_rig,
                                    augment=False)
    cfg = LifterConfig(widths=(32,))
    tcfg = LifterTrainConfig(epochs=4, batch_size=32, eval_every=1,
                             patience=10, lr=1e-3,
                             checkpoint_backend="orbax",
                             save_rel_improve=0.0)
    path = str(tmp_path / "pose_estimator")
    res = train_lifter(net, err, net, err, PANOPTIC, panoptic_rig, cfg,
                       tcfg, checkpoint_path=path, log=lambda s: None)
    assert checkpoint_exists(path)
    loaded, _, meta = load_checkpoint(
        path, init_lifter(jax.random.PRNGKey(1), cfg))
    _tree_allclose(res.params, loaded)
    assert meta["train_config"]["checkpoint_backend"] == "orbax"
    assert meta["val_loss"] == res.best_val_loss

def test_orbax_params_only_load_with_saved_opt_state(tmp_path):
    """The serving/eval path (cli.load_models) passes no opt_state
    template; an orbax checkpoint that also stores opt_state must still
    load params-only (partial restore) instead of raising a structure
    mismatch — the npz backend's behavior."""
    cfg = LifterConfig(widths=(16,))
    params = init_lifter(jax.random.PRNGKey(0), cfg)
    opt_state = optax.adam(1e-3).init(params)
    path = str(tmp_path / "ck")
    save_checkpoint(path, params, opt_state=opt_state,
                    meta={"epoch": 3}, backend="orbax")
    loaded, opt_loaded, meta = load_checkpoint(
        path, init_lifter(jax.random.PRNGKey(1), cfg))
    _tree_allclose(params, loaded)
    assert opt_loaded is None
    assert meta["epoch"] == 3


def test_orbax_sidecar_heals_after_partial_finalize(tmp_path):
    """Crash-window repair: if a finalize dies between the array-dir
    rename and the sidecar refresh, the meta embedded in the arrays dir
    must win on the next read (arrays+meta commit as a pair)."""
    import json
    import os

    cfg = LifterConfig(widths=(16,))
    params = init_lifter(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "ck")
    save_checkpoint(path, params, meta={"epoch": 1}, backend="orbax")
    save_checkpoint(path, params, meta={"epoch": 2}, backend="orbax")
    # simulate the crash: regress the sidecar to the OLD meta with an
    # mtime older than the embedded copy
    emb = os.path.join(path + ".orbax", "_mpe3d_meta.json")
    assert os.path.exists(emb)
    with open(path + ".json", "w") as f:
        json.dump({"epoch": 1}, f)
    os.utime(path + ".json", (0, 0))
    _, _, meta = load_checkpoint(path, init_lifter(jax.random.PRNGKey(1), cfg))
    assert meta["epoch"] == 2


def test_npz_meta_embedded_and_sidecar_healed(tmp_path):
    """npz saves commit arrays+meta atomically in ONE file (review
    finding: the old in-place np.savez + separate meta write could pair
    new arrays with stale meta, silently flipping e.g. residual_prior
    semantics).  A lost/stale sidecar is healed from the embedded copy."""
    from mpe3d_tpu.train.checkpoint import read_meta, save_checkpoint

    path = str(tmp_path / "ck")
    params = {"w": np.arange(6, dtype=np.float32)}
    save_checkpoint(path, params, meta={"epoch": 7, "prior": "median"})
    assert read_meta(path)["epoch"] == 7

    os.remove(path + ".json")              # crash between the two replaces
    meta = read_meta(path)                 # healed from __meta_json__
    assert meta == {"epoch": 7, "prior": "median"}
    assert os.path.exists(path + ".json")  # sidecar restored on disk

    # stale sidecar (older than the npz) is refreshed too
    with open(path + ".json", "w") as f:
        f.write('{"epoch": 1}')
    old = os.path.getmtime(path + ".npz") - 100
    os.utime(path + ".json", (old, old))
    assert read_meta(path)["epoch"] == 7

    loaded, _, meta2 = load_checkpoint(path, {"w": np.zeros(6, np.float32)})
    np.testing.assert_array_equal(loaded["w"], params["w"])
    assert meta2["epoch"] == 7


def test_wait_for_async_saves_filters_by_path(tmp_path):
    """load_checkpoint must not stall on (or inherit failures from) an
    unrelated path's in-flight async save (review finding)."""
    import threading

    from mpe3d_tpu.train import checkpoint as ck

    slow_path = str(tmp_path / "slow")
    fast_path = str(tmp_path / "fast")
    params = {"w": np.ones(3, np.float32)}
    save_checkpoint(fast_path, params, meta={"tag": "fast"})

    release = threading.Event()

    def blocked_task():
        release.wait(timeout=30)
        raise RuntimeError("unrelated save failed")

    fut = ck._save_executor().submit(blocked_task)
    ck._PENDING_SAVES.append((os.path.abspath(slow_path), fut))
    try:
        # the fast path's load must neither block on nor re-raise from
        # the slow path's pending save
        loaded, _, meta = load_checkpoint(fast_path,
                                          {"w": np.zeros(3, np.float32)})
        assert meta["tag"] == "fast"
        assert any(p == os.path.abspath(slow_path)
                   for p, _ in ck._PENDING_SAVES)
    finally:
        release.set()
        with pytest.raises(RuntimeError, match="unrelated"):
            ck.wait_for_async_saves()
