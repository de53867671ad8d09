"""Two-process mesh simulation: jax.distributed over CPU processes.

``dryrun_multichip`` validates the multi-chip program on a single-process
virtual mesh, which cannot exercise the MULTI-HOST code paths: process
coordination (the DCN analog), global arrays assembled from per-process
addressable shards, and cross-process sharded checkpoint I/O (each
process writing/restoring only its own shards).  This harness does
(round-3 VERDICT #7):

  * parent mode spawns two child processes, each pinned to the CPU
    backend with 4 virtual devices (global device count 8), joined via
    ``jax.distributed.initialize`` on a localhost coordinator;
  * the children build the shared (data=4, model=2) mesh
    (parallel/mesh.py::make_mesh over the GLOBAL device list), run one
    data-parallel training step on the real lifter model
    (models/mlp.py::apply_lifter + optax) with the batch sharded across
    both processes — the gradient psum crosses the process boundary;
  * a dp×tp-sharded parameter tree (layer-0 weight sharded over the
    model axis) round-trips through the orbax checkpoint backend
    (train/checkpoint.py): every process writes its own shards, then
    restores them against a sharded abstract template, and each process
    verifies its ADDRESSABLE shards against the host oracle;
  * the parent checks both children agree on the loss (replicated
    output => the collective ran) and both report restore OK.

    python scripts/multiprocess_mesh.py            # parent: spawn+check
    python scripts/multiprocess_mesh.py --proc 0 --num 2 --port 12421 \
        --dir /tmp/x                               # child (internal)

Opt-in test wrapper: tests/test_multiprocess_mesh.py (MPE3D_MULTIPROC=1).
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_DEV_PER_PROC = 4


def child(proc_id: int, num: int, port: int, out_dir: str) -> None:
    # force CPU before ANY backend query (a site-installed TPU plugin
    # overrides JAX_PLATFORMS — CLAUDE.md); the virtual device count
    # must be in XLA_FLAGS before backend init (parent sets it too)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"localhost:{port}", num_processes=num,
                               process_id=proc_id)
    import jax.numpy as jnp
    import numpy as np
    import optax

    from mpe3d_tpu.config import LifterConfig
    from mpe3d_tpu.models.mlp import apply_lifter, init_lifter
    from mpe3d_tpu.parallel.mesh import make_mesh
    from mpe3d_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    assert jax.process_count() == num, jax.process_count()
    assert jax.device_count() == num * N_DEV_PER_PROC, jax.device_count()
    assert jax.local_device_count() == N_DEV_PER_PROC

    mesh = make_mesh(n_data=N_DEV_PER_PROC, n_model=num)
    P = jax.sharding.PartitionSpec
    repl = jax.sharding.NamedSharding(mesh, P())
    data_sh = jax.sharding.NamedSharding(mesh, P(("data", "model")))

    # --- one global DP step on the real lifter model ------------------
    cfg = LifterConfig(in_dim=24, out_dim=6, widths=(32, 16))
    params = init_lifter(jax.random.PRNGKey(0), cfg)   # same on both
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    rng = np.random.default_rng(0)                     # same on both
    batch = rng.normal(size=(32, cfg.in_dim)).astype(np.float32)
    target = rng.normal(size=(32, cfg.out_dim)).astype(np.float32)

    def loss_fn(p, x, y):
        return jnp.mean((apply_lifter(p, x, cfg) - y) ** 2)

    def step_fn(p, o, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(p, x, y)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    # the full host batch is identical on every process; each process
    # materialises only its ADDRESSABLE shards of the global array
    # (make_array_from_callback), and the grad psum crosses the process
    # boundary.  Cross-process shardings on raw numpy are rejected by
    # jax, so params/opt ride the replicated in_shardings instead.
    def globalize(full):
        return jax.make_array_from_callback(
            full.shape, data_sh, lambda idx: full[idx])

    step = jax.jit(step_fn,
                   in_shardings=(repl, repl, data_sh, data_sh),
                   out_shardings=(repl, repl, repl))
    params2, opt_state2, loss = step(params, opt_state,
                                     globalize(batch), globalize(target))
    loss = float(loss)          # replicated output -> same everywhere

    # --- dp×tp-sharded orbax round-trip across processes --------------
    w_sh = jax.sharding.NamedSharding(mesh, P(None, "model"))

    def shard_tree(p):
        out = {"layers": []}
        for i, layer in enumerate(p["layers"]):
            s = w_sh if i == 0 else repl
            out["layers"].append({
                "w": jax.jit(lambda x: x, out_shardings=s)(layer["w"]),
                "b": jax.jit(lambda x: x, out_shardings=repl)(layer["b"]),
            })
        return out

    host_tree = jax.tree_util.tree_map(np.asarray, params2)
    sharded = shard_tree(params2)
    ck = os.path.join(out_dir, "ck")
    save_checkpoint(ck, sharded, meta={"loss": loss}, backend="orbax",
                    wait=True)

    tmpl = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                       sharding=x.sharding), sharded)
    restored, _, meta = load_checkpoint(ck, tmpl)

    # verify THE ADDRESSABLE SHARDS of this process against the oracle
    ok = True
    for i, layer in enumerate(restored["layers"]):
        for k in ("w", "b"):
            arr = layer[k]
            want = host_tree["layers"][i][k]
            for sh in arr.addressable_shards:
                if not np.array_equal(np.asarray(sh.data),
                                      want[sh.index]):
                    ok = False
    with open(os.path.join(out_dir, f"proc{proc_id}.json"), "w") as f:
        json.dump({"loss": loss, "restore_ok": ok,
                   "meta_loss": meta.get("loss"),
                   "devices": jax.device_count(),
                   "mesh": list(mesh.shape.items())}, f)
    jax.distributed.shutdown()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--proc", type=int, default=None)
    ap.add_argument("--num", type=int, default=2)
    ap.add_argument("--port", type=int, default=None)
    ap.add_argument("--dir", default=None)
    args = ap.parse_args()

    if args.proc is not None:
        child(args.proc, args.num, args.port, args.dir)
        return 0

    with socket.socket() as s:      # pick a free coordinator port
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    num = args.num
    out_dir = args.dir or tempfile.mkdtemp(prefix="mpe3d_mp_")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        f" --xla_force_host_platform_device_count="
                        f"{N_DEV_PER_PROC}").strip()
    env["JAX_PLATFORM_NAME"] = "cpu"
    env.setdefault("PYTHONPATH", "")
    env["PYTHONPATH"] = REPO + os.pathsep + env["PYTHONPATH"]

    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--proc", str(i),
         "--num", str(num), "--port", str(port), "--dir", out_dir],
        env=env) for i in range(num)]
    rcs = [p.wait(timeout=600) for p in procs]
    if any(rcs):
        print(f"[multiproc] child exit codes {rcs}", file=sys.stderr)
        return 1

    results = []
    for i in range(num):
        with open(os.path.join(out_dir, f"proc{i}.json")) as f:
            results.append(json.load(f))
    losses = {r["loss"] for r in results}
    ok = (len(losses) == 1
          and all(r["restore_ok"] for r in results)
          and all(r["devices"] == num * N_DEV_PER_PROC for r in results))
    print(f"[multiproc] processes={num} global_devices="
          f"{results[0]['devices']} mesh={results[0]['mesh']} "
          f"loss={results[0]['loss']:.6f} (agree={len(losses) == 1}) "
          f"sharded_orbax_roundtrip="
          f"{all(r['restore_ok'] for r in results)}")
    print(f"[multiproc] {'OK' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
