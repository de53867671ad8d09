"""On-chip ledger of the LIFT stage (round-2 VERDICT item 3).

The fused frame's lift stage (C − B in bench_stage_breakdown) bundles
per-person input packing (triangulated prior), the 29 M-param MLP, and the
pose-quality epilogue.  This script splits it and compares every serving
variant of the MLP against two measured floors:

  * ``stream_floor`` — a pure read-every-weight-byte program (jnp sums of
    each weight matrix): the session's ACHIEVABLE HBM read time for the
    served bytes, i.e. the hardware floor including any relay/session
    overhead baked into the chained methodology;
  * the analytic 819 GB/s floor.

Variants: XLA bf16 (auto serving default), XLA fp32, whole-network pallas
kernel (ops/fused_mlp.py) on bf16 and on int8, XLA int8 per-layer
(ops/quant_matmul.py).  Methodology: chained differential (benchutil.py).

Usage: python scripts/diag_lift_ledger.py [--cpu] [--k 200]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def chain_us(fn, params, x, k1, k2, reps=3):
    """Per-iteration µs of ``fn(params, x) -> tensor`` via chained
    differential with a 1e-9 feedback nudge (benchutil methodology)."""
    import jax
    import jax.numpy as jnp

    def make(K):
        @jax.jit
        def chain(p, x0):
            def body(i, xc):
                out = fn(p, xc)
                return xc + 1e-9 * jnp.sum(out)
            return jnp.sum(jax.lax.fori_loop(0, K, body, x0))
        return chain

    import jax
    params = jax.device_put(params)
    x = jax.device_put(x)
    c1, c2 = make(k1), make(k2)
    float(c1(params, x)); float(c2(params, x))
    t1s, t2s = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); float(c1(params, x))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(c2(params, x))
        t2s.append(time.perf_counter() - t0)
    return (min(t2s) - min(t1s)) / (k2 - k1) * 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--k", type=int, default=200)
    ap.add_argument("--m", type=int, default=8, help="activation rows")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/mpe3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    import numpy as np

    from mpe3d_tpu.config import PANOPTIC, LifterConfig
    from mpe3d_tpu.models.mlp import (apply_lifter, cast_lifter_weights,
                                      init_lifter, pack_lifter_serving,
                                      quantize_lifter_weights)

    lcfg = LifterConfig(in_dim=PANOPTIC.lifter_input_dim,
                        out_dim=PANOPTIC.n_joints * 3)
    fp32 = init_lifter(jax.random.PRNGKey(1), lcfg)
    bf16 = cast_lifter_weights(fp32, jnp.bfloat16)
    i8 = quantize_lifter_weights(fp32)
    fused_bf16 = pack_lifter_serving(bf16)
    fused_i8 = pack_lifter_serving(i8)

    M = args.m
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(M, lcfg.in_dim)).astype(np.float32) * 0.3)

    k1, k2 = (2, 6) if args.cpu else (args.k // 6, args.k)

    def wbytes(tree):
        return sum(np.size(v) * np.dtype(jnp.asarray(v).dtype).itemsize
                   for v in jax.tree_util.tree_leaves(tree))

    # pure weight-stream floor: read every served byte once, produce one
    # scalar (VPU reduce rides along with the stream)
    def reader(tree):
        leaves = [l for l in jax.tree_util.tree_leaves(tree)
                  if hasattr(l, "size") and np.size(l) > 4096]
        def fn(p, xc):
            ls = [l for l in jax.tree_util.tree_leaves(p)
                  if hasattr(l, "size") and np.size(l) > 4096]
            s = jnp.float32(0)
            for l in ls:
                s = s + jnp.sum(l.astype(jnp.float32) * xc[0, 0])
            return s
        return fn, leaves

    rows = {}
    rd, _ = reader(bf16)
    rows["stream_floor_bf16_us"] = round(chain_us(rd, bf16, x, k1, k2), 1)
    rd, _ = reader(i8)
    rows["stream_floor_int8_us"] = round(chain_us(rd, i8, x, k1, k2), 1)

    def mlp_fn(p, xc):
        return apply_lifter(p, xc, lcfg)

    rows["mlp_xla_fp32_us"] = round(chain_us(mlp_fn, fp32, x, k1, k2), 1)
    rows["mlp_xla_bf16_us"] = round(chain_us(mlp_fn, bf16, x, k1, k2), 1)
    rows["mlp_xla_int8_us"] = round(chain_us(mlp_fn, i8, x, k1, k2), 1)
    if jax.default_backend() == "tpu":
        rows["mlp_fused_bf16_us"] = round(
            chain_us(mlp_fn, fused_bf16, x, k1, k2), 1)
        rows["mlp_fused_int8_us"] = round(
            chain_us(mlp_fn, fused_i8, x, k1, k2), 1)

    out = {"backend": jax.default_backend(), "m_rows": M,
           "bytes_bf16_mb": round(wbytes(bf16) / 2**20, 2),
           "bytes_int8_mb": round(wbytes(i8) / 2**20, 2),
           "analytic_floor_bf16_us": round(wbytes(bf16) / 819e9 * 1e6, 1),
           "analytic_floor_int8_us": round(wbytes(i8) / 819e9 * 1e6, 1),
           **rows}
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
