"""Validate the int8 pallas serving kernel on the real TPU.

Compares ops/quant_matmul.py's pallas path against the XLA emulation path
(same math: bf16 operands, fp32 accumulation, post-scale) at the lifter's
layer shapes, on-chip, with a value readback.  Run BEFORE trusting
bench_serve_dtype --dtype int8 numbers.

    python scripts/check_int8_onchip.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/mpe3d_jax_cache")

    from mpe3d_tpu.ops.quant_matmul import int8_weight_matmul, xla_int8_matmul

    results = {"backend": jax.default_backend(), "cases": []}
    key = jax.random.PRNGKey(0)
    # the lifter's serving shapes: [persons<=16, K] @ [K, N]
    for M, K, N in [(8, 1260, 3072), (16, 3072, 3072), (16, 2048, 1024),
                    (16, 1024, 1024)]:
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        x = jax.random.normal(k1, (M, K))
        wq = jax.random.randint(k2, (K, N), -127, 128, jnp.int8)
        scale = jax.random.uniform(k3, (N,), minval=1e-3, maxval=0.05)
        rscale = jax.random.uniform(k4, (K,), minval=0.5, maxval=2.0)
        b = jax.random.normal(k5, (N,))
        ref = np.asarray(xla_int8_matmul(x, wq, scale, b, 0.1, rscale))
        got = np.asarray(int8_weight_matmul(x, wq, scale, b, alpha=0.1,
                                            rscale=rscale, use_pallas=True))
        denom = np.abs(ref).max() + 1e-9
        rel = float(np.abs(got - ref).max() / denom)
        results["cases"].append({"shape": [M, K, N], "max_rel_err": rel})
        assert rel < 5e-3, (M, K, N, rel)

    # vmapped case — infer_batch maps the fused program over frames, so
    # the kernel must also be correct under pallas' batching rule on-chip
    k1, k2, k3 = jax.random.split(key, 3)
    xb = jax.random.normal(k1, (4, 8, 1260))
    wq = jax.random.randint(k2, (1260, 512), -127, 128, jnp.int8)
    scale = jax.random.uniform(k3, (512,), minval=1e-3, maxval=0.05)
    ref = np.asarray(jax.vmap(
        lambda xi: xla_int8_matmul(xi, wq, scale, None, None))(xb))
    got = np.asarray(jax.vmap(
        lambda xi: int8_weight_matmul(xi, wq, scale, use_pallas=True))(xb))
    rel = float(np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9))
    results["cases"].append({"shape": "vmap(4)x[8,1260,512]",
                             "max_rel_err": rel})
    assert rel < 5e-3, rel

    results["ok"] = True
    print(json.dumps(results))


if __name__ == "__main__":
    main()
