"""Probe Mosaic (pallas TPU) lowering support for the op patterns the
whole-frame kernel (ops/frame_kernel.py) is designed around.

Each probe compiles + runs one tiny pallas kernel on the default backend
and reports ok/fail with the error class.  Run on the real chip:

    python scripts/probe_mosaic.py            # all probes
    python scripts/probe_mosaic.py dyn_fori   # one probe

Design decisions gated on this (see docs/ARCHITECTURE.md):
  * decode loop: dynamic fori bound vs static-K masked body
  * candidate field extraction: masked-reduce scalars vs SMEM tables
  * prior-plane assembly: stack+reshape lane-merge vs static expansion
    matrices (the Ek broadcast-sum form needs neither)

Measured on the real v5e (2026-08-22 session, jax in this image):

    dyn_fori                 OK    dynamic fori_loop trip counts work
    dyn_fori_vmem_scalar     OK    bound from an in-kernel reduction too
    argmax_extract           OK    iterated-argmax decode is viable
    scalar_select_broadcast  OK    0-d scalars drive vector selects
    rank3_bcast_reduce       OK    gather/pack as rank-3 multiply-sums
    expand_matrix            OK    prior scatter via static 0/1 matrices
    stack_reshape            FAIL  no lane-merge reshape (avoided)
    unaligned_store          OK    non-128-aligned lane slices store fine
    entry_dma_fanout         OK    the weight-stream overlap pattern
    int_vector_ops           OK    int32 compares/selects
    cumsum                   FAIL  no cumsum (dense LE-mask instead)

(An f32 broadcasted_iota also fails verification — tpu.iota is
integer-only; build int32 and cast.)
"""

import sys
import traceback

import jax
import jax.numpy as jnp
import numpy as np


def _run(name, fn):
    try:
        out = fn()
        out = jax.device_get(out)
        print(f"[probe] {name}: OK   {np.asarray(out).ravel()[:4]}")
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:160]
        print(f"[probe] {name}: FAIL {type(e).__name__}: {msg}")
        return False


def probe_dyn_fori():
    """fori_loop with a data-dependent trip count read from a VMEM value."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(n_ref, x_ref, o_ref):
        n = n_ref[0, 0]

        def body(i, acc):
            return acc + x_ref[:]

        o_ref[:] = jax.lax.fori_loop(0, n, body, jnp.zeros_like(x_ref))

    x = jnp.ones((8, 128), jnp.float32)
    n = jnp.array([[5]], jnp.int32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(n, x)


def probe_dyn_fori_vmem_scalar():
    """fori bound computed IN-kernel from a vector reduction (the decode's
    n_live = min(sum(eligible), K))."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        n = jnp.minimum(jnp.sum((x_ref[:] > 0).astype(jnp.int32)), 7)

        def body(i, acc):
            return acc + 1.0

        o_ref[0, 0] = jax.lax.fori_loop(0, n, body, jnp.float32(0))

    x = jnp.ones((8, 128), jnp.float32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )(x)


def probe_argmax_extract():
    """Iterated argmax + masked-reduce scalar extraction (decode pattern):
    idx = argmin(where(x == max(x), iota, BIG)); field = sum(tbl * onehot)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    E = 160

    def kernel(x_ref, tbl_ref, o_ref):
        x = x_ref[:]                                     # [E, 1]
        iota = jax.lax.broadcasted_iota(jnp.int32, (E, 1), 0)
        m = jnp.max(x)
        idx = jnp.min(jnp.where(x >= m, iota, E + 1))
        oh = (iota == idx).astype(jnp.float32)
        o_ref[0, 0] = jnp.sum(tbl_ref[:] * oh)

    x = jnp.arange(E, dtype=jnp.float32).reshape(E, 1) % 37
    tbl = jnp.arange(E, dtype=jnp.float32).reshape(E, 1)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )(x, tbl)


def probe_scalar_select_broadcast():
    """Scalar (0-d from reduce) driving jnp.where over a 2D tile, plus
    scalar arithmetic chains (the decode's reject/merge logic)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        s = jnp.sum(x_ref[:])          # 0-d
        a_has = s > 3.0
        root = jnp.where(a_has, s, -1.0)
        o_ref[:] = jnp.where(a_has & (root > 0), x_ref[:] * root, x_ref[:])

    x = jnp.ones((8, 128), jnp.float32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


def probe_rank3_bcast_reduce():
    """Rank-3 broadcast multiply + reduce over the middle axis (the
    gather/pack pattern: out[p, j] = sum_s sel[p, s] * src[s, j])."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P, S, J = 8, 8, 18

    def kernel(sel_ref, src_ref, o_ref):
        sel = sel_ref[:]                                  # [P, S]
        src = src_ref[:]                                  # [S, J]
        o_ref[:] = jnp.sum(sel[:, :, None] * src[None, :, :], axis=1)

    sel = jnp.eye(P, S, dtype=jnp.float32)
    src = jnp.arange(S * J, dtype=jnp.float32).reshape(S, J)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((P, J), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(sel, src)


def probe_expand_matrix():
    """Static expansion-matrix form for the prior plane: out[p, f] =
    sum_j val[p, j] * Ek[j, f] as a rank-3 broadcast-sum (no lane merge)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P, J, F = 8, 18, 256

    def kernel(v_ref, ek_ref, o_ref):
        v = v_ref[:]                                      # [P, J]
        ek = ek_ref[:]                                    # [J, F]
        o_ref[:] = jnp.sum(v[:, :, None] * ek[None, :, :], axis=1)

    ek = np.zeros((J, F), np.float32)
    for j in range(J):
        ek[j, j * 14 + 11] = 1.0
    v = jnp.arange(P * J, dtype=jnp.float32).reshape(P, J)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((P, F), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(v, jnp.asarray(ek))


def probe_stack_reshape():
    """Lane-merge: stack K [P, J] arrays on a new last axis then flatten
    to [P, J*K] (informational — the Ek form avoids needing this)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P, J = 8, 18

    def kernel(a_ref, b_ref, o_ref):
        st = jnp.stack([a_ref[:], b_ref[:]], axis=-1)     # [P, J, 2]
        o_ref[:] = st.reshape(P, J * 2)

    a = jnp.ones((P, J), jnp.float32)
    b = jnp.zeros((P, J), jnp.float32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((P, J * 2), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b)


def probe_unaligned_store():
    """Static but non-128-aligned lane-slice store into a ref
    (informational fallback for net assembly)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        o_ref[:] = jnp.zeros_like(o_ref)
        o_ref[:, 252:270] = x_ref[:]

    x = jnp.ones((8, 18), jnp.float32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 512), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


def probe_entry_dma_fanout():
    """Several whole-matrix HBM→VMEM DMAs issued at kernel entry, compute
    between issue and wait (the weight-stream overlap pattern)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K, N = 256, 256

    def kernel(x_ref, w0_ref, w1_ref, o_ref, wb0, wb1, sem):
        d0 = pltpu.make_async_copy(w0_ref, wb0, sem.at[0])
        d1 = pltpu.make_async_copy(w1_ref, wb1, sem.at[1])
        d0.start()
        d1.start()
        # "GAT phase" stand-in
        h = x_ref[:] * 2.0
        d0.wait()
        h = jnp.dot(h.astype(jnp.bfloat16), wb0[:].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        d1.wait()
        o_ref[:] = jnp.dot(h.astype(jnp.bfloat16), wb1[:].astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)

    x = jnp.ones((16, K), jnp.float32)
    w0 = jnp.full((K, N), 0.01, jnp.bfloat16)
    w1 = jnp.full((N, N), 0.01, jnp.bfloat16)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((16, N), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((K, N), jnp.bfloat16),
                        pltpu.VMEM((N, N), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA((2,))],
    )(x, w0, w1)


def probe_int_vector_ops():
    """int32 vector compares/selects + float<->int casts (decode state)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H = 24

    def kernel(c_ref, o_ref):
        c = c_ref[:]                                      # [H, 1] i32
        iota = jax.lax.broadcasted_iota(jnp.int32, (H, 1), 0)
        upd = jnp.where((c == -1) | (iota < 5), iota, c)
        o_ref[:] = upd.astype(jnp.float32)

    c = jnp.full((H, 1), -1, jnp.int32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((H, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(c)


def probe_cumsum():
    """jnp.cumsum along lanes (informational — dense LT-mask fallback)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        o_ref[:] = jnp.cumsum(x_ref[:], axis=1)

    x = jnp.ones((1, 32), jnp.float32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 32), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


PROBES = {
    "dyn_fori": probe_dyn_fori,
    "dyn_fori_vmem_scalar": probe_dyn_fori_vmem_scalar,
    "argmax_extract": probe_argmax_extract,
    "scalar_select_broadcast": probe_scalar_select_broadcast,
    "rank3_bcast_reduce": probe_rank3_bcast_reduce,
    "expand_matrix": probe_expand_matrix,
    "stack_reshape": probe_stack_reshape,
    "unaligned_store": probe_unaligned_store,
    "entry_dma_fanout": probe_entry_dma_fanout,
    "int_vector_ops": probe_int_vector_ops,
    "cumsum": probe_cumsum,
}


def main():
    names = sys.argv[1:] or list(PROBES)
    print(f"[probe] backend = {jax.default_backend()}")
    results = {}
    for n in names:
        results[n] = _run(n, PROBES[n])
    ok = sum(results.values())
    print(f"[probe] {ok}/{len(results)} ok")


if __name__ == "__main__":
    main()
