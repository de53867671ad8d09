"""Shared benchmark timing helpers.

The chained-differential methodology lives here so bench.py and
scripts/bench_serve_dtype.py measure identically (they are compared against
each other in RESULTS.md).  Rationale (CLAUDE.md "Environment gotchas"):
through the axon relay only VALUE readbacks synchronise, so the fused frame
program is chained K times inside one jit — frame i+1's pixels nudged by
1e-9·Σposes_i, numerically invisible but defeating loop-invariant elision —
and timed as (t_K2 − t_K1)/(K2 − K1) with float() syncs, which cancels the
relay round trip and dispatch overhead shared by both runs.
"""

from __future__ import annotations

import time
from typing import Sequence

import jax
import jax.numpy as jnp


def chained_frame_us(core, model_args: Sequence, chain_args: Sequence,
                     k1: int, k2: int, reps: int = 3) -> float:
    """On-device per-frame time (µs) of ``core`` via chained differential.

    ``core(*model_args, kp, valid, prob, obs, present)`` must return the
    poses tensor first; ``chain_args`` are the five frame arrays with kp
    leading.  Params are passed as ARGUMENTS, not closure captures —
    captured device arrays ride the relay's hidden-parameter slow path.
    """

    def make_chain(K):
        @jax.jit
        def chain(*all_args):
            ml, frame = all_args[:len(model_args)], all_args[len(model_args):]
            kp0, rest = frame[0], frame[1:]

            def body(i, kp):
                poses = core(*ml, kp, *rest)[0]
                return kp + 1e-9 * jnp.sum(poses)

            return jnp.sum(jax.lax.fori_loop(0, K, body, kp0))
        return chain

    # ensure params are device-resident: a host-numpy tree (checkpoint
    # loads) would re-upload per call and dominate the differential
    model_args = jax.device_put(tuple(model_args))
    c1, c2 = make_chain(k1), make_chain(k2)
    float(c1(*model_args, *chain_args))            # compile both
    float(c2(*model_args, *chain_args))

    def measure(n):
        t1s, t2s = [], []
        for _ in range(n):
            t0 = time.perf_counter()
            float(c1(*model_args, *chain_args))
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(c2(*model_args, *chain_args))
            t2s.append(time.perf_counter() - t0)
        return (min(t2s) - min(t1s)) / (k2 - k1) * 1e6

    us = measure(reps)
    if us <= 0:
        # a host stall (e.g. CPU contention) inflated every short-chain
        # rep: the differential is meaningless.  One retry with more reps
        # — min() needs only a single clean pair to recover.
        us = measure(2 * reps)
    return us
