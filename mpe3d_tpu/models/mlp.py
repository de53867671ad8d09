"""Pose-lifter MLP as a pure pytree module.

TPU-native re-implementation of the reference lifter (reference:
utils/mlp.py:3-31): Flatten → Linear 1260→3072→3072→2048→2048→1024→1024→1024
→1024→54 with LeakyReLU(0.1) between — ≈29.1 M params.  Output is 18 joints ×
3 coordinates in *decameters* (consumers multiply by 10 for metres, reference:
test/metrics_from_model.py:282).

Design notes (TPU):
  * Parameters are a plain dict-of-arrays pytree → trivially shardable with
    ``jax.sharding`` and checkpointable as npz.
  * ``apply`` optionally runs the matmuls in bfloat16 (MXU native) while
    keeping parameters + activations accumulation in float32
    (``preferred_element_type``) — the accuracy-relevant path.
  * Layer widths (3072/2048/1024) are already multiples of the 128-lane MXU
    tile; the 1260-dim input is padded to 1280 by XLA automatically.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from mpe3d_tpu.config import LifterConfig

Params = Dict[str, Any]


def _kaiming_uniform(key, fan_in: int, shape, dtype=jnp.float32):
    """torch.nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, jnp.float32))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def init_lifter(key: jax.Array, cfg: LifterConfig) -> Params:
    """Initialise lifter parameters (same distribution family as the
    reference's torch defaults: Kaiming-uniform weight, uniform bias)."""
    dims = (cfg.in_dim, *cfg.widths, cfg.out_dim)
    params: Params = {"layers": []}
    keys = jax.random.split(key, len(dims) - 1)
    for i, (d_in, d_out) in enumerate(zip(dims[:-1], dims[1:])):
        kw, kb = jax.random.split(keys[i])
        if cfg.residual_prior and i == len(dims) - 2:
            # zero-init the head: the initial prediction IS the prior
            params["layers"].append({
                "w": jnp.zeros((d_in, d_out), jnp.float32),
                "b": jnp.zeros((d_out,), jnp.float32),
            })
            continue
        params["layers"].append({
            "w": _kaiming_uniform(kw, d_in, (d_in, d_out)),
            "b": _kaiming_uniform(kb, d_in, (d_out,)),
        })
    return params


def extract_prior(x: jnp.ndarray, cfg: LifterConfig) -> jnp.ndarray:
    """Triangulated-prior fields of a packed lifter input, as an [..., out_dim]
    coordinate vector (decameters — the lifter's own output unit).

    The packer (lifting/pack.py) writes the same triangulated point into
    fields 11:14 of every (camera, joint) block of 14 numbers
    (numbers_per_joint, reference: parameters.py:31), zeroed where the
    triangulation is invalid; camera-dropout masking keeps these fields, so
    block 0 always carries the prior.
    """
    J = cfg.out_dim // 3
    per = 14  # numbers_per_joint
    C = cfg.in_dim // (J * per)
    assert C * J * per == cfg.in_dim, (cfg.in_dim, cfg.out_dim)
    blocks = x.reshape(*x.shape[:-1], C, J, per)
    return blocks[..., 0, :, 11:14].reshape(*x.shape[:-1], cfg.out_dim)


def apply_lifter(params: Params, x: jnp.ndarray, cfg: LifterConfig,
                 compute_dtype: Optional[jnp.dtype] = None,
                 use_pallas_quant: Optional[bool] = None) -> jnp.ndarray:
    """Forward pass.  x: [..., in_dim] → [..., out_dim] (decameters).

    ``compute_dtype=jnp.bfloat16`` casts matmul operands to bf16 with fp32
    accumulation — the MXU fast path; weights stay fp32 in HBM.

    Layers quantised by ``quantize_lifter_weights`` (key ``wq``) run the
    int8 weight-streaming path (ops/quant_matmul.py; pallas on TPU unless
    ``use_pallas_quant`` overrides) — activations still bf16, fp32 accum.
    """
    from mpe3d_tpu.ops.quant_matmul import int8_weight_matmul

    if "fused_flat" in params:
        # whole-network pallas serving kernel (ops/fused_mlp.py): one
        # launch, weights streamed HBM→VMEM double-buffered, activations
        # VMEM-resident.  Packed trees come from pack_lifter_serving —
        # serving only (no gradient path).
        from mpe3d_tpu.ops.fused_mlp import fused_mlp_forward
        flat = params["fused_flat"]
        kinds, dims = _parse_fused_flat(flat)
        lead = x.shape[:-1]
        h = fused_mlp_forward(
            x.reshape(-1, x.shape[-1]), flat, kinds, dims,
            cfg.negative_slope, cfg.out_dim,
            interpret=jax.default_backend() != "tpu")
        h = h.reshape(*lead, cfg.out_dim)
        if cfg.residual_prior:
            h = h + extract_prior(x, cfg)
        return h

    layers = params["layers"]
    h = x
    n = len(layers)
    for i, layer in enumerate(layers):
        alpha = cfg.negative_slope if i < n - 1 else None
        if "wq" in layer:
            h = int8_weight_matmul(h, layer["wq"], layer["scale"],
                                   layer["b"], alpha=alpha,
                                   rscale=layer.get("rscale"),
                                   use_pallas=use_pallas_quant)
            continue
        w, b = layer["w"], layer["b"]
        if compute_dtype is not None:
            h_c = h.astype(compute_dtype)
            w_c = w.astype(compute_dtype)
        else:
            h_c, w_c = h, w
        h = jnp.dot(h_c, w_c, preferred_element_type=jnp.float32) + b
        if alpha is not None:
            h = jax.nn.leaky_relu(h, negative_slope=alpha)
    if cfg.residual_prior:
        h = h + extract_prior(x, cfg)
    return h


def _parse_fused_flat(flat):
    """Recover (kinds, dims) statically from a packed flat list: an int8
    leading array marks a quantised layer (wq, scale, rscale, b), anything
    else a plain one (w, b).  Shapes/dtypes are static even on tracers."""
    kinds, dims, i = [], [], 0
    while i < len(flat):
        w = flat[i]
        if w.dtype == jnp.int8:
            kinds.append("q")
            i += 4
        else:
            kinds.append("w")
            i += 2
        dims.append(tuple(w.shape))
    return tuple(kinds), tuple(dims)


def pack_lifter_serving(params: Params) -> Params:
    """Pack a serving tree (fp32/bf16 ``w`` or quantised ``wq`` layers) for
    the whole-network pallas kernel (ops/fused_mlp.py).  Host-side, once
    per pipeline — never inside a per-frame program.  The packed tree is
    serving-only (plain weights are cast to bf16; no gradient path)."""
    from mpe3d_tpu.ops.fused_mlp import pack_fused_layers
    flat, _, _ = pack_fused_layers(params["layers"])
    return {"fused_flat": list(flat)}


def cast_lifter_weights(params: Params, dtype) -> Params:
    """Copy of ``params`` with the weight matrices stored in ``dtype``
    (biases stay float32 — they add into the fp32 accumulator).

    Serving rationale: on TPU the DEFAULT matmul precision already rounds
    fp32 operands to bfloat16 on their way into the MXU, so storing the
    weights as bf16 is numerically identical to the default inference
    path while halving the weight bytes read from HBM per frame — the
    29.1 M-param lifter (116 MB fp32) dominates the fused program's
    memory traffic.
    """
    return {"layers": [{"w": layer["w"].astype(dtype), "b": layer["b"]}
                       for layer in params["layers"]]}


def quantize_lifter_weights(params: Params, keep_last_fp: bool = True,
                            row_scale: bool = True) -> Params:
    """Two-sided symmetric int8 quantisation of the weight matrices
    (serving only — there is no dequantised master copy).

    ``w ≈ rscale[:, None] * (wq * scale[None, :])`` with int8 ``wq``:
    each input row is first normalised by its absolute maximum
    (``rscale[k] = max|w[k, :]|``) and the result quantised per output
    channel (``scale[j] = max|w'[:, j]| / 127``).  The row scales fold
    *exactly* into the activation (``(x * rscale) @ wq``), so serving
    streams pure int8 weights plus two fp32 scale vectors — quartering
    the dominant HBM stream vs fp32 (29 MB vs 116 MB for the 29.1 M-param
    lifter).  Biases stay fp32 (they add into the fp32 accumulator).

    Why two-sided (measured on real checkpoints, packed dev inputs,
    output delta vs fp32): the packer's input fields mix units (pixels,
    decameters, flags — lifting/pack.py), so layer-0 rows span orders of
    magnitude and per-channel-only scales are dominated by a few large
    rows — 15.8 mm output delta on the absolute-head checkpoint.  Row
    normalisation drops it to 4.8 mm (bf16-rounding floor: 2.2 mm); the
    residual-prior head checkpoint sits at 0.29 mm because only the small
    correction flows through quantised layers (its fp32 prior is added
    exactly, ``extract_prior``).

    ``keep_last_fp``: leave the output head un-quantised (default).  The
    head is 0.2% of the weight bytes but 100% of the output sensitivity.
    """
    layers = params["layers"]
    out = []
    for i, layer in enumerate(layers):
        if "wq" in layer or (keep_last_fp and i == len(layers) - 1):
            out.append(dict(layer))
            continue
        w = jnp.asarray(layer["w"], jnp.float32)
        if row_scale:
            rscale = jnp.maximum(jnp.max(jnp.abs(w), axis=1), 1e-12)
            w = w / rscale[:, None]
        scale = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-12) / 127.0
        wq = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
        q = {"wq": wq, "scale": scale,
             "b": jnp.asarray(layer["b"], jnp.float32)}
        if row_scale:
            q["rscale"] = rscale
        out.append(q)
    return {"layers": out}


def dequantize_lifter_weights(params: Params) -> Params:
    """Reconstruct fp32 weight matrices from a quantised tree:
    ``w = rscale[:, None] * (wq * scale[None, :])`` (the exact dequant the
    serving kernels apply — ops/quant_matmul.py).

    This does NOT recover the original fp32 master (quantisation already
    happened); it yields the fp32 tree the int8 path *effectively serves*.
    Use case: dtype latency A/Bs driven from an int8 servable export
    (models_demo/*) need an fp-structured tree for their bf16/fp32 arms —
    latency depends on bytes and shapes, not values, so a dequantised
    master gives honest bf16-arm timings when no fp32 checkpoint survives
    (scripts/bench_serve_dtype.py, scripts/bench_fused_mlp.py)."""
    out = []
    for layer in params["layers"]:
        if "wq" not in layer:
            out.append(dict(layer))
            continue
        w = (jnp.asarray(layer["wq"], jnp.float32)
             * jnp.asarray(layer["scale"], jnp.float32)[None, :])
        if "rscale" in layer:
            w = w * jnp.asarray(layer["rscale"], jnp.float32)[:, None]
        out.append({"w": w, "b": jnp.asarray(layer["b"], jnp.float32)})
    return {"layers": out}


def prepad_quantized_lifter(params: Params) -> Params:
    """Zero-pad each int8 weight matrix's K (input) dim to the pallas
    kernel's 128-lane alignment, ONCE, at serving-setup time.

    Padding inside the per-frame program (`ops/quant_matmul.py`) is a full
    HBM copy of the multi-MB operand on EVERY dispatch — for the lifter
    only layer 0's K=1260 is misaligned, ~3.9 MB/frame of pure copy.  Zero
    rows contribute nothing to the dot; ``rscale`` stays at the true K (it
    folds into x before x is padded), and both int8 paths (pallas and the
    XLA oracle) accept the padded shape.  The on-disk servable format
    stays UNPADDED (export-servable) so old exports keep loading through
    the shape-checked template."""
    out = []
    for layer in params["layers"]:
        if "wq" not in layer:
            out.append(layer)
            continue
        wq = layer["wq"]
        Kp = -(-wq.shape[0] // 128) * 128
        if Kp != wq.shape[0]:
            layer = dict(layer)
            layer["wq"] = jnp.zeros(
                (Kp, wq.shape[1]), jnp.int8).at[:wq.shape[0]].set(wq)
        out.append(layer)
    return {"layers": out}


def lifter_is_quantized(params: Params) -> bool:
    """True if any layer carries int8-quantised weights (key ``wq``).

    Such trees are serving-only: there is no fp32 master copy to train or
    re-cast, so the pipeline must route them through the int8 path."""
    return any("wq" in layer for layer in params["layers"])


def lifter_num_params(params: Params) -> int:
    return sum(int(v.size) for layer in params["layers"] for v in layer.values())
