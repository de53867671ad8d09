"""PoseResNet-50 heatmap backbone in pure jax — the conversor's 2D detector.

Re-implements the architecture the reference uses for offline dataset
generation (reference: panoptic_conversor/pose_resnet.py:100-233, itself the
Microsoft simple-baselines model): ResNet-50 trunk → 3 × ConvTranspose(256,
k4, s2) + BN + ReLU → 1×1 conv → 18 heatmaps at input/4 resolution.

Inference-only by design (it generates training data, it is not trained
here): batch-norm is applied in inference form (scale/shift with running
stats), so the torch checkpoint importer can keep BN parameters verbatim.
NHWC layout, fp32 or bf16 — convolutions land on the MXU.

``load_torch_pose_resnet`` reads the VoxelPose-style checkpoint
(`pose_resnet50_panoptic.pth.tar`) via the standard simple-baselines
state_dict naming (conv1/bn1/layer{1-4}.{i}.{conv,bn}{1-3}/downsample,
deconv_layers, final_layer).
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

RESNET50_BLOCKS = (3, 4, 6, 3)
STAGE_WIDTHS = (64, 128, 256, 512)
EXPANSION = 4
DECONV_FILTERS = 256
N_DECONV = 3


# ---------------------------------------------------------------------------
# primitive ops
# ---------------------------------------------------------------------------


def conv2d(x: jnp.ndarray, w: jnp.ndarray, stride: int = 1,
           padding="SAME") -> jnp.ndarray:
    """x: [N,H,W,Cin]; w: [kh,kw,Cin,Cout] (HWIO)."""
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def deconv2d_k4s2(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """ConvTranspose2d(k=4, s=2, pad=1, out_pad=0) ≙ torch semantics.

    x: [N,H,W,Cin]; w: [4,4,Cout,Cin] — torch ConvTranspose weights keep
    their (out, in) channel order and ``transpose_kernel=True`` applies the
    required spatial flip, verified numerically against torch.
    Output [N,2H,2W,Cout].
    """
    return jax.lax.conv_transpose(
        x, w, (2, 2), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True)


def batch_norm(x: jnp.ndarray, bn: Params, eps: float = 1e-5) -> jnp.ndarray:
    inv = jax.lax.rsqrt(bn["var"] + eps)
    return (x - bn["mean"]) * inv * bn["scale"] + bn["bias"]


def max_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    """torch MaxPool2d(3, 2, padding=1)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))


# ---------------------------------------------------------------------------
# model
# ---------------------------------------------------------------------------


def _bottleneck(x: jnp.ndarray, p: Params, stride: int) -> jnp.ndarray:
    out = jax.nn.relu(batch_norm(conv2d(x, p["conv1"]), p["bn1"]))
    out = jax.nn.relu(batch_norm(conv2d(out, p["conv2"], stride), p["bn2"]))
    out = batch_norm(conv2d(out, p["conv3"]), p["bn3"])
    if "down_conv" in p:
        x = batch_norm(conv2d(x, p["down_conv"], stride), p["down_bn"])
    return jax.nn.relu(out + x)


def apply_pose_resnet(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """x: [N, H, W, 3] normalized images → heatmaps [N, H/4, W/4, J]."""
    h = jax.nn.relu(batch_norm(conv2d(x, params["conv1"], stride=2),
                               params["bn1"]))
    h = max_pool_3x3_s2(h)
    for li, n_blocks in enumerate(RESNET50_BLOCKS):
        for bi in range(n_blocks):
            stride = 2 if (li > 0 and bi == 0) else 1
            h = _bottleneck(h, params[f"layer{li + 1}"][bi], stride)
    for di in range(N_DECONV):
        d = params["deconv"][di]
        h = jax.nn.relu(batch_norm(deconv2d_k4s2(h, d["w"]), d["bn"]))
    return conv2d(h, params["final_w"]) + params["final_b"]


# ---------------------------------------------------------------------------
# init / torch import
# ---------------------------------------------------------------------------


def _bn_init(c: int) -> Params:
    return {"scale": jnp.ones(c), "bias": jnp.zeros(c),
            "mean": jnp.zeros(c), "var": jnp.ones(c)}


def init_pose_resnet(key: jax.Array, n_joints: int = 18) -> Params:
    """He-normal random init (for tests / fine-tuning from scratch)."""
    def conv_init(key, kh, kw, cin, cout):
        fan = kh * kw * cin
        return jax.random.normal(key, (kh, kw, cin, cout)) * (2.0 / fan) ** 0.5

    params: Params = {}
    key, k = jax.random.split(key)
    params["conv1"] = conv_init(k, 7, 7, 3, 64)
    params["bn1"] = _bn_init(64)
    cin = 64
    for li, (n_blocks, width) in enumerate(zip(RESNET50_BLOCKS, STAGE_WIDTHS)):
        blocks: List[Params] = []
        for bi in range(n_blocks):
            key, k1, k2, k3, k4 = jax.random.split(key, 5)
            p = {
                "conv1": conv_init(k1, 1, 1, cin, width),
                "bn1": _bn_init(width),
                "conv2": conv_init(k2, 3, 3, width, width),
                "bn2": _bn_init(width),
                "conv3": conv_init(k3, 1, 1, width, width * EXPANSION),
                "bn3": _bn_init(width * EXPANSION),
            }
            if bi == 0:
                p["down_conv"] = conv_init(k4, 1, 1, cin, width * EXPANSION)
                p["down_bn"] = _bn_init(width * EXPANSION)
            blocks.append(p)
            cin = width * EXPANSION
        params[f"layer{li + 1}"] = blocks
    deconvs = []
    for di in range(N_DECONV):
        key, k = jax.random.split(key)
        deconvs.append({"w": conv_init(k, 4, 4, DECONV_FILTERS, cin),
                        "bn": _bn_init(DECONV_FILTERS)})
        cin = DECONV_FILTERS
    params["deconv"] = deconvs
    key, k = jax.random.split(key)
    params["final_w"] = conv_init(k, 1, 1, cin, n_joints)
    params["final_b"] = jnp.zeros(n_joints)
    return params


def load_torch_pose_resnet(path: str) -> Params:
    """Import a simple-baselines/VoxelPose torch checkpoint.

    torch conv weights are OIHW → HWIO here; ConvTranspose weights are
    IOHW → our HWIO with (I, O) = (Cin, Cout).
    """
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    state = raw.get("state_dict", raw)
    state = {k.replace("module.", ""): v.numpy() for k, v in state.items()}

    def conv_w(name):
        return jnp.asarray(np.transpose(state[name], (2, 3, 1, 0)))

    def deconv_w(name):
        # torch ConvTranspose2d: [Cin, Cout, kh, kw] → [kh, kw, Cout, Cin]
        # (transpose_kernel=True in deconv2d_k4s2 handles the spatial flip)
        return jnp.asarray(np.transpose(state[name], (2, 3, 1, 0)))

    def bn(prefix):
        return {"scale": jnp.asarray(state[f"{prefix}.weight"]),
                "bias": jnp.asarray(state[f"{prefix}.bias"]),
                "mean": jnp.asarray(state[f"{prefix}.running_mean"]),
                "var": jnp.asarray(state[f"{prefix}.running_var"])}

    params: Params = {"conv1": conv_w("conv1.weight"), "bn1": bn("bn1")}
    for li, n_blocks in enumerate(RESNET50_BLOCKS):
        blocks = []
        for bi in range(n_blocks):
            pre = f"layer{li + 1}.{bi}"
            p = {
                "conv1": conv_w(f"{pre}.conv1.weight"),
                "bn1": bn(f"{pre}.bn1"),
                "conv2": conv_w(f"{pre}.conv2.weight"),
                "bn2": bn(f"{pre}.bn2"),
                "conv3": conv_w(f"{pre}.conv3.weight"),
                "bn3": bn(f"{pre}.bn3"),
            }
            if f"{pre}.downsample.0.weight" in state:
                p["down_conv"] = conv_w(f"{pre}.downsample.0.weight")
                p["down_bn"] = bn(f"{pre}.downsample.1")
            blocks.append(p)
        params[f"layer{li + 1}"] = blocks
    deconvs = []
    for di in range(N_DECONV):
        deconvs.append({"w": deconv_w(f"deconv_layers.{di * 3}.weight"),
                        "bn": bn(f"deconv_layers.{di * 3 + 1}")})
    params["deconv"] = deconvs
    params["final_w"] = conv_w("final_layer.weight")
    params["final_b"] = jnp.asarray(state["final_layer.bias"])
    return params
