"""Typed configuration for camera rigs, models and training.

TPU-native replacement for the reference's module-level namedtuple config
(reference: parameters.py:12-133).  Frozen dataclasses instead of a global
hand-edited switch; every config is explicit and serialisable, and the two
reference environments (CMU Panoptic, ARP Lab) ship as presets.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

# COCO-18 joint vocabulary (reference: skeleton_matching/graph_generator.py:63-67)
COCO_JOINT_NAMES: Tuple[str, ...] = (
    "nose", "left_eye", "right_eye", "left_ear", "right_ear",
    "left_shoulder", "right_shoulder", "left_elbow", "right_elbow",
    "left_wrist", "right_wrist", "left_hip", "right_hip",
    "left_knee", "right_knee", "left_ankle", "right_ankle", "neck",
)

# BODY_25 joint vocabulary (reference: skeleton_matching/graph_generator.py:68-74)
BODY25_JOINT_NAMES: Tuple[str, ...] = (
    "nose", "neck", "right_shoulder", "right_elbow", "right_hand",
    "left_shoulder", "left_elbow", "left_hand", "hip",
    "right_hip", "right_knee", "right_ankle", "left_hip",
    "left_knee", "left_ankle", "right_eye", "left_eye", "right_ear",
    "left_ear", "left_foot_ball", "left_toes", "left_heel",
    "right_foot_ball", "right_toes", "right_heel",
)

JOINT_NAMES_BY_FORMAT = {"COCO": COCO_JOINT_NAMES, "BODY_25": BODY25_JOINT_NAMES}

# COCO-18 bone topology for drawing (reference: human_pose.json)
COCO_BONES: Tuple[Tuple[int, int], ...] = (
    (17, 0), (0, 1), (0, 2), (1, 3), (2, 4),
    (17, 5), (17, 6), (5, 7), (7, 9), (6, 8), (8, 10),
    (17, 11), (17, 12), (11, 13), (13, 15), (12, 14), (14, 16),
)


@dataclass(frozen=True)
class RigConfig:
    """A calibrated multi-camera rig (reference: parameters.py TrackerParameters).

    All per-camera sequences are index-aligned with ``camera_names``.
    """

    name: str
    image_width: int
    image_height: int
    camera_names: Tuple[str, ...]
    fx: Tuple[float, ...]
    fy: Tuple[float, ...]
    cx: Tuple[float, ...]
    cy: Tuple[float, ...]
    kd0: Tuple[float, ...]
    kd1: Tuple[float, ...]
    kd2: Tuple[float, ...]
    p1: Tuple[float, ...]
    p2: Tuple[float, ...]
    used_cameras: Tuple[str, ...]
    used_cameras_skeleton_matching: Tuple[str, ...]
    used_joints: Tuple[int, ...]
    min_number_of_views: int = 2
    joint_format: str = "COCO"
    numbers_per_joint: int = 14
    numbers_per_joint_for_loss: int = 4
    transformations_path: str = ""
    graph_alternative: str = "3"
    # drawing axis map: label -> (coordinate index, direction)
    # (reference: parameters.py:77)
    axes_3d: Tuple[Tuple[str, Tuple[int, float]], ...] = (
        ("X", (0, 1.0)), ("Y", (2, 1.0)), ("Z", (1, -1.0)),
    )

    # ---- derived sizes -------------------------------------------------
    @property
    def joint_names(self) -> Tuple[str, ...]:
        return JOINT_NAMES_BY_FORMAT[self.joint_format]

    @property
    def n_joints(self) -> int:
        return len(self.joint_names)

    @property
    def n_cameras(self) -> int:
        return len(self.camera_names)

    @property
    def n_used_cameras(self) -> int:
        return len(self.used_cameras)

    @property
    def n_matching_cameras(self) -> int:
        return len(self.used_cameras_skeleton_matching)

    @property
    def lifter_input_dim(self) -> int:
        """14 numbers per (used camera, joint) (reference:
        utils/pose_estimator_dataset_from_json.py:126-129)."""
        return self.n_used_cameras * self.n_joints * self.numbers_per_joint

    @property
    def loss_input_dim(self) -> int:
        """4 numbers per (camera, joint) for the reprojection loss."""
        return self.n_cameras * self.n_joints * self.numbers_per_joint_for_loss

    @property
    def matcher_feature_dim(self) -> int:
        """Alt-3 head-node feature width: 2 one-hot + 10 per (matching
        camera, joint) (reference: skeleton_matching/graph_generator.py:128-140)."""
        return 2 + self.n_matching_cameras * self.n_joints * 10

    def matcher_feature_dim_alt(self, alt: str = "3") -> int:
        """Feature width per graph alternative (alt-1: node-type + camera
        one-hots + 4 joint metrics + n_joints, reference
        graph_generator.py:119-120; alt-2: 4 numbers/(cam, joint),
        :121-127)."""
        if alt == "1":
            return 2 + self.n_joints + self.n_matching_cameras + 4 + 1
        per = {"2": 4, "3": 10}[alt]
        return 2 + self.n_matching_cameras * self.n_joints * per

    def used_camera_indices(self) -> Tuple[int, ...]:
        return tuple(self.camera_names.index(c) for c in self.used_cameras)

    def matching_camera_indices(self) -> Tuple[int, ...]:
        return tuple(self.camera_names.index(c) for c in self.used_cameras_skeleton_matching)

    # ---- (de)serialisation --------------------------------------------
    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, text: str) -> "RigConfig":
        raw = json.loads(text)
        raw["axes_3d"] = tuple((k, tuple(v)) for k, v in raw["axes_3d"])
        for f in dataclasses.fields(cls):
            if f.name in raw and isinstance(raw[f.name], list):
                raw[f.name] = tuple(
                    tuple(x) if isinstance(x, list) else x for x in raw[f.name]
                )
        return cls(**raw)


# ---------------------------------------------------------------------------
# Reference environment presets
# ---------------------------------------------------------------------------

# CMU Panoptic, HD cameras 3/6/12/13/23 (reference: parameters.py:52-78)
PANOPTIC = RigConfig(
    name="PANOPTIC",
    image_width=1920,
    image_height=1080,
    camera_names=("trackera", "trackerb", "trackerc", "trackerd", "trackere"),
    fx=(1395.59, 1395.94, 1395.31, 1591.32, 1572.31),
    fy=(1392.03, 1392.22, 1391.77, 1587.2, 1567.51),
    cx=(950.046, 950.459, 966.65, 940.617, 942.938),
    cy=(564.906, 547.877, 562.988, 560.913, 559.888),
    kd0=(-0.28619, -0.279874, -0.284888, -0.232872, -0.237061),
    kd1=(0.179547, 0.166215, 0.179936, 0.194125, 0.18403),
    kd2=(-0.0451919, -0.035049, -0.0468637, 0.0125375, 0.0149481),
    p1=(-0.00010526, -0.000189415, -0.000119731, 4.22e-05, -0.000448556),
    p2=(6.45495e-05, 0.00107791, 0.000701704, 0.000877748, 0.00062731),
    used_cameras=("trackera", "trackerb", "trackerc", "trackerd", "trackere"),
    used_cameras_skeleton_matching=(
        "trackera", "trackerb", "trackerc", "trackerd", "trackere"),
    used_joints=(0, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17),
    transformations_path="tm_panoptic.pickle",
    axes_3d=(("X", (0, 1.0)), ("Y", (2, 1.0)), ("Z", (1, -1.0))),
)

_ARP_F = 848.0 / 1280.0
_ARP_ZF = 720.0 / 1080.0

# ARP Lab: 4 wall cameras + 2 robot-mounted (reference: parameters.py:79-123)
ARPLAB = RigConfig(
    name="ARPLAB",
    image_width=1280,
    image_height=720,
    camera_names=("trackera", "trackerb", "trackerc", "trackerd",
                  "orinbot_l", "orinbot_r"),
    fx=(634.0370 * _ARP_F, 633.6757 * _ARP_F, 636.5411 * _ARP_F,
        635.4050 * _ARP_F, 1097.2998046875 * _ARP_ZF, 1097.2998046875 * _ARP_ZF),
    fy=(633.5662 * _ARP_F, 633.0649 * _ARP_F, 636.1349 * _ARP_F,
        634.5941 * _ARP_F, 1097.2998046875 * _ARP_ZF, 1097.2998046875 * _ARP_ZF),
    cx=(631.7626 * _ARP_F, 635.7685 * _ARP_F, 638.4467 * _ARP_F,
        638.3454 * _ARP_F, 953.3253173828125 * _ARP_ZF, 953.3253173828125 * _ARP_ZF),
    cy=(355.3067 * _ARP_F, 358.7285 * _ARP_F, 370.3130 * _ARP_F,
        362.9503 * _ARP_F, 553.707763671875 * _ARP_ZF, 553.707763671875 * _ARP_ZF),
    kd0=(0.0,) * 6,
    kd1=(0.0,) * 6,
    kd2=(0.0,) * 6,
    p1=(0.0,) * 6,
    p2=(0.0,) * 6,
    used_cameras=("trackera", "trackerb", "trackerc", "trackerd",
                  "orinbot_l", "orinbot_r"),
    used_cameras_skeleton_matching=("trackera", "trackerb", "trackerc",
                                    "trackerd", "orinbot_l", "orinbot_r"),
    used_joints=(0, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17),
    transformations_path="tm_arp.pickle",
    axes_3d=(("X", (0, 1.0)), ("Y", (1, 1.0)), ("Z", (2, -1.0))),
)

_RIGS: Dict[str, RigConfig] = {"PANOPTIC": PANOPTIC, "ARPLAB": ARPLAB}


def get_rig(name: str) -> RigConfig:
    """Look up a rig preset by name (case-insensitive)."""
    try:
        return _RIGS[name.upper()]
    except KeyError:
        raise KeyError(f"Unknown rig '{name}'. Available: {sorted(_RIGS)}") from None


# ---------------------------------------------------------------------------
# Model configs
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class MatcherConfig:
    """GAT hyper-parameters (reference: train_skeleton_matching.py:40-57)."""

    in_dim: int = 902
    hidden: Tuple[int, ...] = (40, 40, 40, 30)
    heads: Tuple[int, ...] = (10, 10, 8, 5)
    n_classes: int = 1
    alpha: float = 0.15             # attention LeakyReLU slope
    feat_drop: float = 0.0
    attn_drop: float = 0.0
    residual: bool = False
    bias: bool = True
    hidden_slope: float = 0.01      # inter-layer LeakyReLU (torch default)
    use_pallas_proj: bool = False   # fused fc1+leaky+fc2 Pallas kernel (TPU)
    # whole-stack VMEM-resident megakernel at inference (ops/gat_kernel.py);
    # serving knob like use_pallas_proj, not part of the architecture
    use_pallas_matcher: bool = False
    # grid-tiled pallas stack (ops/gat_tiled.py) — the crowded-bucket
    # (S=10/16) serving form, where the single-body megakernel exceeds
    # physical VMEM via Mosaic register-spill slots; serving knob
    use_tiled_matcher: bool = False
    # matmul operand precision for the XLA GAT path.  "highest" (default)
    # keeps fp32 operands — serving parity: bf16 rounding visibly moves
    # scores near the 0.5 decision threshold (models/gat.py).  "default"
    # lets the MXU take bf16 operands (fp32 accumulate) — the training-
    # throughput configuration (bench.py matcher ladder); not a serving
    # knob.
    matmul_precision: str = "highest"

    @property
    def n_layers(self) -> int:
        return len(self.hidden) + 1


@dataclass(frozen=True)
class LifterConfig:
    """MLP lifter hyper-parameters (reference: utils/mlp.py:3-31)."""

    in_dim: int = 1260
    out_dim: int = 54
    widths: Tuple[int, ...] = (3072, 3072, 2048, 2048, 1024, 1024, 1024, 1024)
    negative_slope: float = 0.1
    # Extension (no reference counterpart, default off = exact reference
    # semantics): predict a *correction to the triangulated prior* already
    # present in the input (fields 11:14, lifting/pack.py) instead of
    # absolute coordinates.  The final layer is zero-initialised so training
    # starts exactly at the prior; where the prior is invalid its fields are
    # zero and the head degrades to an absolute prediction.  Recorded in the
    # checkpoint meta; loaders reconstruct it (train/checkpoint.py).
    residual_prior: bool = False


@dataclass(frozen=True)
class MatcherTrainConfig:
    """Reference: train_skeleton_matching.py:31-58."""

    epochs: int = 100
    lr: float = 1e-4
    batch_size: int = 15
    weight_decay: float = 1e-20
    patience: int = 5
    eval_every: int = 5
    limit: int = 120000
    use_bce: bool = False
    seed: int = 0
    # run each epoch as ONE jit-compiled lax.scan over its batches — one
    # dispatch per epoch (the tail partial batch is dropped)
    scan_epoch: bool = True
    # "npz" (synchronous host arrays) | "orbax" (async, sharded-aware —
    # saves overlap training; see train/checkpoint.py)
    checkpoint_backend: str = "npz"


@dataclass(frozen=True)
class LifterTrainConfig:
    """Reference: pose_estimator/train_pose_estimator.py:4-10."""

    epochs: int = 10000
    lr: float = 1e-4
    batch_size: int = 2096
    patience: int = 20
    eval_every: int = 5
    grad_clip_norm: float = 10.0
    optimise_matrices: bool = False
    max_combinations_number: int = 5   # camera-dropout augmentation cap
    seed: int = 58008
    # run each epoch as ONE jit-compiled lax.scan over its batches — one
    # dispatch per epoch (the tail partial batch is dropped)
    scan_epoch: bool = True
    # per-epoch dataset shuffle (reference: DataLoader(shuffle=True)).
    # False = deterministic in-order batches — used by the trainer-level
    # parity A/B (scripts/trainer_parity_ab.py) to compare loss
    # trajectories against the reference's own training loop step-for-step
    shuffle: bool = True
    # reprojection-loss variant (lifting/loss.py): "reference" = the
    # reference's MSE-of-summed-L1 (bit-parity); "per_term" = masked mean
    # of squared per-term residuals (converges to the reprojection
    # least-squares optimum — the reference loss stalls in a noise ball at
    # ~2× the DLT prior's MPJPE); "huber" = per_term with outlier
    # robustness (huber_delta px knee).
    loss: str = "reference"
    huber_delta: float = 10.0
    # persist a checkpoint only when val improves by this relative margin
    # since the LAST SAVE (the best params are still tracked at every eval,
    # as an on-device copy).  Early in a training leg val improves at every
    # eval, and pulling the 116 MB parameter tree through a remote-TPU relay
    # per eval dominated wall clock (measured 26 s → 1126 s per 10 epochs).
    # The final best is always saved at loop end.
    save_rel_improve: float = 0.02
    # "npz" (synchronous host arrays) | "orbax" (async, sharded-aware —
    # in-loop saves stream the DEVICE tree on a background thread, no
    # blocking device_get; see train/checkpoint.py)
    checkpoint_backend: str = "npz"
    # matmul operand dtype for the training forward/backward ("bf16" casts
    # activations AND weight operands to bf16 at the matmul, fp32
    # accumulation + fp32 master weights/optimizer — the MXU already
    # rounds operands to bf16 under default precision, so the numerics
    # are unchanged; the cast halves the activation HBM traffic the
    # backward pass re-reads.  None = fp32 operands (reference parity).
    compute_dtype: Optional[str] = None
    # Polyak/EMA weight averaging (0 = off; typical 0.999): a second
    # parameter tree tracks ema = d*ema + (1-d)*params after every step,
    # carried INSIDE the scan-epoch program (one extra tree_map per step,
    # device-resident — no extra dispatches).  Eval, early stopping and
    # checkpoints all use the EMA copy: the self-supervised reprojection
    # loss is noisy (detector noise enters every gradient), and averaging
    # removes the final-iterate jitter.  Extension — the reference always
    # evaluates the raw final iterate.
    ema_decay: float = 0.0


@dataclass(frozen=True)
class BucketConfig:
    """Static shape buckets so the whole pipeline jits without dynamic shapes.

    The reference builds a fresh python graph per frame; we pad to the
    smallest bucket that fits and mask.  Recompilation is bounded by the
    ladder length.
    """

    max_skeletons_per_view: int = 10
    head_buckets: Tuple[int, ...] = (16, 32, 64)
    pair_buckets: Tuple[int, ...] = (64, 256, 1024)
    person_buckets: Tuple[int, ...] = (8, 16)

    def head_bucket(self, n: int) -> int:
        for b in self.head_buckets:
            if n <= b:
                return b
        return self.head_buckets[-1]

    def pair_bucket(self, n: int) -> int:
        for b in self.pair_buckets:
            if n <= b:
                return b
        return self.pair_buckets[-1]
