"""On-device matcher composite-scene synthesis (jax RNG, vmapped gather).

Re-implements the reference's training-set synthesis (reference:
skeleton_matching/graph_generator.py:672-810 — sample 1..N single-person
frames from the highest-probability files, mark the biggest-per-camera
skeleton as that person's real head, label real↔real same-person pairs)
as a pure jax program over a DEVICE-RESIDENT bank of parsed recordings,
so the matcher trainer can stream epochs like the lifter's scan path with
zero host synthesis in the loop (round-3 VERDICT #3: the host pipeline in
train/matcher_data.py is a python-loop bottleneck the reference shares;
"TPU-first" should not inherit it).

Split of labour:
  * ``build_scene_bank`` (host, once): parse every single-person frame
    into fixed [F, C, K, J, …] tensors and enumerate the camera-subset
    augmentation pool (≙ utils/data_augmentation.py:50-85) as an index
    list — one (frame, camera-mask) entry per subset, no tensor copies;
  * ``synth_scenes`` (device): vmapped scene synthesis — sample
    num_people, pick that count's statically-precomputed
    highest-probability file set, draw one augmented entry per file
    (uniform), pack skeletons into (C, S) slots by running offset, mark
    real heads, and emit labels / pair multiplicities on the static
    topology.  Everything is fixed-shape; the only gathers are row
    gathers from the bank.

Distribution vs the host/reference synthesizer (tests/test_matcher_synth
.py asserts the parity that holds):
  * the (num_people → file set) map is byte-identical (same
    ``np.argpartition`` call, precomputed on host);
  * augmented entries are drawn uniformly WITH replacement, where the
    reference pops a pre-shuffled order without replacement and stops at
    first exhaustion (graph_generator.py:694-696).  Marginally each draw
    is uniform over the same pool — per-scene label/size marginals
    match; only cross-scene correlations differ (documented deviation);
  * scenes the reference SKIPS (slot overflow, no live pairs) are
    emitted as null scenes (pair_weight ≡ 0) instead — a no-op in the
    weighted loss; the parity test compares conditional-on-live
    marginals.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mpe3d_tpu.config import RigConfig
from mpe3d_tpu.matching.features import PairTopology
from mpe3d_tpu.train.matcher_data import _parse_skeletons


@dataclass
class SceneBank:
    """Device-resident parsed recordings + augmentation pool.

    kp/valid/prob/obs: [F, C, K, …] per-skeleton slabs (K = max skeletons
    per (frame, camera) across the bank); nsk [F, C] populated-skeleton
    counts; real_k [F, C] index of the biggest skeleton (-1 if none);
    aug_frame [A] / aug_mask [A, C]: the subset-augmentation pool;
    file_segments: per input file, its [start, end) range in the A axis;
    top_sets[n-1]: the n highest-probability file indices (reference
    argpartition order).
    """

    kp: jnp.ndarray
    valid: jnp.ndarray
    prob: jnp.ndarray
    obs: jnp.ndarray
    nsk: jnp.ndarray
    real_k: jnp.ndarray
    aug_frame: jnp.ndarray
    aug_mask: jnp.ndarray
    file_segments: Tuple[Tuple[int, int], ...]
    top_sets: Tuple[Tuple[int, ...], ...]

    @property
    def n_files(self) -> int:
        return len(self.file_segments)

    def device_arrays(self) -> Tuple[jnp.ndarray, ...]:
        return (self.kp, self.valid, self.prob, self.obs, self.nsk,
                self.real_k, self.aug_frame, self.aug_mask)


def build_scene_bank(inputs: List[List[dict]], rig_config: RigConfig,
                     probabilities: Optional[Sequence[float]] = None,
                     min_views: int = 2) -> SceneBank:
    """Parse single-person recordings into a fixed-shape device bank.

    ``inputs``: one list of wire frames per source file (the same
    structure build_matcher_scenes takes).  ``probabilities`` default
    mirrors train_skeleton_matching.py:122-132.
    """
    if probabilities is None:
        first = max(len(inputs[0]), 1)
        probabilities = [0.8 * len(l) / first for l in inputs]
        probabilities[0] = 0.8
    probs = np.asarray(probabilities, np.float64)
    n_files = len(inputs)
    top_sets = tuple(
        tuple(int(i) for i in np.argpartition(probs, -n)[-n:])
        for n in range(1, n_files + 1))

    used = rig_config.used_cameras
    match_cams = rig_config.used_cameras_skeleton_matching
    cam_pos = {c: i for i, c in enumerate(match_cams)}
    C = len(match_cams)
    J = rig_config.n_joints

    # pass 1: parse frames, find K
    parsed = []          # (file_idx, {match_ci: [skeletons]}, avail_used)
    for fi, frames in enumerate(inputs):
        for frame in frames:
            byc = {}
            avail = []
            for c in used:
                entry = frame.get(c)
                if entry is None:
                    continue
                sks = _parse_skeletons(entry, J)
                if not sks:
                    continue
                avail.append(c)
                if c in cam_pos:
                    byc[cam_pos[c]] = sks
            if avail:
                parsed.append((fi, byc, avail))
    K = max((len(s) for _, byc, _ in parsed for s in byc.values()),
            default=1)
    F = len(parsed)

    kp = np.zeros((F, C, K, J, 2), np.float32)
    valid = np.zeros((F, C, K, J), np.float32)
    prob = np.zeros((F, C, K, J), np.float32)
    obs = np.zeros((F, C, K, J), np.float32)
    nsk = np.zeros((F, C), np.int32)
    real_k = np.full((F, C), -1, np.int32)
    for f, (fi, byc, avail) in enumerate(parsed):
        for ci, sks in byc.items():
            nsk[f, ci] = len(sks)
            real_k[f, ci] = int(np.argmax([s[4] for s in sks]))
            for k, (skp, sv, sp, so, _) in enumerate(sks):
                kp[f, ci, k] = skp
                valid[f, ci, k] = sv
                prob[f, ci, k] = sp
                obs[f, ci, k] = so.astype(np.float32)

    # augmentation pool (≙ camera_subset_augment: full set first, then
    # every proper subset of avail USED cameras with >= min_views)
    aug_frame, aug_mask = [], []
    segs, file_of = [], np.array([fi for fi, _, _ in parsed])
    for fi in range(n_files):
        start = len(aug_frame)
        for f in np.nonzero(file_of == fi)[0]:
            _, _, avail = parsed[f]
            n = len(avail)
            full = np.zeros(C, np.float32)
            for c in avail:
                if c in cam_pos:
                    full[cam_pos[c]] = 1.0
            aug_frame.append(f)
            aug_mask.append(full)
            for bits in range(1, 2 ** n):
                subset = [avail[i] for i in range(n) if bits >> i & 1]
                if len(subset) < min_views or len(subset) == n:
                    continue
                m = np.zeros(C, np.float32)
                for c in subset:
                    if c in cam_pos:
                        m[cam_pos[c]] = 1.0
                aug_frame.append(f)
                aug_mask.append(m)
        if len(aug_frame) == start:
            # an empty segment would make the in-branch uniform draw
            # silently index a NEIGHBOURING file's entries (randint over
            # an empty range clamps) — same 2D evidence under two person
            # ids is a contradictory training signal; fail loudly
            raise ValueError(
                f"input file {fi} contributed no parseable single-person "
                f"frames — every file in the bank must have at least one")
        segs.append((start, len(aug_frame)))

    return SceneBank(
        kp=jnp.asarray(kp), valid=jnp.asarray(valid),
        prob=jnp.asarray(prob), obs=jnp.asarray(obs),
        nsk=jnp.asarray(nsk), real_k=jnp.asarray(real_k),
        aug_frame=jnp.asarray(np.asarray(aug_frame, np.int32)),
        aug_mask=jnp.asarray(np.stack(aug_mask) if aug_mask
                             else np.zeros((0, C), np.float32)),
        file_segments=tuple(segs), top_sets=top_sets)


def synth_scenes(bank_arrays: Tuple[jnp.ndarray, ...], key,
                 n_scenes: int, topo: PairTopology,
                 file_segments: Tuple[Tuple[int, int], ...],
                 top_sets: Tuple[Tuple[int, ...], ...]):
    """Synthesize ``n_scenes`` composite scenes on device.

    Returns the 7-tuple (kp [N,C,S,J,2], valid, prob, obs(bool),
    present(bool), labels [N,E], pair_weight [N,E]) — the same batch
    layout train_matcher consumes.  jit-friendly (static n_scenes/topo).
    """
    (b_kp, b_valid, b_prob, b_obs, b_nsk, b_realk,
     aug_frame, aug_mask) = bank_arrays
    n_files = len(file_segments)
    P = n_files
    C, S, J = topo.n_cameras, topo.n_slots, b_kp.shape[3]
    K = b_kp.shape[2]
    e1 = jnp.asarray(topo.e1, jnp.int32)
    e2 = jnp.asarray(topo.e2, jnp.int32)

    def sample_person(p_key, seg):
        a0, a1 = seg                 # a1 > a0: build_scene_bank rejects
        idx = jax.random.randint(p_key, (), a0, a1)   # empty segments
        return aug_frame[idx], aug_mask[idx]

    def branch_fn(n_people):
        files = top_sets[n_people - 1]

        def fn(p_keys):
            frames, masks = [], []
            for p in range(P):
                if p < n_people:
                    f, m = sample_person(p_keys[p],
                                         file_segments[files[p]])
                else:
                    f, m = jnp.int32(0), jnp.zeros((C,), jnp.float32)
                frames.append(f)
                masks.append(m)
            alive = (jnp.arange(P) < n_people)
            return (jnp.stack(frames), jnp.stack(masks),
                    alive.astype(jnp.float32))
        return fn

    branches = [branch_fn(n) for n in range(1, n_files + 1)]

    def one_scene(s_key):
        k_np, k_p = jax.random.split(s_key)
        num_people = jax.random.randint(k_np, (), 1, n_files + 1)
        p_keys = jax.random.split(k_p, P)
        frames, masks, alive = jax.lax.switch(num_people - 1, branches,
                                              p_keys)
        # per-person per-camera skeleton counts under the subset mask
        cnt = (jnp.take(b_nsk, frames, axis=0).astype(jnp.float32)
               * masks * alive[:, None])                     # [P, C]
        off = jnp.cumsum(cnt, axis=0) - cnt                  # exclusive
        total = jnp.sum(cnt, axis=0)                         # [C]
        overflow = jnp.any(total > S)

        # slot ownership: person p owns slots [off, off+cnt) per camera
        s_iota = jnp.arange(S, dtype=jnp.float32)            # [S]
        owns = ((s_iota[None, None, :] >= off[:, :, None])
                & (s_iota[None, None, :] < (off + cnt)[:, :, None])
                )                                            # [P, C, S]
        ownf = owns.astype(jnp.float32)
        present = jnp.any(owns, axis=0)                      # [C, S]
        # within-person skeleton index per slot
        kidx = jnp.sum(ownf * (s_iota[None, None, :] - off[:, :, None]),
                       axis=0)                               # [C, S]
        pidx = jnp.sum(ownf * jnp.arange(P, dtype=jnp.float32)[:, None,
                                                              None],
                       axis=0)                               # [C, S]

        # real-head marking: slot is real iff its k == real_k[f_p, c]
        realk = jnp.take(b_realk, frames, axis=0).astype(jnp.float32)
        realk_cs = jnp.sum(ownf * realk[:, :, None], axis=0)  # [C, S]
        is_real = present & (kidx == realk_cs)
        person_id = jnp.where(is_real, pidx, -1.0)
        person_id = jnp.where(present, person_id, -1.0)      # [C, S]

        # field gather: one-hot over (p, k) per (c, s) slot, contracted
        # by broadcast multiply-sum (small-contraction rule — P*K is far
        # below the 128-lane MXU tile; see CLAUDE.md)
        k_iota = jnp.arange(K, dtype=jnp.float32)
        sel = (ownf[:, :, :, None]                           # [P, C, S, 1]
               * (kidx[None, :, :, None] == k_iota[None, None, None, :])
               .astype(jnp.float32))                         # [P, C, S, K]

        def gather(field):                                   # [F,C,K,...]
            per = jnp.take(field, frames, axis=0)            # [P,C,K,...]
            extra = field.ndim - 3
            s_ = sel.transpose(1, 2, 0, 3).reshape(
                (C, S, P * K) + (1,) * extra)
            p_ = per.transpose(1, 0, 2, *range(3, field.ndim)).reshape(
                (C, 1, P * K) + field.shape[3:])
            return jnp.sum(s_ * p_, axis=2)                  # [C, S, ...]

        kp = gather(b_kp)
        valid = gather(b_valid)
        prob = gather(b_prob)
        obs = gather(b_obs) > 0.5

        pid_flat = person_id.reshape(-1)
        pres_flat = present.reshape(-1)
        p1, p2 = pid_flat[e1], pid_flat[e2]
        m = (pres_flat[e1] & pres_flat[e2]).astype(jnp.float32)
        labels = ((p1 >= 0) & (p1 == p2)).astype(jnp.float32) * m
        one_spur = ((p1 >= 0) & (p2 < 0)) | ((p1 < 0) & (p2 >= 0))
        weight = jnp.where(one_spur, 1.0, 2.0) * m
        # reference-skipped scenes -> null (overflow / nothing live)
        null = overflow | (jnp.sum(weight) == 0)
        nullf = 1.0 - null.astype(jnp.float32)
        weight = weight * nullf
        labels = labels * nullf     # overflowed layouts are garbage —
        # no label may survive outside a weighted pair
        return kp, valid, prob, obs, present, labels, weight

    keys = jax.random.split(key, n_scenes)
    return jax.vmap(one_scene)(keys)
