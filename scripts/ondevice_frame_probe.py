"""One fresh-session probe of the bench's on-device frame time.

Run by bench.py::_session_probes in a SUBPROCESS (its own relay session)
so the headline `ondevice_frame_us` can be the median over k sessions —
the relay's effective stream rate varies ±25 % across sessions (RESULTS
"session spread", round-3 VERDICT #5).  Builds EXACTLY the bench's
pipeline (bench.build_bench_pipe) and prints one JSON line:
{"ondevice_frame_us": N}.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/mpe3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import bench
    from mpe3d_tpu.data.frames import parse_frame
    from mpe3d_tpu.data.synthetic import SceneNoise, generate_frames

    pipe, rig_config, rig, mcfg, lcfg = bench.build_bench_pipe()
    noise = SceneNoise(pixel_sigma=1.5, joint_dropout=0.05,
                       spurious_rate=0.1, camera_dropout=0.05)
    wire = generate_frames(rig_config, rig, 2, n_people=(2, 3),
                           seed=11, noise=noise, with_gt=False)
    frames = [parse_frame(f, rig_config, max_skeletons=4) for f in wire]
    smoke = jax.default_backend() != "tpu"
    us, _ = bench.measure_ondevice_frame_us(pipe, frames, smoke)
    # the backend travels with the number: if the relay dropped and jax
    # fell back to CPU, the parent must NOT median a CPU measurement
    # into the "on-device" headline (round-4 review finding)
    print(json.dumps({"ondevice_frame_us": round(float(us), 1),
                      "backend": jax.default_backend()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
