"""Data: wire-format parsing, synthetic scenes."""

from mpe3d_tpu.data.frames import (FrameArrays, load_eval_frames,  # noqa: F401
                                   load_frames, merge_frame_files,
                                   parse_frame, parse_frame_gt,
                                   parse_frames_batch, parse_frames_file)
from mpe3d_tpu.data.synthetic import (SceneNoise, generate_frames,  # noqa: F401
                                      generate_single_person_frames,
                                      synthetic_ring_rig, write_frames)
