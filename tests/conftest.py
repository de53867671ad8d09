"""Test harness configuration.

Forces JAX onto the CPU backend with 8 virtual devices so multi-chip sharding
(pjit over a Mesh) is exercised without TPU hardware, per SURVEY.md §4.
Must run before jax initialises a backend, hence the env mutation at import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persistent compilation cache: CPU compiles of the geometry/model programs
# dominate test wall-clock otherwise.
import jax  # noqa: E402

# The environment's sitecustomize registers the axon TPU backend and forces
# jax_platforms past the env var — force it back so tests run on the 8
# virtual CPU devices (backends initialise lazily, so this sticks as long as
# no jax computation ran yet).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/mpe3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
assert jax.default_backend() == "cpu"
assert len(jax.devices()) >= 8, "expected 8 virtual CPU devices"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(58008)


@pytest.fixture(scope="session")
def panoptic_rig():
    """CameraRig built from the reference tm_panoptic.pickle fixture if
    available, else a synthetic 5-camera ring."""
    from mpe3d_tpu.config import PANOPTIC
    from mpe3d_tpu.geometry.calib_io import rig_from_files

    ref_tm = "/root/reference/tm_panoptic.pickle"
    if os.path.exists(ref_tm):
        return rig_from_files(PANOPTIC, ref_tm)
    from mpe3d_tpu.data.synthetic import synthetic_ring_rig

    return synthetic_ring_rig(PANOPTIC)
