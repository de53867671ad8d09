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


# ---------------------------------------------------------------------------
# Per-test hard timeout (round-2 VERDICT weak #1: one wedged orbax save hung
# a whole session for 85 min; the suite had no global timeout).  pytest-timeout
# is not in the image, so this implements its "signal" method: SIGALRM on the
# main thread fails the test loudly with a traceback instead of hanging.  A
# faulthandler backstop additionally dumps ALL thread stacks shortly before
# the alarm so a hang in non-Python code is still diagnosable.
# Override per test with @pytest.mark.mpe3d_timeout(seconds), globally with
# MPE3D_TEST_TIMEOUT_S (0 disables — e.g. when debugging under pdb).
# ---------------------------------------------------------------------------

import faulthandler  # noqa: E402
import signal  # noqa: E402
import threading  # noqa: E402

# 900 s default: generous enough for session-fixture setup + cold-cache
# jit compiles after an environment reset (the repo has had three wipes of
# /tmp/mpe3d_jax_cache), while still bounding any hang to 15 min/test
_DEFAULT_TEST_TIMEOUT_S = float(os.environ.get("MPE3D_TEST_TIMEOUT_S", "900"))


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "mpe3d_timeout(seconds): override the per-test hard timeout")


@pytest.hookimpl(wrapper=True)
def pytest_runtest_protocol(item, nextitem):
    timeout = _DEFAULT_TEST_TIMEOUT_S
    m = item.get_closest_marker("mpe3d_timeout")
    if m is not None:
        timeout = float(m.args[0])
    if timeout <= 0 or threading.current_thread() is not threading.main_thread():
        return (yield)

    def on_alarm(signum, frame):
        raise TimeoutError(
            f"test exceeded the {timeout:.0f}s hard timeout "
            f"(MPE3D_TEST_TIMEOUT_S / @pytest.mark.mpe3d_timeout)")

    # dump every thread's stack shortly before the alarm: if the hang is
    # inside non-Python code the SIGALRM may only fire at the next
    # bytecode, and the dump is the diagnostic either way.  For short
    # per-test overrides dump at 80% so passing tests never spew stacks
    faulthandler.dump_traceback_later(max(timeout - 30.0, timeout * 0.8))
    prev = signal.signal(signal.SIGALRM, on_alarm)
    signal.setitimer(signal.ITIMER_REAL, timeout)
    try:
        return (yield)
    finally:
        signal.setitimer(signal.ITIMER_REAL, 0)
        signal.signal(signal.SIGALRM, prev)
        faulthandler.cancel_dump_traceback_later()


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
