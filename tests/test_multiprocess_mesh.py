"""Opt-in two-process jax.distributed harness (round-3 VERDICT #7).

Spawns real OS processes joined via a localhost coordinator — the
multi-HOST analog the in-process virtual mesh cannot exercise (process
coordination, cross-process grad psum, per-process sharded orbax I/O).
Opt-in because it forks two fresh jax runtimes (~1-2 min, and some CI
sandboxes forbid the coordination-service sockets):

    MPE3D_MULTIPROC=1 python -m pytest tests/test_multiprocess_mesh.py
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("MPE3D_MULTIPROC") != "1",
    reason="opt-in (set MPE3D_MULTIPROC=1): spawns two jax.distributed "
           "processes — see scripts/multiprocess_mesh.py")


def test_two_process_mesh_dp_step_and_sharded_checkpoint(tmp_path):
    script = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "multiprocess_mesh.py")
    out = subprocess.run([sys.executable, script, "--dir", str(tmp_path)],
                         capture_output=True, text=True, timeout=580)
    sys.stdout.write(out.stdout)
    sys.stderr.write(out.stderr)
    assert out.returncode == 0
    assert "[multiproc] OK" in out.stdout
