"""Reproduce the *driver's* environment for ``dryrun_multichip``.

Round 1's recorded multi-chip check failed (MULTICHIP_r01.json, rc=1): the
dryrun eagerly dispatched to the default TPU backend before pinning work to
the CPU mesh, and the live TPU tunnel raised a libtpu version mismatch. The
in-repo test passed only because tests/conftest.py forces the CPU platform
for the whole process — which the driver does not.

This test runs the dryrun in a **fresh subprocess without the conftest's
forcing** (sitecustomize TPU plugin active, JAX_PLATFORMS unset), exactly as
the driver invokes it, and asserts it succeeds without ever initializing a
TPU client.
"""

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_dryrun_multichip_in_driver_env():
    env = dict(os.environ)
    # undo the conftest's process-level CPU forcing: the driver runs with
    # whatever sitecustomize sets up plus the host-device-count flag
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    r = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, (
        f"dryrun failed in driver-like env:\nstdout: {r.stdout[-1500:]}\n"
        f"stderr: {r.stderr[-3000:]}")
    assert "dryrun_multichip(8)" in r.stdout
