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

import pytest

REPO = Path(__file__).resolve().parents[1]


def _run_dryrun(n: int):
    env = dict(os.environ)
    # undo the conftest's process-level CPU forcing: the driver runs with
    # whatever sitecustomize sets up plus the host-device-count flag
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n}"
    r = subprocess.run(
        [sys.executable, "-c",
         f"import __graft_entry__ as g; g.dryrun_multichip({n})"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, (
        f"dryrun({n}) failed in driver-like env:\n"
        f"stdout: {r.stdout[-1500:]}\nstderr: {r.stderr[-3000:]}")
    assert f"dryrun_multichip({n})" in r.stdout
    return r.stdout


def test_dryrun_multichip_in_driver_env():
    _run_dryrun(8)


# Width sweep (VERDICT r3 #8): the loud-skip branches must stay exercised —
# n=2 takes the <3-devices PP-skip path, n=3 is the exact 3-stage fit, and
# n=6 has no (data, model) factorization for mnist_nn (batch 64: 6/3 and
# 6/2 both leave a non-dividing data axis) so the DPxTP sections skip.
@pytest.mark.parametrize("n", [2, 3, 6])
def test_dryrun_multichip_width_sweep(n):
    out = _run_dryrun(n)
    if n == 2:
        assert "skipping the 3-stage hetero U-Net pipeline section" in out
    else:
        assert "PP U-Net train step loss=" in out
    if n == 6:
        assert "no (data, model) factorization fits mnist_nn" in out
        # a skipped check must not read like a passing one (ADVICE r3)
        assert "ce=skipped" in out and "DPxTP loss=skipped" in out
