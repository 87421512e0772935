"""Opt-in real-TPU smoke gate (round-4 VERDICT item 5): compiles every
production kernel path on hardware near its Mosaic envelope and enforces
the recorded parity band.  The CPU suite's interpret-mode kernels cannot
see Mosaic compile failures (CLAUDE.md rule 14) — this can.

Deselected by default (the suite runs on the virtual CPU mesh); opt in
with ``pytest -m tpu tests/`` on the TPU host, as the only TPU process
(CLAUDE.md rule 2).  The gate runs in a subprocess because this process's
conftest already pinned the CPU platform."""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.tpu


def test_tpu_smoke_gate():
    env = dict(os.environ)
    # the subprocess must attach to the real device: drop any CPU pins
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f
    )
    proc = subprocess.run(
        [sys.executable, "-m", "approximatenn_tpu.harness.tpu_smoke"],
        env=env, capture_output=True, text=True, timeout=1200,
    )
    sys.stdout.write(proc.stdout)
    sys.stderr.write(proc.stderr[-2000:])
    if proc.returncode == 3:
        pytest.skip("no TPU attached")
    assert proc.returncode == 0, "TPU smoke gate failed — see gate lines"
