"""Test configuration: run the whole suite on a virtual 8-device CPU mesh.

Multi-chip logic is validated without TPU hardware via
``--xla_force_host_platform_device_count`` (SURVEY.md §4); the driver's
``dryrun_multichip`` does the same.  The environment's sitecustomize imports
jax (and pins the TPU platform) before any conftest code runs, so the
override must go through ``jax.config`` rather than env vars.
"""

import os

import jax

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """The real-TPU smoke gate is OPT-IN: it needs the hardware and must
    be the only TPU process (CLAUDE.md rule 2), so the default (CPU-mesh)
    run skips it.  Select it explicitly with ``-m tpu``."""
    if "tpu" in (config.getoption("-m") or ""):
        return
    skip = pytest.mark.skip(reason="real-TPU gate: opt in with -m tpu")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip)


@pytest.fixture()
def rng():
    # fresh, fixed-seed generator per test: results don't depend on
    # which other tests ran first
    return np.random.default_rng(12345)
