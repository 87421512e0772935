"""Tests for profiling utils and multihost helpers (single-process)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from approximatenn_tpu.parallel import multihost
from approximatenn_tpu.parallel.sharded import make_mesh
from approximatenn_tpu.utils.profiling import StageTimes, fence, trace


def test_stage_times_accumulate():
    st = StageTimes()
    with st.stage("a") as sink:
        sink.append(jnp.ones((4, 4)) * 2)
    with st.stage("a"):
        pass
    assert st.counts["a"] == 2 and st.totals["a"] > 0
    assert "a" in st.report()


def test_fence_handles_non_arrays():
    fence({"x": 1, "y": None})
    fence(jnp.arange(5))


@pytest.mark.slow
def test_trace_noops_gracefully(tmp_path):
    with trace(str(tmp_path)) as d:
        jnp.ones(3).sum()
    assert d == str(tmp_path)


def test_global_mesh_and_slices():
    multihost.initialize()  # no-op single process
    mesh = multihost.global_mesh()
    n_dev = len(jax.devices())
    lo, hi = multihost.host_shard_slice(8 * n_dev, mesh)
    assert (lo, hi) == (0, 8 * n_dev)  # single host owns everything


def test_process_local_array_roundtrip(rng):
    mesh = make_mesh()
    n_dev = len(list(mesh.devices.flat))
    data = rng.standard_normal((4 * n_dev, 3)).astype(np.float32)
    arr = multihost.process_local_array(data.shape, mesh, data)
    np.testing.assert_array_equal(np.asarray(arr), data)


def test_device_init_and_cleanup_registry():
    from approximatenn_tpu.utils import runtime

    dev = runtime.device_init()
    assert dev is not None
    order = []
    runtime.register_cleanup(lambda: order.append("a"))
    runtime.register_cleanup(lambda: order.append("b"))
    runtime.register_cleanup(lambda: 1 / 0)  # exceptions suppressed
    runtime.cleanup()
    assert order == ["b", "a"]  # LIFO
    info = runtime.device_summary()
    assert info["device_count"] >= 1


def test_device_init_float64_requires_x64():
    import pytest
    from approximatenn_tpu.utils import runtime

    with pytest.raises(RuntimeError, match="x64"):
        runtime.device_init(require_dtype="float64")
