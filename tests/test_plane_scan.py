"""Pallas plane-scan kernel vs lax reference (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp
import pytest

from tpu_bvh.ops.pallas import plane_scan as ps


@pytest.mark.parametrize("is_min", [True, False])
@pytest.mark.parametrize("reverse", [True, False])
@pytest.mark.parametrize("m", [512, 1024, 1000, 1537])
def test_kernel_matches_lax(is_min, reverse, m):
    rng = np.random.default_rng(m + is_min * 10 + reverse)
    x = jnp.asarray(rng.integers(-(2**30), 2**30, size=(m, 64), dtype=np.int32))
    got = ps.plane_scan(x, is_min=is_min, reverse=reverse, interpret=True)
    want = ps.plane_scan_reference(x, is_min=is_min, reverse=reverse)
    assert np.array_equal(np.asarray(got), np.asarray(want))
