"""Fused Pallas threshold-core kernels vs the lax oracle (interpret mode)."""
import numpy as np
import jax.numpy as jnp
import pytest

from tpu_bvh.ops.pallas import threshold_core as tc


@pytest.mark.parametrize("m", [512, 513, 1024, 2000])
@pytest.mark.parametrize("seed", [0, 1])
def test_fused_matches_reference(m, seed):
    rng = np.random.default_rng(seed * 1000 + m)
    dlt = jnp.asarray(rng.integers(0, 53, size=m, dtype=np.int32))
    p1, n1 = tc.psv_nsv_packed(dlt, interpret=True)
    p2, n2 = tc.psv_nsv_packed_reference(dlt)
    assert np.array_equal(np.asarray(p1), np.asarray(p2))
    assert np.array_equal(np.asarray(n1), np.asarray(n2))


def test_all_equal_deltas():
    dlt = jnp.zeros(700, jnp.int32)
    p1, n1 = tc.psv_nsv_packed(dlt, interpret=True)
    p2, n2 = tc.psv_nsv_packed_reference(dlt)
    assert np.array_equal(np.asarray(p1), np.asarray(p2))
    assert np.array_equal(np.asarray(n1), np.asarray(n2))


@pytest.mark.parametrize("m", [1024, 2000])
def test_lane_major_matches_reference(m):
    rng = np.random.default_rng(m)
    dlt = jnp.asarray(rng.integers(0, 53, size=m, dtype=np.int32))
    p1, n1 = tc.psv_nsv_packed_lanes(dlt, interpret=True)
    p2, n2 = tc.psv_nsv_packed_reference(dlt)
    assert np.array_equal(np.asarray(p1), np.asarray(p2))
    assert np.array_equal(np.asarray(n1), np.asarray(n2))
