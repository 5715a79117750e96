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


def test_payload_scan_matches_oracle():
    """Payload-carrying PSV/NSV kernels (interpret) vs the gather oracle."""
    import jax.numpy as jnp
    from tpu_bvh.ops.pallas import threshold_core as tc

    rng = np.random.default_rng(42)
    m = 5000
    dlt = jnp.asarray(rng.integers(0, 53, m), jnp.int32)
    pay = jnp.asarray(rng.integers(0, 2**22, m), jnp.int32)

    psv_o, pp_o, nsv_o, np_o = tc.psv_nsv_payload_reference(dlt, pay)
    psv_k, pp_k = tc._run_lanes_pay(
        tc._psv_kernel_lanes_pay, dlt, pay, False, 63, True, 1024
    )
    nsv_k, np_k = tc._run_lanes_pay(
        tc._nsv_kernel_lanes_pay, dlt, pay, True, 63, True, 1024
    )
    np.testing.assert_array_equal(np.asarray(psv_k), np.asarray(psv_o))
    np.testing.assert_array_equal(np.asarray(nsv_k), np.asarray(nsv_o))
    np.testing.assert_array_equal(np.asarray(pp_k), np.asarray(pp_o))
    np.testing.assert_array_equal(np.asarray(np_k), np.asarray(np_o))
