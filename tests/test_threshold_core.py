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


@pytest.mark.slow
def test_child_positions_reference_matches_topology():
    """Child scans reproduce the sort-based child links exactly."""
    import numpy as np
    from tpu_bvh.ops import radix_tree
    from tpu_bvh.ops.pallas.threshold_core import child_positions_reference

    rng = np.random.default_rng(0)
    for n in (17, 250, 1777):
        codes = jnp.asarray(
            np.sort(rng.integers(0, 2**30, n).astype(np.uint32))
        )
        left, right, _p, _f, _l, _r = radix_tree.apetrei_topology_fast(codes)
        m = n - 1
        dlt_raw = radix_tree.adjacent_deltas(codes)
        dlt = jnp.where(dlt_raw <= 31, dlt_raw - 2, dlt_raw - 11)
        lc, rc = child_positions_reference(dlt)
        idx = np.arange(m)
        got_l = np.where(np.asarray(lc) >= 0, np.asarray(lc), m + idx)
        got_r = np.where(np.asarray(rc) >= 0, np.asarray(rc), m + idx + 1)
        np.testing.assert_array_equal(got_l, np.asarray(left[:m]))
        np.testing.assert_array_equal(got_r, np.asarray(right[:m]))


@pytest.mark.slow
def test_child_kernels_match_reference():
    import numpy as np
    from tpu_bvh.ops.pallas import threshold_core as tc

    rng = np.random.default_rng(7)
    for m in (700, 2048, 3333):
        dlt = jnp.asarray(rng.integers(0, 53, m).astype(np.int32))
        l_ref, r_ref = tc.child_positions_reference(dlt)
        lpk = tc._run_child(tc._child_kernel_lanes_fwd, dlt, False, True, 512)
        rpk = tc._run_child(tc._child_kernel_lanes_rev, dlt, True, True, 512)
        mask = (1 << tc._POSB) - 1
        l2 = jnp.where(lpk == tc._BIG, -1, lpk & mask)
        r2 = jnp.where(rpk == tc._BIG, -1, rpk & mask)
        np.testing.assert_array_equal(np.asarray(l_ref), np.asarray(l2))
        np.testing.assert_array_equal(np.asarray(r_ref), np.asarray(r2))
