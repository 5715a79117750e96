"""scan32 fused V=32 kernels vs the stack oracle and the production core.

Covers ties (duplicate Morton codes) heavily: the V=32 design collapses all
tie deltas onto one lane and resolves tie-vs-tie queries with closed-form
index arithmetic, which these tests pin against a sequential stack oracle
and against the shipped `_threshold_core` / `child_positions_reference`.
"""
from __future__ import annotations

import numpy as np
import pytest
import jax.numpy as jnp

from tpu_bvh.ops import radix_tree
from tpu_bvh.ops.pallas import scan32
from tpu_bvh.ops.pallas.threshold_core import child_positions_reference


def _codes(kind: str, n: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    if kind == "random":
        c = rng.integers(0, 1 << 30, size=n, dtype=np.uint32)
    elif kind == "dups":
        # heavy duplicate runs — every tie path exercised
        c = rng.integers(0, 64, size=n, dtype=np.uint32) * 1024
    elif kind == "all_equal":
        c = np.full(n, 12345, np.uint32)
    elif kind == "sorted_line":
        c = (np.arange(n, dtype=np.uint32)) * 7
    else:
        raise ValueError(kind)
    return np.sort(c)


def _run_both(codes_np):
    codes = jnp.asarray(codes_np)
    dlt_raw = np.asarray(radix_tree.adjacent_deltas(codes))
    got = scan32.scan_core(jnp.asarray(dlt_raw), interpret=True)
    want = scan32.scan_core_reference(dlt_raw)
    return [np.asarray(g) for g in got], list(want), dlt_raw


NAMES = ["psv_pos", "psv_val", "lc", "nsv_pos", "nsv_val", "rc"]


@pytest.mark.parametrize("kind", ["random", "dups", "all_equal", "sorted_line"])
@pytest.mark.parametrize("n", [97, 4096, 4097, 9000])
def test_scan32_matches_stack_oracle(kind, n):
    got, want, _ = _run_both(_codes(kind, n))
    for g, w, name in zip(got, want, NAMES):
        bad = np.nonzero(g != w)[0]
        assert bad.size == 0, (
            f"{name} mismatch at {bad[:5]}: got {g[bad[:5]]} want {w[bad[:5]]}"
        )


@pytest.mark.parametrize("kind", ["random", "dups", "all_equal"])
@pytest.mark.slow
def test_scan32_matches_production_core(kind):
    codes_np = _codes(kind, 3001, seed=3)
    codes = jnp.asarray(codes_np)
    dlt_raw = radix_tree.adjacent_deltas(codes)
    psv_pos, psv_val, lc, nsv_pos, nsv_val, rc = [
        np.asarray(x) for x in scan32.scan_core(dlt_raw, interpret=True)
    ]
    dlt, first, last, psv_val0, nsv_val0, psv0 = [
        np.asarray(x) for x in radix_tree._threshold_core(codes)
    ]
    np.testing.assert_array_equal(psv_pos, psv0)
    np.testing.assert_array_equal(psv_pos + 1, first)
    np.testing.assert_array_equal(nsv_pos, last)
    np.testing.assert_array_equal(psv_val, psv_val0)
    np.testing.assert_array_equal(nsv_val, nsv_val0)
    lc0, rc0 = [np.asarray(x) for x in child_positions_reference(jnp.asarray(dlt))]
    np.testing.assert_array_equal(lc, lc0)
    np.testing.assert_array_equal(rc, rc0)


def test_oracle_against_production_core():
    """The stack oracle itself agrees with the shipped vectorized core."""
    codes_np = _codes("dups", 2000, seed=7)
    codes = jnp.asarray(codes_np)
    dlt_raw = np.asarray(radix_tree.adjacent_deltas(codes))
    psv_pos, psv_val, lc, nsv_pos, nsv_val, rc = scan32.scan_core_reference(dlt_raw)
    dlt, first, last, psv_val0, nsv_val0, psv0 = [
        np.asarray(x) for x in radix_tree._threshold_core(codes)
    ]
    np.testing.assert_array_equal(psv_pos, psv0)
    np.testing.assert_array_equal(nsv_pos, last)
    np.testing.assert_array_equal(psv_val, psv_val0)
    np.testing.assert_array_equal(nsv_val, nsv_val0)
