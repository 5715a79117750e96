"""BVH2->BVH4 collapse: device frontier-BFS vs the sequential CPU oracle
(`Utility.cpp:540-611` semantics), plus structural checks and SAH costs."""
import numpy as np
import pytest

from tests.conftest import random_tris
from tpu_bvh.models import lbvh
from tpu_bvh.ops import collapse
from tpu_bvh.ops.aabb import triangle_aabbs
from tpu_bvh.utils import cpu_reference, validate
from tpu_bvh.utils.cost import sah_cost_bvh2, sah_cost_bvh4


@pytest.mark.parametrize("n", [2, 3, 4, 9, 33, 500])
def test_collapse_matches_cpu_oracle(rng, n):
    tris = random_tris(rng, n)
    bvh = lbvh.build_two_pass(tris)
    got = collapse.collapse_bvh2_to_bvh4(bvh)
    want = cpu_reference.collapse_cpu(bvh)
    assert int(got.n_nodes) == want["n_nodes"]
    k = want["n_nodes"]
    assert np.array_equal(np.asarray(got.child)[:k], want["child"][:k])
    assert np.array_equal(np.asarray(got.parent)[:k], want["parent"][:k])
    assert np.array_equal(np.asarray(got.child_count)[:k], want["child_count"][:k])
    assert np.array_equal(np.asarray(got.leaf_prim), want["leaf_prim"])
    assert np.array_equal(np.asarray(got.leaf_parent), want["leaf_parent"])
    # AABBs of used slots
    slots = want["child"][:k] >= 0
    assert np.allclose(np.asarray(got.child_min)[:k][slots], want["child_min"][:k][slots])
    assert np.allclose(np.asarray(got.child_max)[:k][slots], want["child_max"][:k][slots])


@pytest.mark.parametrize("n", [2, 64, 1000])
def test_collapse_visits_all_prims(rng, n):
    tris = random_tris(rng, n)
    bvh = lbvh.build_two_pass(tris)
    wide = collapse.collapse_bvh2_to_bvh4(bvh)
    assert validate.check_bvh4_correctness(wide, n)


def test_collapse_reduces_cost(cornellbox_tris):
    """Collapsing roughly halves SAH cost (`README.md:19`: bunny ~46->~22)."""
    bvh = lbvh.build_two_pass(cornellbox_tris)
    wide = collapse.collapse_bvh2_to_bvh4(bvh)
    mn, mx = triangle_aabbs(cornellbox_tris)
    c2 = float(sah_cost_bvh2(bvh))
    c4 = float(sah_cost_bvh4(wide, mn, mx))
    assert c4 < 0.7 * c2


@pytest.mark.parametrize("n", [3, 33, 500])
@pytest.mark.slow
def test_analytic_collapse_matches_oracle(rng, n):
    """The closed-form (queue-free) derivation reproduces the oracle
    byte-for-byte — it is the executable spec the blocked kernel targets."""
    from tpu_bvh.ops.collapse_analytic import collapse_bvh2_to_bvh4_analytic

    tris = random_tris(rng, n)
    for bvh in (lbvh.build_two_pass(tris), lbvh.build_single_pass(tris)):
        got = collapse_bvh2_to_bvh4_analytic(bvh)
        want = cpu_reference.collapse_cpu(bvh)
        k = want["n_nodes"]
        assert int(got.n_nodes) == k
        assert np.array_equal(np.asarray(got.child)[:k], want["child"][:k])
        assert np.array_equal(np.asarray(got.parent)[:k], want["parent"][:k])
        assert np.array_equal(np.asarray(got.leaf_prim), want["leaf_prim"])
        assert np.array_equal(
            np.asarray(got.leaf_parent), want["leaf_parent"]
        )


def test_collapse_single_pass_builder(rng):
    """Collapse works off the Apetrei layout too (root != 0), like the
    reference reuses one collapse kernel across builders
    (`SinglePassLbvh.cpp:158-170`)."""
    tris = random_tris(rng, 200)
    bvh = lbvh.build_single_pass(tris)
    wide = collapse.collapse_bvh2_to_bvh4(bvh)
    assert validate.check_bvh4_correctness(wide, 200)
    want = cpu_reference.collapse_cpu(bvh)
    assert int(wide.n_nodes) == want["n_nodes"]
    assert np.array_equal(np.asarray(wide.leaf_prim), want["leaf_prim"])
