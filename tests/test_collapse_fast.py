"""Fast (blocked) collapse vs the sequential CPU oracle.

The fast path numbers wide nodes sparsely (wide node keeps its bvh2 id);
the oracle (`Utility.cpp:540-611` behavior) numbers them in BFS queue
order. The oracle's `b2_node` array is the explicit isomorphism: every
array must match byte-for-byte under that relabeling.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_bvh.models import lbvh
from tpu_bvh.ops.collapse_fast import collapse_lbvh_to_bvh4
from tpu_bvh.utils.cpu_reference import collapse_cpu
from tpu_bvh.utils import scenes
from tpu_bvh.utils.cost import sah_cost_bvh4
from tpu_bvh.utils.validate import check_bvh4_correctness
from tpu_bvh.ops.aabb import triangle_aabbs

from conftest import random_tris


def _assert_isomorphic(fast, oracle, n_prims):
    b2 = oracle["b2_node"]
    k = oracle["n_nodes"]
    used = b2[:k]
    f_child = np.asarray(fast.child)
    f_count = np.asarray(fast.child_count)
    f_parent = np.asarray(fast.parent)
    f_cmin = np.asarray(fast.child_min)
    f_cmax = np.asarray(fast.child_max)
    cap = fast.n_internal_cap

    assert int(fast.n_nodes) == k
    assert int((f_count > 0).sum()) == k
    assert int(np.asarray(fast.root)) == b2[0]

    # child_count and slots
    np.testing.assert_array_equal(f_count[used], oracle["child_count"][:k])
    o_child = oracle["child"][:k]
    # remap oracle internal children (wide idx) to bvh2 ids; leaves match
    remapped = np.where(
        (o_child >= 0) & (o_child < cap), b2[np.clip(o_child, 0, len(b2) - 1)],
        o_child,
    )
    np.testing.assert_array_equal(f_child[used], remapped)

    o_parent = oracle["parent"][:k]
    p_remap = np.where(o_parent >= 0, b2[np.clip(o_parent, 0, len(b2) - 1)], -1)
    np.testing.assert_array_equal(f_parent[used], p_remap)

    # slot AABBs byte-for-byte on used slots
    slot_used = np.arange(4)[None, :] < oracle["child_count"][:k][:, None]
    np.testing.assert_array_equal(
        f_cmin[used][slot_used], oracle["child_min"][:k][slot_used]
    )
    np.testing.assert_array_equal(
        f_cmax[used][slot_used], oracle["child_max"][:k][slot_used]
    )

    np.testing.assert_array_equal(
        np.asarray(fast.leaf_prim), oracle["leaf_prim"]
    )
    lp = oracle["leaf_parent"]
    lp_remap = np.where(lp >= 0, b2[np.clip(lp, 0, len(b2) - 1)], -1)
    np.testing.assert_array_equal(np.asarray(fast.leaf_parent), lp_remap)

    assert check_bvh4_correctness(fast, n_prims)


def _run(tris_np):
    tris = jnp.asarray(tris_np, jnp.float32)
    bvh, parent, first, last = lbvh.build_single_pass_aux(tris)
    fast = jax.block_until_ready(
        collapse_lbvh_to_bvh4(bvh, parent, first, last, interpret=True)
    )
    oracle = collapse_cpu(bvh)
    _assert_isomorphic(fast, oracle, tris_np.shape[0])
    return bvh, fast


def test_cornellbox(cornellbox_tris):
    _run(np.asarray(cornellbox_tris, np.float32))


def test_random_small(rng):
    _run(random_tris(rng, 513))


def test_random_multiblock(rng):
    # > one kernel block (blk floors at 512) with varied scales
    _run(random_tris(rng, 3000, spread=30.0))


@pytest.mark.slow
def test_bunny_like_sah(rng):
    tris_np = scenes.bunny_like(20_000)
    bvh, fast = _run(tris_np)
    pmn, pmx = triangle_aabbs(jnp.asarray(tris_np))
    c4 = float(sah_cost_bvh4(fast, pmn, pmx))
    # collapse improves SAH ~2x (README.md:19 claims ~2.2 at full scale)
    from tpu_bvh.utils.cost import sah_cost_bvh2

    c2 = float(sah_cost_bvh2(bvh))
    assert c4 < 0.7 * c2


def test_duplicate_codes(rng):
    # coplanar stacks of identical triangles -> massive Morton-code ties
    base = random_tris(rng, 64)
    tris = np.repeat(base, 16, axis=0)
    _run(tris)


def _caterpillar_tris(n_cluster=330, n_chain=26):
    """Chain-shaped crown: a tight cluster (balanced subtree, short ranges)
    plus geometrically-spaced outliers along x. Every chain ancestor's
    range contains the whole cluster -> range length > S_LEN -> long, and
    the long count exceeds the bushy-tree capacity 2n/(S_LEN+1)+2 (the
    ADVICE r3 repro: the old static ccap silently produced a wrong BVH4)."""
    tris = []
    for i in range(n_cluster):
        x = 1e-4 * (i / n_cluster)
        tris.append([[x, 0, 0], [x + 1e-6, 1e-6, 0], [x, 0, 1e-6]])
    for i in range(n_chain):
        x = 2.0 ** (i - n_chain)  # 2^-26 ... 0.5: one new top bit each
        tris.append([[x, 0, 0], [x + 1e-6, 1e-6, 0], [x, 0, 1e-6]])
    return np.asarray(tris, np.float32)


def test_chain_crown_overflow():
    """Regression (ADVICE r3, high): caterpillar crowns overflow the static
    coarse capacity; the lax.cond fallback must keep the tree exact."""
    from tpu_bvh.ops.pallas.collapse_block import S_LEN

    tris = _caterpillar_tris()
    n = tris.shape[0]
    bvh, parent, first, last = lbvh.build_single_pass_aux(
        jnp.asarray(tris)
    )
    n_long = int(np.sum(np.asarray(last - first + 1) > S_LEN))
    ccap = 2 * n // (S_LEN + 1) + 2
    assert n_long > ccap, (
        f"fixture no longer overflows the crown capacity "
        f"(n_long={n_long}, ccap={ccap}) — deepen the chain"
    )
    _run(tris)


def test_random_multiblock_small_blk(rng, monkeypatch):
    """Force blk=512 so the block-halo stitching paths run in the default
    suite (ADVICE r3: at the production blk, 3000 tris is grid=1)."""
    from tpu_bvh.ops.pallas import collapse_block

    monkeypatch.setattr(collapse_block, "_BLK", 512)
    collapse_lbvh_to_bvh4.clear_cache()  # _BLK is read at trace time
    try:
        _run(random_tris(rng, 3000, spread=30.0))
    finally:
        collapse_lbvh_to_bvh4.clear_cache()
