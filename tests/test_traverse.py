"""Traversal: all four variants vs the sequential CPU oracle
(`Utility.cpp:161-237` semantics), hit/miss correctness, heat-map counts."""
import numpy as np
import jax.numpy as jnp
import pytest

from tests.conftest import random_tris
from tpu_bvh.models import lbvh
from tpu_bvh.ops import traverse
from tpu_bvh.types import Rays, Transformation
from tpu_bvh.utils import cpu_reference, scenes, camera

VARIANTS = ["if_if", "while_while", "speculative", "restart_trail"]


def _identity():
    return Transformation(
        translation=jnp.zeros(3, jnp.float32),
        scale=jnp.ones(3, jnp.float32),
        quat=jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32),
    )


@pytest.fixture(scope="module")
def setup():
    tris = jnp.asarray(scenes.cornellbox())
    tr, cam = scenes.preset("cornellbox")
    rays = camera.generate_rays(cam, 24, 24)
    bvh = lbvh.build_two_pass(tris)
    return tris, tr, rays, bvh


@pytest.mark.parametrize("variant", VARIANTS)
def test_matches_cpu_oracle(setup, variant):
    tris, tr, rays, bvh = setup
    hit, counts = traverse.traverse_bvh2(bvh, tris, rays, tr, variant=variant)
    want_prim, want_t, want_u, want_v = cpu_reference.traverse_cpu(
        bvh,
        tris,
        np.asarray(rays.origin),
        np.asarray(rays.direction),
        np.asarray(tr.scale),
        np.asarray(tr.quat),
        np.asarray(tr.translation),
    )
    got_prim = np.asarray(hit.prim_idx)
    assert np.array_equal(got_prim, want_prim)
    m = want_prim >= 0
    assert np.allclose(np.asarray(hit.t)[m], want_t[m], rtol=1e-4)
    assert np.allclose(np.asarray(hit.u)[m], want_u[m], rtol=1e-3, atol=1e-5)


@pytest.mark.parametrize("variant", VARIANTS)
@pytest.mark.slow
def test_random_scene_vs_oracle(rng, variant):
    tris = jnp.asarray(random_tris(rng, 300, spread=5.0, size=1.0))
    bvh = lbvh.build_single_pass(tris)
    tr = _identity()
    n_rays = 64
    origins = rng.uniform(-8, 8, size=(n_rays, 3)).astype(np.float32)
    dirs = rng.normal(size=(n_rays, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    rays = Rays(
        origin=jnp.asarray(origins),
        direction=jnp.asarray(dirs),
        tmin=jnp.zeros(n_rays),
        tmax=jnp.full(n_rays, 3.4e38),
    )
    hit, _ = traverse.traverse_bvh2(bvh, tris, rays, tr, variant=variant)
    want_prim, want_t, _, _ = cpu_reference.traverse_cpu(
        bvh, tris, origins, dirs, np.ones(3), np.array([0, 0, 0, 1.0]), np.zeros(3)
    )
    assert np.array_equal(np.asarray(hit.prim_idx), want_prim)


def test_miss_rays_do_no_leaf_work(setup):
    """AABB culling regression guard: rays that miss the scene must visit
    zero leaves (a broken slab test still produces correct hits)."""
    tris, tr, rays, bvh = setup
    hit, counts = traverse.traverse_bvh2(bvh, tris, rays, tr, variant="if_if")
    miss = np.asarray(hit.prim_idx) < 0
    assert miss.any()
    assert np.asarray(counts)[miss].max() == 0


def test_counts_reasonable(setup):
    tris, tr, rays, bvh = setup
    _, counts = traverse.traverse_bvh2(bvh, tris, rays, tr, variant="if_if")
    counts = np.asarray(counts)
    assert counts.max() <= tris.shape[0]
    assert 0 < counts.mean() < 4


def test_packed_traversal_matches(setup):
    """The single-gather packed engine returns identical hits."""
    import jax.numpy as jnp

    tris, tr, rays, bvh = setup
    packed = traverse.pack_bvh2(bvh, tris)
    hit_p, counts_p = traverse.traverse_packed(
        packed, bvh.n_internal, bvh.root, rays, tr
    )
    hit, counts = traverse.traverse_bvh2(bvh, tris, rays, tr, variant="if_if")
    assert np.array_equal(np.asarray(hit_p.prim_idx), np.asarray(hit.prim_idx))
    m = np.asarray(hit.prim_idx) >= 0
    assert np.allclose(np.asarray(hit_p.t)[m], np.asarray(hit.t)[m], rtol=1e-5)
    assert np.array_equal(np.asarray(counts_p), np.asarray(counts))


def _caterpillar_bvh(n_leaves=64, hot_prim=60):
    """Hand-built degenerate chain BVH deeper than STACK_DEPTH: internal i
    has left = leaf i, right = internal i+1; every node AABB is the same big
    box so both children always hit and the far (leaf) child must be pushed
    at every level. Only `hot_prim`'s triangle crosses the probe ray, and
    its leaf is pushed at depth > STACK_DEPTH — a silent-drop engine returns
    a miss."""
    from tpu_bvh.types import Bvh2

    n = n_leaves
    ni = n - 1
    m = 2 * n - 1
    left = np.full(m, -1, np.int32)
    right = np.full(m, -1, np.int32)
    for i in range(ni):
        left[i] = ni + i  # leaf holding prim i
        right[i] = i + 1 if i < ni - 1 else m - 1  # chain, last -> leaf n-1
    left[ni:] = np.arange(n, dtype=np.int32)  # leaf slot -> prim idx
    node_min = np.full((m, 3), -10.0, np.float32)
    node_max = np.full((m, 3), 10.0, np.float32)

    tris = np.zeros((n, 3, 3), np.float32)
    for i in range(n):
        dx = 0.0 if i == hot_prim else 6.0  # off-ray for all but hot_prim
        tris[i] = [[-1 + dx, -1, 1.0], [2 + dx, -1, 1.0], [dx, 2, 1.0]]
    bvh = Bvh2.from_rows(
        jnp.asarray(node_min),
        jnp.asarray(node_max),
        jnp.asarray(left),
        jnp.asarray(right),
        jnp.int32(0),
    )
    return bvh, jnp.asarray(tris)


@pytest.mark.parametrize("variant", VARIANTS)
def test_deep_tree_no_silent_stack_drop(variant):
    """Trees deeper than the traversal stack must still return correct
    closest hits (VERDICT r1 #10; the reference has the same latent bug at
    `TraversalKernel.h:160,214` — flagged 'do NOT replicate')."""
    bvh, tris = _caterpillar_bvh()
    tr = _identity()
    rays = Rays(
        origin=jnp.asarray([[0.0, 0.0, -1.0], [50.0, 50.0, -1.0]], jnp.float32),
        direction=jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]], jnp.float32),
        tmin=jnp.zeros(2),
        tmax=jnp.full(2, 3.4e38),
    )
    hit, _ = traverse.traverse_bvh2(bvh, tris, rays, tr, variant=variant)
    assert int(hit.prim_idx[0]) == 60
    assert abs(float(hit.t[0]) - 2.0) < 1e-5
    assert int(hit.prim_idx[1]) == -1


def test_deep_tree_packed_no_silent_stack_drop():
    bvh, tris = _caterpillar_bvh()
    tr = _identity()
    rays = Rays(
        origin=jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32),
        direction=jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32),
        tmin=jnp.zeros(1),
        tmax=jnp.full(1, 3.4e38),
    )
    packed = traverse.pack_bvh2(bvh, tris)
    hit, _ = traverse.traverse_packed(packed, bvh.n_internal, bvh.root, rays, tr)
    assert int(hit.prim_idx[0]) == 60
    assert abs(float(hit.t[0]) - 2.0) < 1e-5


def test_packed_traversal_random(rng):
    import jax.numpy as jnp

    tris = jnp.asarray(random_tris(rng, 500, spread=5.0, size=1.0))
    bvh = lbvh.build_single_pass(tris)
    tr = _identity()
    n_rays = 128
    origins = rng.uniform(-8, 8, size=(n_rays, 3)).astype(np.float32)
    dirs = rng.normal(size=(n_rays, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    rays = Rays(
        origin=jnp.asarray(origins),
        direction=jnp.asarray(dirs),
        tmin=jnp.zeros(n_rays),
        tmax=jnp.full(n_rays, 3.4e38),
    )
    packed = traverse.pack_bvh2(bvh, tris)
    hit_p, _ = traverse.traverse_packed(packed, bvh.n_internal, bvh.root, rays, tr)
    hit, _ = traverse.traverse_bvh2(bvh, tris, rays, tr)
    assert np.array_equal(np.asarray(hit_p.prim_idx), np.asarray(hit.prim_idx))
