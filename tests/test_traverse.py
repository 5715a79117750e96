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
