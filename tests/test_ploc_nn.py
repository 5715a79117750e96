"""Parity: fused Pallas PLOC NN-stage kernel vs the XLA bounded-offset
fallback (`ops.ploc._nn_round_xla`), in interpret mode on CPU."""
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from tpu_bvh.ops import ploc
from tpu_bvh.ops.pallas.ploc_nn import ploc_nn_round

I32 = jnp.int32
U32 = jnp.uint32


def _mk_state(rng, size, n_clusters, n_segs):
    """Returns (mat_i32 for the kernel, f32 segmat + cols/seg for the XLA
    fallback). The kernel's i32 mat carries seg ids in the code row with
    shift_bits=0 (code >> 0 == seg)."""
    mn = rng.random((6, size), dtype=np.float32)
    # packed (min3, -max3): make -max <= min - extent so extents positive
    cols = np.concatenate([mn[:3], -(mn[:3] + 0.1 + mn[3:])], axis=0)
    seg = rng.integers(0, n_segs, size).astype(np.int32)
    seg.sort()
    cnode = rng.integers(0, 2 * size, size).astype(np.int32)
    as_f = lambda x: lax.bitcast_convert_type(jnp.asarray(x), jnp.float32)
    as_i = lambda x: lax.bitcast_convert_type(jnp.asarray(x), jnp.int32)
    mat_i = jnp.concatenate(
        [as_i(np.asarray(cols)), jnp.asarray(seg)[None, :],
         jnp.asarray(cnode)[None, :]], axis=0
    )
    segmat = jnp.concatenate(
        [jnp.asarray(cols), as_f(seg)[None, :], as_f(cnode)[None, :]], axis=0
    )
    return mat_i, segmat, jnp.asarray(cols), jnp.asarray(seg).astype(U32), cnode


@pytest.mark.parametrize("size,nc,nsegs", [(256, 256, 1), (384, 300, 7), (128, 5, 2)])
@pytest.mark.parametrize("radius", [8, 4])
def test_nn_kernel_matches_xla(size, nc, nsegs, radius):
    rng = np.random.default_rng(size + radius)
    mat_i, segmat, cols, seg, cnode = _mk_state(rng, size, nc, nsegs)
    idx = jnp.arange(size, dtype=I32)
    valid = idx < nc

    m1, d1, u1, r1 = ploc._nn_round_xla(
        segmat, [cols[k] for k in range(6)], seg, valid, idx,
        jnp.asarray(nc, I32), size, radius,
    )
    m2, d2, u2, r2 = ploc_nn_round(mat_i, nc, radius, interpret=True, shift_bits=0)

    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    merged = np.asarray(m1)
    # union AABB + partner node only meaningful where merge
    for k in range(6):
        np.testing.assert_array_equal(
            np.asarray(u1[k])[merged], np.asarray(u2[k])[merged]
        )
    np.testing.assert_array_equal(np.asarray(r1)[merged], np.asarray(r2)[merged])


def test_nn_kernel_no_cross_segment_merges():
    rng = np.random.default_rng(0)
    size = 256
    mat_i, segmat, cols, seg, cnode = _mk_state(rng, size, size, 13)
    m2, d2, u2, r2 = ploc_nn_round(mat_i, size, 8, interpret=True, shift_bits=0)
    m = np.asarray(m2)
    # recompute rel from the xla path for the check
    idx = jnp.arange(size, dtype=I32)
    m1, d1, u1, r1 = ploc._nn_round_xla(
        segmat, [cols[k] for k in range(6)], seg, idx < size, idx,
        jnp.asarray(size, I32), size, 8,
    )
    np.testing.assert_array_equal(m, np.asarray(m1))


@pytest.mark.parametrize("size,nc,nsegs", [(1024, 1024, 1), (1024, 900, 11)])
def test_nn_kernel_multiblock(monkeypatch, size, nc, nsegs):
    # force a 4-block grid so the halo/stencil path is exercised
    from tpu_bvh.ops.pallas import ploc_nn
    monkeypatch.setattr(ploc_nn, "_BLK", 256)
    rng = np.random.default_rng(99)
    mat_i, segmat, cols, seg, cnode = _mk_state(rng, size, nc, nsegs)
    idx = jnp.arange(size, dtype=I32)
    m1, d1, u1, r1 = ploc._nn_round_xla(
        segmat, [cols[k] for k in range(6)], seg, idx < nc, idx,
        jnp.asarray(nc, I32), size, 8,
    )
    m2, d2, u2, r2 = ploc_nn.ploc_nn_round(mat_i, nc, 8, interpret=True, shift_bits=0)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    merged = np.asarray(m1)
    for k in range(6):
        np.testing.assert_array_equal(
            np.asarray(u1[k])[merged], np.asarray(u2[k])[merged]
        )
    np.testing.assert_array_equal(np.asarray(r1)[merged], np.asarray(r2)[merged])
