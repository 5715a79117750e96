"""Parity: sort-free Pallas round completion (`ploc_emit_compact`) vs the
XLA sort-based `ploc._round` fallback, interpret mode on CPU."""
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from tpu_bvh.ops import ploc
from tpu_bvh.ops.pallas.ploc_round import ploc_emit_compact

I32 = jnp.int32


def _mk_state(rng, size, nc):
    mn = rng.random((6, size), dtype=np.float32)
    cols = np.concatenate([mn[:3], -(mn[:3] + 0.1 + mn[3:])], axis=0)
    codes = np.sort(rng.integers(0, 2**30, size).astype(np.int32))
    cnode = (np.arange(size) + size - 1).astype(np.int32)
    as_i = lambda x: lax.bitcast_convert_type(jnp.asarray(x), jnp.int32)
    mat = jnp.concatenate(
        [as_i(np.asarray(cols)), jnp.asarray(codes)[None, :],
         jnp.asarray(cnode)[None, :]],
        axis=0,
    )
    return mat


@pytest.mark.parametrize("size,nc", [(384, 384), (512, 300), (1024, 1000)])
@pytest.mark.parametrize("shift", [32, 18])
@pytest.mark.slow
def test_round_matches_xla(monkeypatch, size, nc, shift):
    from tpu_bvh.ops.pallas import ploc_round as pr
    monkeypatch.setattr(pr, "_BLK", 256)  # multi-block stitch coverage
    rng = np.random.default_rng(size + shift)
    mat = _mk_state(rng, size, nc)
    w = 2 * size + 512  # roomy enough for both the XLA slab window and the kernel
    pattern = rng.integers(-2**30, 2**30, (8, w)).astype(np.int32)
    nodes = jnp.asarray(pattern)

    # reference: the XLA fallback round (runs because platform is cpu)
    nc_a = jnp.asarray(nc, I32)
    sb = jnp.asarray(shift, I32)
    (nc1, sb1, mat1, nodes1) = ploc._round((nc_a, sb, mat, nodes), nc, 8)

    # pallas: same NN result (xla fallback NN is bit-identical to the
    # kernel per test_ploc_nn) -> fused emit/compact
    as_i = lambda x: lax.bitcast_convert_type(x, I32)
    as_f = lambda x: lax.bitcast_convert_type(x, jnp.float32)
    cols = [as_f(mat[k]) for k in range(6)]
    ccode = mat[6].astype(jnp.uint32)
    idx = jnp.arange(size, dtype=I32)
    seg = jnp.where(
        sb >= 32, jnp.uint32(0), ccode >> jnp.minimum(sb, 31).astype(jnp.uint32)
    )
    segmat = jnp.stack(
        cols + [as_f(seg.astype(I32)), as_f(mat[7])], axis=0
    )
    merge, dropped, ucols, rnode = ploc._nn_round_xla(
        segmat, cols, seg, idx < nc_a, idx, nc_a, size, 8
    )
    flags = merge.astype(I32) + 2 * dropped.astype(I32)
    nn = jnp.concatenate(
        [jnp.stack([as_i(u) for u in ucols], axis=0), rnode[None, :],
         flags[None, :]],
        axis=0,
    )
    n_merged = jnp.sum(merge.astype(I32))
    mat2, nodes2 = ploc_emit_compact(
        mat, nn, nodes, nc_a, jnp.asarray(0, I32), interpret=True
    )

    nm = int(n_merged)
    n_keep = nc - int(jnp.sum(dropped.astype(I32)))
    assert int(nc1) == nc - nm

    # survivor prefix identical (cnode, ccode, cols)
    a1 = np.asarray(mat1)[:, :n_keep]
    a2 = np.asarray(mat2)[:, :n_keep]
    np.testing.assert_array_equal(a1, a2)

    # nodes: the bottom-up slab [0, nm) written identically, everything
    # else preserved
    n1 = np.asarray(nodes1)
    n2 = np.asarray(nodes2)
    np.testing.assert_array_equal(n1[:, :nm], n2[:, :nm])
    mask = np.ones(w, bool)
    mask[:nm] = False
    np.testing.assert_array_equal(n2[:, mask], pattern[:, mask])


def test_round_no_merges(monkeypatch):
    """nm == 0 (HPLOC stall): state passes through unchanged, nodes
    untouched."""
    from tpu_bvh.ops.pallas import ploc_round as pr
    monkeypatch.setattr(pr, "_BLK", 256)
    rng = np.random.default_rng(3)
    size, nc = 512, 500
    mat = _mk_state(rng, size, nc)
    w = 2 * size + 512  # roomy enough for both the XLA slab window and the kernel
    pattern = rng.integers(-2**30, 2**30, (8, w)).astype(np.int32)
    nn = jnp.zeros((8, size), jnp.int32)  # flags all 0
    mat2, nodes2 = ploc_emit_compact(
        mat, nn, jnp.asarray(pattern), jnp.asarray(nc, I32),
        jnp.asarray(0, I32), interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(mat2)[:, :nc], np.asarray(mat)[:, :nc])
    np.testing.assert_array_equal(np.asarray(nodes2), pattern)


@pytest.mark.parametrize("size,nc,shift", [(512, 500, 32), (512, 512, 12), (300, 300, 32)])
def test_finisher_matches_iterated_rounds(monkeypatch, size, nc, shift):
    """`ploc_finish` (all remaining rounds in one kernel) == iterating the
    XLA `_round` until one cluster remains."""
    from tpu_bvh.ops.pallas import ploc_round as pr
    monkeypatch.setattr(pr, "_FIN_WIDTH", 1024)
    rng = np.random.default_rng(size + nc + shift)
    mat = _mk_state(rng, size, nc)
    w = 2 * size + 512
    pattern = rng.integers(-2**30, 2**30, (8, w)).astype(np.int32)
    # XLA reference: iterate rounds to completion
    state = (jnp.asarray(nc, I32), jnp.asarray(shift, I32), mat,
             jnp.asarray(pattern))
    guard = 0
    while int(state[0]) > 1:
        state = ploc._round(state, nc, 8)
        guard += 1
        assert guard < 200
    nodes_ref = np.asarray(state[3])

    nodes2 = pr.ploc_finish(
        mat, jnp.asarray(pattern), jnp.asarray(nc, I32),
        jnp.asarray(shift, I32), jnp.asarray(0, I32), 8, interpret=True,
    )
    n2 = np.asarray(nodes2)
    # every id in [0, nc-1) written identically; everything else preserved
    np.testing.assert_array_equal(n2[:, :nc - 1], nodes_ref[:, :nc - 1])
    np.testing.assert_array_equal(n2[:, nc - 1:], pattern[:, nc - 1:])


@pytest.mark.parametrize("size,nc", [(384, 384), (512, 300), (1024, 1000)])
@pytest.mark.parametrize("shift", [32, 18])
def test_fused_round_matches_xla(monkeypatch, size, nc, shift):
    """`ploc_round_fused` (NN + emit + compaction in ONE kernel) == the
    XLA fallback `ploc._round`."""
    from tpu_bvh.ops.pallas import ploc_round as pr
    monkeypatch.setattr(pr, "_BLK", 256)  # multi-block two-pass coverage
    rng = np.random.default_rng(size + shift + 7)
    mat = _mk_state(rng, size, nc)
    w = 2 * size + 512
    pattern = rng.integers(-2**30, 2**30, (8, w)).astype(np.int32)
    nodes = jnp.asarray(pattern)

    nc_a = jnp.asarray(nc, I32)
    sb = jnp.asarray(shift, I32)
    (nc1, sb1, mat1, nodes1) = ploc._round((nc_a, sb, mat, nodes), nc, 8)

    mat2, nodes2, nm2 = pr.ploc_round_fused(
        mat, nodes, nc_a, sb, jnp.asarray(0, I32), 8, interpret=True
    )
    nm = nc - int(nc1)
    assert int(nm2) == nm

    # survivor prefix identical (compacted keep rows)
    n_keep = int(nc1) + 0  # survivors = nc - nm (merged pairs keep one)
    # XLA path keeps merged + unmerged = nc - n_dropped = nc - nm
    a1 = np.asarray(mat1)[:, :n_keep]
    a2 = np.asarray(mat2)[:, :n_keep]
    np.testing.assert_array_equal(a1, a2)

    # nodes: the bottom-up slab [0, nm) written identically, everything
    # else preserved
    n1 = np.asarray(nodes1)
    n2 = np.asarray(nodes2)
    np.testing.assert_array_equal(n1[:, :nm], n2[:, :nm])
    mask = np.ones(w, bool)
    mask[:nm] = False
    np.testing.assert_array_equal(n2[:, mask], pattern[:, mask])
