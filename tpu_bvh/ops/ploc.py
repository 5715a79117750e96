"""PLOC++ agglomerative clustering — and its HPLOC-style guided variant.

TPU re-expression of the reference's PLOC++ kernels
(`/root/reference/src/Ploc++Kernel.h:98-362`) and HPLOC
(`HplocKernel.h:220-314`). The reference's machinery — shared-memory chunks
with aprons, warp-ballot prefix sums, atomicMin-encoded nearest neighbors,
cross-block serialized offsets — exists to emulate what a vector machine
does natively:

* nearest-neighbor search within Morton-order radius 8 = shifted
  whole-array AABB unions + a lexicographic (area, index) min-reduction
  (the reference's `(float_bits(area) << 32) | index` atomicMin encoding,
  `Ploc++Kernel.h:140-146`, without the atomics);
* mutual-pair merge + compaction = masked cumsums and one stable sort;
* the host `while (nClusters > 1)` loop with its per-round device->host
  readback (`PLOC++Bvh.cpp:132-152`) = `lax.while_loop`s on device.

Performance shape (TPU v5e): random gathers cost ~60x a dense op, so every
neighbor access exploits that PLOC neighbors live within +-radius in sorted
order: `nn[i]`, `cnode[nn[i]]`, `aabb[nn[i]]` are (2R+1)-way dense selects
over shifted arrays, never gathers. Cluster state is struct-of-columns;
compaction is one stable multi-operand sort; each round's merged nodes are
emitted with a single packed row scatter. The outer loop runs in *stages*
of geometrically shrinking static array sizes (clusters stay compacted at
the front), so late rounds don't pay full-width work.

Merged nodes are allocated top-down (`nClusters - 2 - prefix`,
`Ploc++Kernel.h:311`) so the root lands at index 0 — the same convention,
but deterministic (in cluster order) instead of warp-race order.

The HPLOC variant (`hploc=True`) restricts merges to clusters sharing a
Morton-prefix segment and coarsens the prefix whenever a round stalls —
merging bottom-up within LBVH subtrees, the role the reference's
warp-cooperative `plocMerge` plays inside LBVH ranges
(`HplocKernel.h:257-314`). Same output family (root at 0); the subtree
schedule is prefix-quantized rather than exact-range, which is the honest
TPU mapping of that warp choreography.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..types import PLOC_RADIUS

I32 = jnp.int32
U32 = jnp.uint32
INVALID = jnp.int32(-1)
_BIG = jnp.float32(3.0e38)
_STAGE_RATIO = 4
_MIN_STAGE = 4096


def _shift(x, d, fill):
    """out[i] = x[i + d] with `fill` beyond the edges (dense slicing)."""
    n = x.shape[0]
    if d == 0:
        return x
    if d > 0:
        if d >= n:
            return jnp.full_like(x, fill)
        return jnp.concatenate([x[d:], jnp.full((d,), fill, x.dtype)])
    d = -d
    if d >= n:
        return jnp.full_like(x, fill)
    return jnp.concatenate([jnp.full((d,), fill, x.dtype), x[:-d]])


def _area6(c):
    """Surface area from packed (min3, -max3) columns c: tuple of 6 [n]."""
    ex = -c[3] - c[0]
    ey = -c[4] - c[1]
    ez = -c[5] - c[2]
    return 2.0 * (ex * ey + ex * ez + ey * ez)


def _round(state, radius: int):
    """One PLOC merge round over column state. All neighbor access is by
    bounded offset -> dense shifted selects."""
    (n_clusters, cnode, ccode, shift_bits, cols, nodes) = state
    size = cnode.shape[0]
    idx = jnp.arange(size, dtype=I32)
    valid = idx < n_clusters
    seg = jnp.where(
        shift_bits >= 32, U32(0), ccode >> shift_bits.astype(U32)
    )

    # --- nearest neighbors: forward pairs (i, i+d), considered from both ends
    best_area = jnp.full((size,), _BIG)
    best_rel = jnp.zeros((size,), I32)  # relative offset of best neighbor

    for d in range(1, radius + 1):
        shifted = [_shift(c, d, _BIG) for c in cols]
        u = [jnp.minimum(a, b) for a, b in zip(cols, shifted)]
        area = _area6(u)
        ok = valid & (idx + d < n_clusters) & (seg == _shift(seg, d, U32(0xFFFFFFFF)))
        area = jnp.where(ok, area, _BIG)
        # forward candidate for i: neighbor i+d (index tie-break: smaller
        # neighbor index wins on equal area -> prefer existing on tie
        # unless strictly smaller; among same-i candidates, increasing d
        # keeps the smaller index first)
        better = area < best_area
        best_area = jnp.where(better, area, best_area)
        best_rel = jnp.where(better, d, best_rel)
        # backward candidate for i+d: neighbor (i+d)-d; shift area/ok right
        area_b = _shift(area, -d, _BIG)
        # on ties the SMALLER index wins: a backward neighbor (i-d) beats an
        # equal-area forward one, and farther backward loses to nearer
        # backward processed earlier... reference order: min over packed
        # (area, index): index = absolute neighbor id. For i: forward nbr
        # id = i+d (larger), backward id = i-d (smaller). Equal areas ->
        # smallest id wins = most-negative rel.
        better_b = (area_b < best_area) | (
            (area_b == best_area) & (idx - d < idx + best_rel)
        )
        best_area = jnp.where(better_b, area_b, best_area)
        best_rel = jnp.where(better_b, -d, best_rel)

    has_nn = best_area < _BIG
    # nn[nn[i]] via (2R+1)-way dense select on the bounded offset
    rel_at_nn = jnp.zeros((size,), I32)
    for r in range(-radius, radius + 1):
        if r == 0:
            continue
        rel_at_nn = jnp.where(
            best_rel == r, _shift(best_rel, r, 0), rel_at_nn
        )
    mutual = has_nn & valid & (rel_at_nn == -best_rel)
    merge = mutual & (best_rel > 0)  # left partner (smaller index) merges
    dropped = mutual & (best_rel < 0)

    rank = jnp.cumsum(merge.astype(I32)) - merge.astype(I32)
    n_merged = jnp.sum(merge.astype(I32))
    # This round's nodes occupy the contiguous id slab
    # [n_clusters-1-n_merged, n_clusters-2]; ids ascend in cluster order
    # (the global allocation stays top-down across rounds — root lands at
    # 0 — but intra-round order is free, cf. the reference's warp-race
    # order, `Ploc++Kernel.h:311`). Contiguity lets the emission be a
    # blended dynamic slice write: a row scatter costs ~1.4 ms flat on TPU
    # per round, the slab write is pure dense traffic.
    slab_start = n_clusters - 1 - n_merged
    new_id = slab_start + rank

    # partner data via bounded-offset selects
    rnode = jnp.zeros_like(cnode)
    pcols = [jnp.zeros_like(c) for c in cols]
    for r in range(1, radius + 1):
        sel = best_rel == r
        rnode = jnp.where(sel, _shift(cnode, r, INVALID), rnode)
        for k in range(6):
            pcols[k] = jnp.where(sel, _shift(cols[k], r, _BIG), pcols[k])
    ucols = [jnp.minimum(a, b) for a, b in zip(cols, pcols)]

    # emit merged nodes: compact rows to the front (stable sort keeps rank
    # order), then blend the slab into the (over-allocated) nodes buffer
    as_f = lambda x: lax.bitcast_convert_type(x, jnp.float32)
    emit = lax.sort(
        tuple(
            [(~merge).astype(U32), as_f(cnode), as_f(rnode)] + list(ucols)
        ),
        num_keys=1,
        is_stable=True,
    )
    rows = jnp.stack(emit[1:], axis=1)  # [size, 8], merged rows first
    start = jnp.maximum(slab_start, 0)
    window = lax.dynamic_slice(nodes, (start, 0), (size, 8))
    j = jnp.arange(size, dtype=I32)
    window = jnp.where((j < n_merged)[:, None], rows, window)
    nodes = lax.dynamic_update_slice(nodes, window, (start, 0))

    # survivors: merged cluster replaces its left partner
    cnode = jnp.where(merge, new_id, jnp.where(valid & ~dropped, cnode, INVALID))
    out_cols = [
        jnp.where(merge, u, jnp.where(valid & ~dropped, c, _BIG))
        for u, c in zip(ucols, cols)
    ]

    # compact with one stable sort on the keep flag
    keep = valid & ~dropped
    key = (~keep).astype(U32)
    sorted_ops = lax.sort(
        tuple([key, cnode, ccode] + out_cols), num_keys=1, is_stable=True
    )
    cnode = sorted_ops[1]
    ccode = sorted_ops[2]
    cols = list(sorted_ops[3:9])

    shift_bits = jnp.where(n_merged == 0, jnp.minimum(shift_bits + 3, 32), shift_bits)
    n_clusters = n_clusters - n_merged
    return (n_clusters, cnode, ccode, shift_bits, cols, nodes)


def ploc_build_topology(
    leaf_min, leaf_max, codes, hploc: bool = False, radius: int = PLOC_RADIUS
):
    """Agglomerate Morton-sorted leaves into a BVH2 topology.

    leaf_min/max: f32[n,3] sorted leaf AABBs; codes: u32[n] sorted Morton
    codes (used only by the HPLOC segment schedule).
    Returns (left i32[2n-1], right i32[2n-1], node_min f32[n-1,3],
    node_max f32[n-1,3]) — root = 0.
    """
    n = leaf_min.shape[0]
    n_internal = n - 1
    init_nodes = jnp.arange(n, dtype=I32) + n_internal  # leaf ids
    shift0 = jnp.asarray(3 if hploc else 32, I32)

    cols = [
        leaf_min[:, 0],
        leaf_min[:, 1],
        leaf_min[:, 2],
        -leaf_max[:, 0],
        -leaf_max[:, 1],
        -leaf_max[:, 2],
    ]
    # packed emit buffer, over-allocated by the largest stage size so the
    # blended slab write's window never clamps at the top end
    nodes = jnp.zeros((n_internal + n, 8), jnp.float32)

    state = (jnp.asarray(n, I32), init_nodes, codes, shift0, cols, nodes)

    # staged shrink: clusters stay compacted at the front, so once the live
    # count fits a smaller static size we slice down and keep going
    size = n
    sizes = []
    while size > _MIN_STAGE:
        sizes.append(size)
        size = max(_MIN_STAGE, size // _STAGE_RATIO)
    sizes.append(size)

    for si, size in enumerate(sizes):
        target = sizes[si + 1] if si + 1 < len(sizes) else 1

        def cond(s, target=target):
            return s[0] > target

        def body(s):
            return _round(s, radius)

        state = lax.while_loop(cond, body, state)
        if target > 1:
            (nc, cnode, ccode, sb, cols, nodes) = state
            state = (
                nc,
                cnode[:target],
                ccode[:target],
                sb,
                [c[:target] for c in cols],
                nodes,
            )

    (_, _, _, _, _, nodes) = state
    nodes = nodes[:n_internal]
    as_i = lambda x: lax.bitcast_convert_type(x, I32)
    left = as_i(nodes[:, 0])
    right = as_i(nodes[:, 1])
    imin = nodes[:, 2:5]
    imax = -nodes[:, 5:8]
    return left, right, imin, imax
