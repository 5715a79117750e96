"""Sharded single-scene LBVH build over a `jax.sharding.Mesh`.

SURVEY.md §5's missing scaling axis: one huge scene's triangles sharded
across chips, the whole build pipeline running SPMD with ICI collectives
where the reference uses single-GPU global memory (the smem apron of
`/root/reference/src/Ploc++Kernel.h:220-227` becomes a ppermute halo; the
global radix sort becomes an odd-even merge-split network; the atomic-climb
refit becomes carry-combined scans + query routing with `lax.pmin`).

Everything is deterministic and **bit-identical** to the single-device
`models.lbvh.build_single_pass` tree:

* the distributed sort orders by the total key (code, original index),
  which is exactly what the single-device stable sort produces;
* the threshold scans use associative combines (max / segmented-min) whose
  cross-shard carry composition is the same operator, so integer outputs
  match exactly;
* AABB refit is pure f32 min/max — associative and exact in any grouping.

Per-shard layout (p shards, L = n/p): shard s owns sorted leaves
[sL, (s+1)L) and boundaries [sL, (s+1)L) (the last shard's final boundary
slot is a pad — global boundary m = n-1 does not exist; its delta is set
below every real value so reverse scans resolve "no next smaller" to the
n-1 sentinel naturally).

Degenerate scenes can exceed the long-node routing capacity; the build
then reports `overflow=True` (honest, like the traversal engines) and the
affected AABBs fall back to +/-inf — callers should rebuild unsharded.
"""
from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..types import Bvh2

I32 = jnp.int32
U32 = jnp.uint32
V = 64  # threshold lanes (delta alphabet remapped to [0, 52])
_BIG = jnp.int32(2**31 - 1)
_FBIG = jnp.float32(3.0e38)
_POSB = 22


def _clz32(x):
    return lax.clz(x.astype(U32)).astype(I32)


def _floor_log2(x):
    return (31 - _clz32(jnp.maximum(x, 1))).astype(I32)


# ---------------------------------------------------------------------------
# distributed sort: local sort + odd-even transposition merge-split rounds
# ---------------------------------------------------------------------------


def _merge_split(ops, partner, keep_low, axis):
    """Exchange full local arrays with `partner` (ppermute), sort the 2L
    union by (code, gidx), keep the low or high half. `partner == -1`
    (encoded as self) keeps the local data untouched via masking."""
    L = ops[0].shape[0]
    perm_pairs = partner  # list of (src, dst) built by caller
    exchanged = [lax.ppermute(o, axis, perm_pairs) for o in ops]
    both = [jnp.concatenate([a, b]) for a, b in zip(ops, exchanged)]
    srt = lax.sort(tuple(both), num_keys=2, is_stable=False)
    low = [x[:L] for x in srt]
    high = [x[L:] for x in srt]
    return low, high


def _odd_even_sort(ops, p, axis):
    """Odd-even transposition sort across p shards; local arrays already
    sorted. By the 0-1 principle, p rounds of neighbor merge-split sort any
    input. ops[0:2] = (codes u32, gidx i32) are the sort keys."""
    idx = lax.axis_index(axis)
    for r in range(p):
        if r % 2 == 0:
            pairs = [(2 * k, 2 * k + 1) for k in range(p // 2)]
        else:
            pairs = [(2 * k + 1, 2 * k + 2) for k in range((p - 1) // 2)]
        active = set()
        perm = []
        for a, b in pairs:
            perm += [(a, b), (b, a)]
            active.add(a)
            active.add(b)
        for s in range(p):
            if s not in active:
                perm.append((s, s))
        low, high = _merge_split(ops, perm, None, axis)
        if r % 2 == 0:
            is_lower = idx % 2 == 0
            is_upper = idx % 2 == 1
        else:
            is_lower = (idx % 2 == 1) & (idx < p - 1)
            is_upper = (idx % 2 == 0) & (idx > 0)
        if p % 2 == 1 and r % 2 == 0:
            is_lower = is_lower & (idx < p - 1)
        ops = [
            jnp.where(is_lower, lo, jnp.where(is_upper, hi, o))
            for o, lo, hi in zip(ops, low, high)
        ]
    return ops


# ---------------------------------------------------------------------------
# carry-combined threshold scans (XLA formulation of ops/pallas/scan32)
# ---------------------------------------------------------------------------


def _seg_comb(a, b):
    """Segmented-min combine over (min, reset_seen) pairs."""
    mm = jnp.where(b[1], b[0], jnp.minimum(a[0], b[0]))
    return (mm, a[1] | b[1])


def _carry_fold(items, neutral, comb):
    """Exclusive prefix fold of per-shard totals (small static loop)."""
    p = items[0].shape[0]
    outs = []
    acc = neutral
    for s in range(p):
        outs.append(acc)
        acc = comb(acc, tuple(x[s] for x in items))
    return [jnp.stack([o[k] for o in outs]) for k in range(len(neutral))]


def _sharded_scans(dlt, gb, axis, p, n_sentinel):
    """Global psv/nsv/lc/rc for this shard's boundaries.

    dlt: i32[L] remapped deltas [0, 52] (pad slots hold -1: below every
    real value). gb: i32[L] global boundary indices.
    Returns (psv, psv_val, nsv, nsv_val, lc, rc) with global positions.
    """
    L = dlt.shape[0]
    idx = lax.axis_index(axis)
    vr = jnp.arange(V, dtype=I32)
    maskv = dlt[:, None] < vr[None, :]
    onehot = dlt[:, None] == vr[None, :]

    # ---- psv: running max of packed pos*64+val where val < lane ----
    # pad boundary (global n-1) carries dlt = -1 so it is a universal
    # candidate, but packs val 0; its decoded position n-1 IS the "no next
    # smaller" sentinel, so reverse scans resolve naturally.
    packed = gb * 64 + jnp.maximum(dlt, 0)
    pk = jnp.where(maskv, packed[:, None], -1)
    pre = lax.cummax(pk, axis=0)
    tot = pre[-1]  # [V]
    tots = lax.all_gather(tot, axis)  # [p, V]
    carry_in = _carry_fold(
        (tots,), (jnp.full((V,), -1, I32),),
        lambda a, b: (jnp.maximum(a[0], b[0]),),
    )[0][idx]
    pre_g = jnp.maximum(pre, carry_in[None, :])
    psv_rows = jnp.concatenate([carry_in[None, :], pre_g[:-1]], axis=0)
    # one-hot select by SUM (a max would let the 0 fill beat the -1 "none")
    ppk = jnp.sum(jnp.where(onehot, psv_rows, 0), axis=1)
    has = ppk >= 0
    psv = jnp.where(has, ppk // 64, -1)
    psv_val = jnp.where(has, ppk % 64, -1)

    # ---- nsv: suffix min of packed pos*64+val where val < lane ----
    pk2 = jnp.where(maskv, packed[:, None], _BIG)
    suf = lax.cummin(pk2, axis=0, reverse=True)
    tot_r = suf[0]
    tots_r = lax.all_gather(tot_r, axis)
    # exclusive suffix fold: combine shards AFTER s
    def _suffix_fold(items):
        outs = []
        acc = jnp.full((V,), _BIG, I32)
        res = [None] * p
        for s in range(p - 1, -1, -1):
            res[s] = acc
            acc = jnp.minimum(acc, items[s])
        return jnp.stack(res)

    carry_in_r = _suffix_fold(tots_r)[idx]
    suf_g = jnp.minimum(suf, carry_in_r[None, :])
    nsv_rows = jnp.concatenate([suf_g[1:], carry_in_r[None, :]], axis=0)
    npk = jnp.sum(jnp.where(onehot, nsv_rows, 0), axis=1)
    hasn = npk != _BIG
    nsv = jnp.where(hasn, npk // 64, -1)  # caller maps -1 -> n-1 sentinel
    # the pad boundary decodes to the n-1 sentinel position; its packed val
    # is a placeholder 0 — report -1 ("no real next-smaller") there, which
    # is what the side comparison psv_val > nsv_val needs
    nsv_val = jnp.where(hasn & (nsv < n_sentinel), npk % 64, -1)

    # ---- lc: exclusive segmented min (reset where dlt <= lane) ----
    cpacked = (dlt << _POSB) | gb
    cand = jnp.where(dlt[:, None] > vr[None, :], cpacked[:, None], _BIG)
    reset = dlt[:, None] <= vr[None, :]
    m_f, r_f = lax.associative_scan(_seg_comb, (cand, reset), axis=0)
    tots_m = lax.all_gather(m_f[-1], axis)
    tots_r2 = lax.all_gather(r_f[-1], axis)
    cm, cr = _carry_fold(
        (tots_m, tots_r2),
        (jnp.full((V,), _BIG, I32), jnp.zeros((V,), bool)),
        _seg_comb,
    )
    cm_in, _cr_in = cm[idx], cr[idx]
    m_g = jnp.where(r_f, m_f, jnp.minimum(cm_in[None, :], m_f))
    m_excl = jnp.concatenate([cm_in[None, :], m_g[:-1]], axis=0)
    lpk = jnp.max(jnp.where(onehot, m_excl, 0), axis=1)
    lc = jnp.where(lpk == _BIG, -1, lpk & ((1 << _POSB) - 1))

    # ---- rc: reverse segmented min, exclusive after position ----
    m_r, r_r = lax.associative_scan(
        _seg_comb, (cand[::-1], reset[::-1]), axis=0
    )
    m_r = m_r[::-1]
    r_r = r_r[::-1]
    tots_mr = lax.all_gather(m_r[0], axis)
    tots_rr = lax.all_gather(r_r[0], axis)

    def _suffix_fold2(items_m, items_r):
        acc = (jnp.full((V,), _BIG, I32), jnp.zeros((V,), bool))
        res = [None] * p
        for s in range(p - 1, -1, -1):
            res[s] = acc
            acc = _seg_comb(acc, (items_m[s], items_r[s]))
        return (jnp.stack([r[0] for r in res]), jnp.stack([r[1] for r in res]))

    cmr, _crr = _suffix_fold2(tots_mr, tots_rr)
    cmr_in = cmr[idx]
    m_rg = jnp.where(r_r, m_r, jnp.minimum(cmr_in[None, :], m_r))
    m_excl_r = jnp.concatenate([m_rg[1:], cmr_in[None, :]], axis=0)
    rpk = jnp.max(jnp.where(onehot, m_excl_r, 0), axis=1)
    rc = jnp.where(rpk == _BIG, -1, rpk & ((1 << _POSB) - 1))

    return psv, psv_val, nsv, nsv_val, lc, rc


# ---------------------------------------------------------------------------
# sharded refit: halo dense phase + routed long-node queries
# ---------------------------------------------------------------------------


def _halo_cols(cols, radius, axis, p):
    """[6, L] -> [6, L + 2*radius] with neighbor halos (+big at mesh edges)."""
    idx = lax.axis_index(axis)
    # partial permutations: unmatched destinations receive zeros, which the
    # mesh-edge masks below override with +big
    right_of = [(s, s + 1) for s in range(p - 1)]
    left_of = [(s, s - 1) for s in range(1, p)]
    # halo from the LEFT neighbor: its last `radius` cols travel rightward
    from_left = lax.ppermute(cols[:, -radius:], axis, right_of)
    from_right = lax.ppermute(cols[:, :radius], axis, left_of)
    from_left = jnp.where(idx > 0, from_left, _FBIG)
    from_right = jnp.where(idx < p - 1, from_right, _FBIG)
    return jnp.concatenate([from_left, cols, from_right], axis=1)


def _local_range_table(cols, levels):
    """T_k[i] = min(cols[i : i + 2^k]) clamped, stacked rows [(Lv+1)*L, 6]."""
    L = cols.shape[1]
    tabs = [cols]
    cur = cols
    for k in range(1, levels + 1):
        s = 1 << (k - 1)
        if s < L:
            shifted = jnp.concatenate(
                [cur[:, s:], jnp.broadcast_to(cur[:, -1:], (6, s))], axis=1
            )
            cur = jnp.minimum(cur, shifted)
        tabs.append(cur)
    return jnp.concatenate(tabs, axis=1).T  # [(levels+1)*L, 6]


def _answer_clamped(table, L, levels, lo, cf, cl):
    """min over leaves [cf, cl] ∩ [lo, lo+L) from this shard's table."""
    a = jnp.clip(cf - lo, 0, L - 1)
    b = jnp.clip(cl - lo, 0, L - 1)
    nonempty = (cf <= lo + L - 1) & (cl >= lo) & (b >= a)
    length = jnp.maximum(b - a + 1, 1)
    k = _floor_log2(length)
    s = jnp.maximum(b - (1 << k) + 1, 0)
    u = jnp.minimum(table[k * L + a], table[k * L + s])
    return jnp.where(nonempty[:, None], u, _FBIG)


class ShardedBvh2(NamedTuple):
    """Per-shard build outputs (all [p*L]-sharded along the mesh axis),
    plus the replicated root and the routing-overflow honesty flag."""

    int_packed: jax.Array  # f32[p*L, 6] internal (min,-max); last slot pad
    leaf_packed: jax.Array  # f32[p*L, 6] sorted leaves (min,-max)
    left: jax.Array  # i32[p*L]
    right: jax.Array  # i32[p*L]
    parent_internal: jax.Array  # i32[p*L]
    parent_leaf: jax.Array  # i32[p*L]
    leaf_prim: jax.Array  # i32[p*L]
    root: jax.Array  # i32[] replicated
    overflow: jax.Array  # bool[] replicated


def build_single_pass_sharded(
    mesh: Mesh,
    tris,
    axis: str = "dp",
    radius: int = 16,
    use_extended: bool = True,
    route_cap: int | None = None,
):
    """Sharded single-pass LBVH build (see module docstring). tris must
    have n % p == 0 and n/p >= 2*radius. Returns ShardedBvh2; use
    `to_bvh2` to assemble the standard replicated Bvh2. `route_cap`
    overrides the per-shard long-node routing capacity (testing hook)."""
    p = mesh.devices.size
    n = int(tris.shape[0])
    assert n % p == 0, "triangle count must divide the mesh"
    L = n // p
    assert L >= max(2 * radius, 64), "shards too small"
    m = n - 1
    levels_loc = max(1, math.ceil(math.log2(max(L, 2))))
    cap = route_cap or min(L, max(128, ((L // 4 + 127) // 128) * 128))
    assert cap <= L

    tris = jax.device_put(tris, NamedSharding(mesh, P(axis)))

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=P(axis),
        out_specs=(
            P(axis), P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
            P(), P(),
        ),
        check_vma=False,
    )
    def _build(local_tris):
        s = lax.axis_index(axis)
        lo = s * L  # global offset of this shard's leaves/boundaries
        t9 = local_tris.reshape(L, 9).T
        mnx = jnp.minimum(jnp.minimum(t9[0], t9[3]), t9[6])
        mny = jnp.minimum(jnp.minimum(t9[1], t9[4]), t9[7])
        mnz = jnp.minimum(jnp.minimum(t9[2], t9[5]), t9[8])
        mxx = jnp.maximum(jnp.maximum(t9[0], t9[3]), t9[6])
        mxy = jnp.maximum(jnp.maximum(t9[1], t9[4]), t9[7])
        mxz = jnp.maximum(jnp.maximum(t9[2], t9[5]), t9[8])

        # global scene extents: the reference's atomicGrow reduction
        # (CommonBlocksKernel.h:92-137) as a deterministic ICI all-reduce
        smin = jnp.stack(
            [lax.pmin(jnp.min(c), axis) for c in (mnx, mny, mnz)]
        )
        smax = jnp.stack(
            [lax.pmax(jnp.max(c), axis) for c in (mxx, mxy, mxz)]
        )
        ext = smax - smin
        safe = jnp.where(ext > 0, ext, 1.0)
        nx = ((mnx + mxx) * 0.5 - smin[0]) / safe[0]
        ny = ((mny + mxy) * 0.5 - smin[1]) / safe[1]
        nz = ((mnz + mxz) * 0.5 - smin[2]) / safe[2]
        from ..ops import morton as M

        if use_extended:
            codes = M.extended_morton30_cols(nx, ny, nz, ext)
        else:
            codes = M.morton30_cols(nx, ny, nz)

        # ---- distributed sort by the total key (code, original index) ----
        gidx = lo + jnp.arange(L, dtype=I32)
        ops = [codes, gidx, mnx, mny, mnz, -mxx, -mxy, -mxz]
        ops = list(lax.sort(tuple(ops), num_keys=2, is_stable=False))
        ops = _odd_even_sort(ops, p, axis)
        codes, leaf_prim = ops[0], ops[1]
        leaf_cols = jnp.stack(ops[2:8], axis=0)  # [6, L] (min, -max)

        # ---- boundary deltas (halo: next shard's first code) ----
        nxt = lax.ppermute(
            codes[:1], axis, [(t, t - 1) for t in range(1, p)] + [(0, p - 1)]
        )[0]
        cj = jnp.concatenate([codes[1:], nxt[None]])
        gb = lo + jnp.arange(L, dtype=I32)
        x = codes ^ cj
        tie = 32 + _clz32(gb.astype(U32) ^ (gb + 1).astype(U32))
        dlt_raw = jnp.where(x == 0, tie, _clz32(x))
        dlt = jnp.where(dlt_raw <= 31, dlt_raw - 2, dlt_raw - 11)
        dlt = jnp.where(gb < m, dlt, -1)  # pad boundary: below everything

        psv, psv_val, nsv_p, nsv_val, lc, rc = _sharded_scans(
            dlt, gb, axis, p, m
        )
        first = psv + 1
        last = jnp.where(nsv_p >= 0, nsv_p, n - 1)

        # ---- refit: dense halo stencil ----
        halo = _halo_cols(leaf_cols, radius, axis, p)
        acc = jnp.full((6, L), _FBIG)
        li = jnp.arange(L, dtype=I32)
        la = last - gb
        ab = gb - first
        for d in range(-radius + 1, radius + 1):
            w = lax.dynamic_slice(halo, (0, radius + d), (6, L))
            # ranges contain their own boundary: one-sided checks suffice
            ok = (d <= la) if d > 0 else (-d <= ab)
            acc = jnp.where(ok[None, :], jnp.minimum(acc, w), acc)
        short = (ab < radius) & (la <= radius) & (gb < m)

        # ---- long nodes: compact, broadcast, answer, pmin, route back ----
        table = _local_range_table(leaf_cols, levels_loc)
        is_long = (~short) & (gb < m)
        n_long = jnp.sum(is_long.astype(I32))
        key = (~is_long).astype(U32)
        _, cf, cl, cpos = lax.sort(
            (key, first, last, li), num_keys=1, is_stable=True
        )
        cfq, clq = cf[:cap], cl[:cap]
        allq = lax.all_gather(jnp.stack([cfq, clq], axis=0), axis)  # [p,2,cap]
        qf = allq[:, 0].reshape(p * cap)
        ql = allq[:, 1].reshape(p * cap)
        ans_local = _answer_clamped(table, L, levels_loc, lo, qf, ql)
        ans = lax.pmin(ans_local, axis)  # [p*cap, 6]
        mine = lax.dynamic_slice(ans, (s * cap, 0), (cap, 6)).T  # [6, cap]
        rank = jnp.arange(L, dtype=I32)
        in_long = rank < jnp.minimum(n_long, cap)
        pad = jnp.full((L - cap,), _FBIG)
        cols_back = [
            jnp.where(in_long, jnp.concatenate([mine[k], pad]), _FBIG)
            for k in range(6)
        ]
        back = lax.sort(tuple([cpos] + cols_back), num_keys=1)
        long_cols = list(back[1:])
        int_packed = jnp.stack(
            [jnp.where(short, acc[k], long_cols[k]) for k in range(6)],
            axis=0,
        )
        overflow = lax.pmax((n_long > cap).astype(I32), axis) > 0

        # ---- links (apetrei layout, global ids) ----
        is_root = (first == 0) & (last == n - 1) & (gb < m)
        internal_is_right = psv_val > nsv_val
        nsv_link = last
        parent_internal = jnp.where(
            is_root, I32(-1),
            jnp.where(internal_is_right, psv, nsv_link),
        )
        # leaf j's parents need dlt[j-1]: one-left halo
        prv_d = lax.ppermute(
            dlt[-1:], axis, [(t, t + 1) for t in range(p - 1)] + [(p - 1, 0)]
        )[0]
        prv_d = jnp.where(s > 0, prv_d, I32(-1))
        ldl = jnp.concatenate([prv_d[None], dlt[:-1]])
        ldr = jnp.where(gb < m, dlt, -1)
        leaf_is_right = ldl > ldr
        parent_leaf = jnp.where(leaf_is_right, gb - 1, gb)
        left = jnp.where(lc >= 0, lc, m + gb)
        right = jnp.where(rc >= 0, rc, m + gb + 1)
        left = jnp.where(gb < m, left, -1)
        right = jnp.where(gb < m, right, -1)

        root_cand = jnp.min(jnp.where(is_root, gb, _BIG))
        root = lax.pmin(root_cand, axis)

        return (
            int_packed.T, leaf_cols.T, left, right, parent_internal,
            parent_leaf, leaf_prim, root, overflow,
        )

    out = _build(tris)
    return ShardedBvh2(*out)


def to_bvh2(sb: ShardedBvh2, n: int) -> Bvh2:
    """Assemble the standard replicated Bvh2 (node slots [0, 2n-2], leaves
    at [n-1, 2n-2], leaf.left = prim id — `TwoPassLbvhKernel.h:145-152`)."""
    m = n - 1
    int_packed = jnp.asarray(sb.int_packed)[:m]
    leaf_packed = jnp.asarray(sb.leaf_packed)
    packed_t = jnp.concatenate([int_packed, leaf_packed], axis=0).T
    left = jnp.concatenate(
        [jnp.asarray(sb.left)[:m], jnp.asarray(sb.leaf_prim)]
    )
    right = jnp.concatenate(
        [jnp.asarray(sb.right)[:m], jnp.full((n,), -1, I32)]
    )
    return Bvh2(
        packed_t=packed_t, left=left, right=right,
        root=jnp.asarray(sb.root),
    )
