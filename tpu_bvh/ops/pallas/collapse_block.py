"""Blocked Pallas kernel for the fast BVH2->BVH4 collapse (LBVH trees).

Implements the local phases of the analytic collapse derivation
(`ops/collapse_analytic.py`, the executable spec) for SHORT nodes — those
whose leaf range length is <= S_LEN — exploiting the boundary (split
position) layout of the single-pass LBVH: node i lives at boundary i inside
its own leaf range [first_i, last_i], so

  * every descendant boundary of a short node is within +-(S_LEN-2) lanes,
  * every leaf of its range is within +-(S_LEN-1) lanes,
  * its parent boundary is adjacent to its range: within +-S_LEN lanes,
  * all its short ancestors contain boundary i: within +-(S_LEN-2) lanes.

Everything the reference's persistent task-queue kernel
(`/root/reference/src/TwoPassLbvhKernel.h:237-337`) discovers by chasing
global pointers through HBM therefore becomes bounded-offset shift sweeps
over VMEM-resident blocks (a random gather costs ~7 ns/row on v5e — ~1.9 ms
per full-array access — while a [8, blk] shift+select is ~7 ns total).

Phases, all in one kernel pass. Every [1, s]-valued pull runs STRIP-FOLDED
(`_folded_cross_pull`): the row is resliced into 8 overlapping sublane
strips so each tap costs ~6 vregs instead of ~s/128, and targets of the
same pull share one value roll per tap.
  1. expansion tables: simulate the two largest-area-child expansions for
     every short node (folded (area,left,right) x (l,r) cross pulls),
     byte-exact oracle semantics (first-max argmax, strict area > 0, f32
     areas compared as i32 bits).
  2. state resolution: every node is WIDE / E1 (absorbed as some wide
     ancestor's first expansion) / E2 (second). 3-state transition tables
     compose along parent chains by pointer doubling; chains terminate at
     XLA-seeded lanes (coarse nodes + children of coarse nodes), so all
     pulls stay within +-64 lanes. e2-at-grandparent is a TWO-HOP pull
     (e2_full at parent via the folded parent sweep, then that row pulled
     at parent again) instead of a +-(2*S_LEN+1)-tap direct sweep.
  3. ownership: wide node X's final slots claim their nodes/leaves; each
     node finds its wide parent via three folded chain pulls of the packed
     (parent, state) row (coarse claims are scattered in by the XLA side
     afterwards).
  4. slot AABB emission: one +-S_LEN pull of the node/leaf packed rows at
     the four final slot ids (true [8, s] values — not foldable).

Seeds, coarse expansion tables, and coarse emission come from
`ops/collapse_fast.py` (the coarse set is ancestor-closed and ~4% of nodes
at S_LEN=33, measured on sponza-scale Morton trees; max local chain 10-12
hops, guaranteed <= S_LEN, covered by 6 doubling trips).

Input layout (lane-major i32, lanes = boundaries; lane j also carries leaf j):
  meta [8, W]: 0 area bits (f32>=0, i32-comparable), 1 left, 2 right,
               3 parent, 4 packed (seed state << 23 | coarse e2 + 1;
               state 3 = unseeded), 5 short flag, 6 own_parent + 1 at
               seed lanes (nearest wide ancestor of the seed's parent;
               0 = none), 7 leaf lane j's bvh2 parent
  node8 [8, W]: rows 0..5 = node packed (min xyz, -max xyz) f32 bits
  leaf8 [8, W]: rows 0..5 = leaf packed, leaf j at column j

Outputs (i32):
  outm [8, W]: 0..3 final slot ids (bvh4 child encoding: internal id < m,
               leaf slot m + j; -1 empty / not a short wide node),
               4 count (0 unless short wide), 5 state (0/1/2),
               6 wide parent claim (-1 none), 7 leaf claim for leaf lane j
  outa0..3 [8, W]: rows 0..5 slot-k packed bits (valid where emitted)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32

import os

# short node: leaf-range length <= S_LEN. Every kernel sweep window scales
# with S_LEN; the XLA coarse crown (and its gather/scatter cost) scales
# with ~2n/S_LEN. Env-tunable for perf sweeps; any value is byte-exact
# (the short/coarse split is a work partition, not a semantic one).
S_LEN = int(os.environ.get("TBVH_COLLAPSE_SLEN", "33"))
assert 9 <= S_LEN <= 33, "windows derived from S_LEN must fit the halos"

_H = 256  # block halo; >= ownership(33) + state reach (64 + 100)
# blk + 2*_H -> 128-aligned sublane strips; sized so the kernel's live
# [8, s] intermediates fit VMEM (tunable for experiments). Valid values
# keep (blk + 2*_H) / 8 a multiple of 128 (strip view starts must stay
# lane-aligned, see _HS): 1536, 3584, 5632, 7680, ...
_BLK = int(os.environ.get("TBVH_COLLAPSE_BLK", "3584"))
_DW = S_LEN  # child/leaf pull window
_NOMATCH = -(2**30)  # label no target can equal

_WIDE, _E1, _E2, _UNK = 0, 1, 2, 3
_CONST_TBL = 0b010101  # multiplier: state s -> table (s, s, s)
# Doubling pull reach: every ptr in the chain is a short ancestor of the
# lane (or its seeded terminal, a child-of-coarse SHORT node), and a short
# node's range contains its own boundary, so |ptr - lane| <= S_LEN + 2.
# The transitive dependency cone of a lane is its ancestor set — also
# within +-(S_LEN + 2) — so the strip halo only needs to cover one reach.
_DP = S_LEN + 3  # doubling pull window
_HS = 128  # strip halo: >= _DP, AND a multiple of 128 so strip view
# starts stay lane-aligned (Mosaic cannot concat rows at offset 64)


def _sh(t, d):
    """t[:, i + d] with wraparound (wrapped columns never match labels)."""
    if d == 0:
        return t
    return pltpu.roll(t, (t.shape[1] - d) % t.shape[1], axis=1)


def _strip_starts(s):
    """Static view starts for 8 overlapping sublane strips over [0, s).
    Strip r owns columns [r*c, (r+1)*c) and views [start, start + c + 2h);
    edge strips clamp the view into range (their un-viewable columns are
    block halo, never block-center output)."""
    c = s // 8
    w = c + 2 * _HS
    return [min(max(r * c - _HS, 0), s - w) for r in range(8)], c, w


def _strip_fold(v, s):
    """[1, s] -> [8, c + 2h] overlapping sublane strips."""
    starts, _, w = _strip_starts(s)
    rows = [v[0:1, st : st + w] for st in starts]
    return jnp.concatenate(rows, axis=0)


def _strip_unfold(t, s):
    """Inverse of `_strip_fold` for each strip's owned columns. Each strip
    row is sublane-rolled to row 0 first: Mosaic cannot lane-concat pieces
    whose sublane offsets differ."""
    starts, c, _ = _strip_starts(s)
    rows = []
    for r, st in enumerate(starts):
        tr = pltpu.roll(t, (8 - r) % 8, axis=0) if r else t
        rows.append(tr[0:1, r * c - st : r * c - st + c])
    return jnp.concatenate(rows, axis=1)


# perf-isolation bitmask (tools/ only): 1 sweeps, 2 aabb, 4 own, 8 states
_PARTS = int(os.environ.get("TBVH_COLLAPSE_PARTS", "15"))


def _folded_cross_pull(values, targets, lane, s, lo, hi):
    """Strip-folded stencil pull of each value row at each target row.

    values/targets: [1, s] rows (targets pre-filtered to absolute lane ids,
    _NOMATCH elsewhere). Returns accs[i][j] = values[i] at targets[j]
    ([1, s], -1 where unmatched). All pulls must stay within [lo, hi] of
    the lane, |lo|,|hi| <= _HS (the strip halo), same argument as the
    pointer-doubling fold. Cost per tap: V rolls + T compares + V*T
    selects on [8, c+2h] strips (~6 vregs) instead of [8, s] (~s/128)."""
    vf = [_strip_fold(v, s) for v in values]
    tf = [_strip_fold(t, s) for t in targets]
    sl = _strip_fold(lane, s)
    accs = [[jnp.full_like(vf[0], -1) for _ in targets] for _ in values]
    for d in range(lo, hi + 1):
        vs = [_sh(v, d) for v in vf]
        ms = [t == sl + d for t in tf]
        for i in range(len(values)):
            for j in range(len(targets)):
                accs[i][j] = jnp.where(ms[j], vs[i], accs[i][j])
    return [[_strip_unfold(a, s) for a in row] for row in accs]


def _kernel(meta_l, meta_m, meta_r, node_l, node_m, node_r,
            leaf_l, leaf_m, leaf_r, carr_m, outm, outa0, outa1, outa2,
            outa3, *, blk: int, m: int, n_trips: int):
    cat = lambda a, b, c: jnp.concatenate(
        [a[:, blk - _H :], b[:], c[:, :_H]], axis=1
    )
    meta = cat(meta_l, meta_m, meta_r)  # i32[8, s]
    node8 = cat(node_l, node_m, node_r)
    leaf8 = cat(leaf_l, leaf_m, leaf_r)
    s = meta.shape[1]

    base = pl.program_id(0) * blk - _H
    lane = base + lax.broadcasted_iota(I32, (1, s), 1)
    area = meta[0:1, :]
    left = meta[1:2, :]
    right = meta[2:3, :]
    parent = meta[3:4, :]
    packed4 = meta[4:5, :]  # seed state << 23 | coarse e2 + 1
    seed = packed4 >> 23
    e2in = (packed4 & ((1 << 23) - 1)) - 1
    shortf = meta[5:6, :]
    ownp1 = meta[6:7, :]  # own_parent + 1 at seed lanes (0 = none)
    own_in = ownp1 - 1
    has_own = ownp1 > 0
    is_int = (lane >= 0) & (lane < m)
    shortv = (shortf == 1) & is_int

    neg1 = jnp.full((1, s), -1, I32)
    zeros1 = jnp.zeros((1, s), I32)

    # ---- sweep 1: (area, left, right) at targets l, r (strip-folded) ----
    def meta_sweep(t_a, t_b):
        """Pull rows (area,left,right) of meta at internal targets t_a, t_b.
        Returns [8, s]: rows 0..2 = values at t_a, rows 3..5 at t_b."""
        ta = jnp.where((t_a >= 0) & (t_a < m), t_a, _NOMATCH)
        tb = jnp.where((t_b >= 0) & (t_b < m), t_b, _NOMATCH)
        r = _folded_cross_pull(
            [area, left, right], [ta, tb], lane, s, -_DW, _DW
        )
        return jnp.concatenate(
            [r[0][0], r[1][0], r[2][0], r[0][1], r[1][1], r[2][1],
             jnp.full((2, s), -1, I32)],
            axis=0,
        )

    if not (_PARTS & 1):
        z1 = jnp.zeros((1, s), I32)
        z8 = jnp.zeros((8, s), I32)
        outm[:] = jnp.concatenate([lane + meta[0:1], meta[1:2], meta[2:3],
                                   meta[3:4], meta[4:5], meta[5:6],
                                   meta[6:7], meta[7:8]], 0)[:, _H:_H+blk]
        for ref in (outa0, outa1, outa2, outa3):
            ref[:] = (node8 + leaf8)[:, _H:_H+blk]
        return

    acc1 = meta_sweep(left, right)
    aL, lL, rL = acc1[0:1], acc1[1:2], acc1[2:3]
    aR, lR, rR = acc1[3:4], acc1[4:5], acc1[5:6]

    # slot tuples: (id, area code, lch, rch); area code -1 for leaf slots
    def acode(t_id, a):
        return jnp.where((t_id >= 0) & (t_id < m), a, -1)

    s_id = [left, right, neg1, neg1]
    s_ac = [acode(left, aL), acode(right, aR), neg1, neg1]
    s_lc = [lL, lR, neg1, neg1]
    s_rc = [rL, rR, neg1, neg1]

    # ---- expansion step 1 (oracle semantics: first max, strict > 0) ----
    best1 = jnp.maximum(s_ac[0], s_ac[1])
    pos1 = (s_ac[1] > s_ac[0]).astype(I32)  # first max wins ties
    do1 = (best1 > 0) & shortv
    e1 = jnp.where(pos1 == 1, s_id[1], s_id[0])
    c1l = jnp.where(pos1 == 1, s_lc[1], s_lc[0])
    c1r = jnp.where(pos1 == 1, s_rc[1], s_rc[0])

    # ---- sweep 2: (area, left, right) at c1l, c1r ----
    acc2 = meta_sweep(jnp.where(do1, c1l, _NOMATCH),
                      jnp.where(do1, c1r, _NOMATCH))
    aCL, lCL, rCL = acc2[0:1], acc2[1:2], acc2[2:3]
    aCR, lCR, rCR = acc2[3:4], acc2[4:5], acc2[5:6]

    def upd(cur, new, mask):
        return [jnp.where(mask, nv, cv) for cv, nv in zip(cur, new)]

    # apply step 1: slot[pos1] <- c1l, slot[2] <- c1r
    for k in range(2):
        mk = do1 & (pos1 == k)
        s_id[k], s_ac[k], s_lc[k], s_rc[k] = upd(
            (s_id[k], s_ac[k], s_lc[k], s_rc[k]),
            (c1l, acode(c1l, aCL), lCL, rCL), mk)
    s_id[2], s_ac[2], s_lc[2], s_rc[2] = upd(
        (s_id[2], s_ac[2], s_lc[2], s_rc[2]),
        (c1r, acode(c1r, aCR), lCR, rCR), do1)
    count1 = 2 + do1.astype(I32)

    # ---- expansion step 2 over slots 0..2 in slot order ----
    best2 = jnp.maximum(jnp.maximum(s_ac[0], s_ac[1]), s_ac[2])
    pos2 = jnp.where(
        s_ac[0] == best2, 0, jnp.where(s_ac[1] == best2, 1, 2)
    ).astype(I32)
    do2 = (best2 > 0) & shortv
    pick = lambda vs: jnp.where(
        pos2 == 0, vs[0], jnp.where(pos2 == 1, vs[1], vs[2])
    )
    e2 = pick(s_id)
    c2l = pick(s_lc)
    c2r = pick(s_rc)

    # apply step 2: slot[pos2] <- c2l, slot[count1] <- c2r
    for k in range(3):
        mk = do2 & (pos2 == k)
        s_id[k] = jnp.where(mk, c2l, s_id[k])
    for k in range(2, 4):
        mk = do2 & (count1 == k)
        s_id[k] = jnp.where(mk, c2r, s_id[k])
    count2 = count1 + do2.astype(I32)
    e1_out = jnp.where(do1, e1, -1)
    e2_out = jnp.where(do2, e2, -1)

    # ---- states: transition tables + strip-folded pointer doubling ----
    # table per unseeded lane from (e1, e2) of parent and e2 of grandparent
    do_states = bool(_PARTS & 8)
    e2_full = jnp.where(shortv, e2_out, e2in)
    tpar = jnp.where((parent >= 0) & (parent < m), parent, _NOMATCH)
    e1p = e2p = e2fp = neg1
    if do_states:
        rp = _folded_cross_pull(
            [e1_out, e2_out, e2_full], [tpar], lane, s,
            -S_LEN - 1, S_LEN + 1,
        )
        e1p, e2p = rp[0][0], rp[1][0]
        e2fp = rp[2][0]  # e2_full at parent: e2fp[j] = e2_full[parent(j)]

    # e2 at grandparent, TWO-HOP: e2g[i] = e2fp[parent(i)] =
    # e2_full[parent(parent(i))]. The inner hop (accp row 3) is valid at
    # every SHORT lane (its parent is within the accp window; the value
    # array e2_full carries XLA-filled rows for coarse grandparents), and
    # every UNSEEDED lane's parent is short (a coarse parent would make the
    # lane a seeded child-of-coarse, where fenc is overridden below) — so
    # the hop composition is exact wherever t_e1 is consumed. This replaces
    # a +-(2*S_LEN+1)-tap direct sweep with one strip-folded +-_DP pull.
    e2g = neg1
    if do_states:
        e2g = _folded_cross_pull([e2fp], [tpar], lane, s, -_DP, _DP)[0][0]

    t_wide = jnp.where(lane == e1p, _E1, jnp.where(lane == e2p, _E2, _WIDE))
    t_e1 = jnp.where(lane == e2g, _E2, _WIDE)
    fenc = t_wide | (t_e1 << 2)  # f(E2) = WIDE = 0 bits

    seeded = (seed <= 2) | (parent < 0)
    seed_eff = jnp.where(seed <= 2, seed, _WIDE)
    fenc = jnp.where(seeded, seed_eff * _CONST_TBL, fenc)
    safe_lane = jnp.clip(lane, 0, m - 1)
    ptr = jnp.where(seeded, safe_lane, jnp.where(is_int, parent, safe_lane))

    # strip-folded doubling: packed = ptr * 64 | fenc (ptr < 2^22)
    packed = ptr * 64 + fenc
    pk8 = _strip_fold(packed, s)
    slane = _strip_fold(lane, s)

    def apply_tbl(tbl, x):
        return (tbl >> (2 * x)) & 3

    for _ in range(n_trips if do_states else 0):
        tptr = pk8 >> 6  # pulls: |ptr - lane| <= _DP by construction
        pulled = jnp.full_like(pk8, -1)
        for d in range(-_DP, _DP + 1):
            pulled = jnp.where(tptr == slane + d, _sh(pk8, d), pulled)
        # unmatched (shouldn't happen for in-range lanes): keep self
        pulled = jnp.where(pulled < 0, pk8, pulled)
        fp = pulled & 63
        f = pk8 & 63
        nf = (
            apply_tbl(f, apply_tbl(fp, 0))
            | (apply_tbl(f, apply_tbl(fp, 1)) << 2)
            | (apply_tbl(f, apply_tbl(fp, 2)) << 4)
        )
        pk8 = (pulled & ~jnp.int32(63)) | nf
    packed = _strip_unfold(pk8, s)
    state = packed & 3  # = f(WIDE at the chain's seed)
    is_wide = (state == _WIDE) & shortv

    # ---- ownership via the wide-ancestor chain ----
    # A slot's owner is its nearest WIDE proper ancestor, and expansion
    # reaches at most 2 levels below a wide node, so the owner of node i
    # (resp. leaf j) is the first WIDE among {p, gp, ggp} (its parent
    # chain). Chains only walk SHORT non-seed ancestors (any short node
    # whose parent is coarse is a seeded child-of-coarse), and short
    # ancestors contain the lane's boundary => every hop stays within
    # +-(S_LEN + 2) lanes. Chains TERMINATE at seed lanes, whose packed
    # value encodes the final answer directly: own_inc(x) = x if x is
    # wide, else own_parent(x) (the XLA-routed nearest-wide-ancestor of
    # the seed's parent) — tag 3 marks the terminal. Three stacked
    # (claim*4 | tag) pulls replace the 67-offset slot-matching sweep.
    # (value + 1) so the root's packed value stays non-negative.
    term_claim = jnp.where(state == _WIDE, lane, own_in)
    pk_row = jnp.where(
        is_int & has_own,
        (term_claim + 1) * 4 + 3,
        jnp.where(is_int, (parent + 1) * 4 + jnp.minimum(state, 2), -1),
    )
    leafp = meta[7:8, :]  # leaf lane j's bvh2 parent (boundary j-1 or j)

    claim_int = jnp.full((1, s), -1, I32)
    claim_leaf = jnp.full((1, s), -1, I32)
    if _PARTS & 4:
        # strip-folded pulls of the packed (parent*4|state) row: chain hops
        # stay within +-_DP (claimers are short ancestors), so the same
        # fold/halo argument as the doubling applies, at [8, c+2h] cost
        # per op instead of [8, s] — and the two targets of each hop share
        # one value roll per tap.
        def chain_pull(t_a, t_b=None):
            """packed (parent*4|state) at internal targets t_a[, t_b]."""
            ts = [t_a] if t_b is None else [t_a, t_b]
            ts = [jnp.where((t >= 0) & (t < m), t, _NOMATCH) for t in ts]
            r = _folded_cross_pull([pk_row], ts, lane, s, -_DP, _DP)[0]
            return (r[0], None) if t_b is None else (r[0], r[1])

        dec = lambda pk: jnp.where(pk >= 0, (pk >> 2) - 1, -1)
        # leaf lane j's parent q is boundary j-1 or j: a 2-way shift
        pk_q = jnp.where(
            leafp == lane, pk_row, jnp.where(leafp == lane - 1,
                                             _sh(pk_row, -1), -1)
        )
        pq = dec(pk_q)
        pk_p, pk_pq = chain_pull(parent, pq)
        # dec() doubles as the next hop target AND, at a seed terminal
        # (tag 3), the final claim id. Feeding a terminal's decoded claim
        # back into chain_pull is safe by construction: first_wide scans
        # candidates in REVERSED order so the nearer terminal overrides
        # anything pulled beyond it, and an out-of-window pull returns -1
        # (never a spurious wide hit).
        gp = dec(pk_p)
        gpq = dec(pk_pq)
        pk_gp, pk_gpq = chain_pull(gp, gpq)
        ggp = dec(pk_gp)
        pk_ggp, _ = chain_pull(ggp)

        def first_wide(cands):
            c = jnp.full((1, s), -1, I32)
            for t, pk in reversed(cands):
                hit_w = (pk >= 0) & ((pk & 3) == _WIDE)
                hit_t = (pk >= 0) & ((pk & 3) == 3)  # seed terminal
                c = jnp.where(hit_w, t, jnp.where(hit_t, (pk >> 2) - 1, c))
            return c

        claim_int = jnp.where(
            is_wide & (parent >= 0),
            # a seeded wide lane's claimer is own_parent directly (its
            # parent may be a far-away coarse node, outside every window)
            jnp.where(
                has_own,
                own_in,
                first_wide([(parent, pk_p), (gp, pk_gp), (ggp, pk_ggp)]),
            ),
            claim_int,
        )
        is_leaf_lane = (lane >= 0) & (lane < m + 1)  # leaf j at column j
        claim_leaf = jnp.where(
            is_leaf_lane & (leafp >= 0),
            first_wide([(leafp, pk_q), (pq, pk_pq), (gpq, pk_gpq)]),
            claim_leaf,
        )

    # ---- slot AABB pull at the final slot ids ----
    ab = [jnp.zeros((8, s), I32) for _ in range(4)]
    do_aabb = bool(_PARTS & 2)
    ti = jnp.concatenate(
        [jnp.where((sid >= 0) & (sid < m), sid, _NOMATCH) for sid in s_id]
        + [jnp.where(sid >= m, sid - m, _NOMATCH) for sid in s_id],
        axis=0,
    )
    for d in (range(-_DW, _DW + 1) if do_aabb else ()):
        match = ti == lane + d  # [8, s]: rows 0..3 node hits, 4..7 leaf
        nT = _sh(node8, d)
        lT = _sh(leaf8, d)
        for k in range(4):
            ab[k] = jnp.where(match[k : k + 1, :], nT, ab[k])
            ab[k] = jnp.where(match[k + 4 : k + 5, :], lT, ab[k])

    # ---- outputs, with coarse pass-through emission ----
    # `carr_m` carries the XLA coarse stage's own emission as dense center
    # rows (0-3 slots, 4 count, 5 coarse-wide flag, 6-29 slot AABB bits):
    # selecting it at flagged lanes here replaces the old post-kernel merge
    # routing entirely. Claims at coarse-wide lanes are own_parent (`own_in`
    # row), the nearest wide strict ancestor the XLA side routed in.
    emit = is_wide
    ctr = lambda t: t[:, _H : _H + blk]
    cw = carr_m[5:6, :] == 1
    slot_rows = [
        jnp.where(cw, carr_m[k : k + 1, :],
                  ctr(jnp.where(emit, sid, -1)))
        for k, sid in enumerate(s_id)
    ]
    outm_full = jnp.concatenate(
        slot_rows
        + [
            jnp.where(cw, carr_m[4:5, :], ctr(jnp.where(emit, count2, 0))),
            ctr(jnp.where(is_int, state, _UNK)),
            jnp.where(cw, ctr(own_in), ctr(claim_int)),
            ctr(claim_leaf),
        ],
        axis=0,
    )
    outm[:] = outm_full
    zeros2b = jnp.zeros((2, blk), I32)
    for k, ref in enumerate((outa0, outa1, outa2, outa3)):
        c_ab = jnp.concatenate(
            [carr_m[6 + 6 * k : 12 + 6 * k, :], zeros2b], axis=0
        )
        ref[:] = jnp.where(cw, c_ab, ctr(jnp.where(emit, ab[k], 0)))


def collapse_block_pallas(meta, node8, leaf8, carr, m: int,
                          n_trips: int | None = None,
                          interpret: bool = False):
    """meta/node8/leaf8: i32[8, W]; carr: i32[32, W] coarse-output rows
    (layouts in module doc; W >= m + 1).
    Returns (outm i32[8, W], outa list of 4 i32[8, W])."""
    if n_trips is None:
        # doubling must cover the longest short chain (<= S_LEN + 2 hops)
        n_trips = max(3, (S_LEN + 2).bit_length())
    W = meta.shape[1]
    blk = min(_BLK, -(-W // 256) * 256)
    blk = max(blk, 512)
    pad = (-W) % blk
    if pad:
        padm = jnp.zeros((8, pad), I32)
        padm = padm.at[1:4].set(-1)  # left/right/parent invalid
        padm = padm.at[4].set(_UNK << 23)  # unseeded, e2 = -1
        meta = jnp.concatenate([meta, padm], axis=1)
        node8 = jnp.concatenate([node8, jnp.zeros((8, pad), I32)], axis=1)
        leaf8 = jnp.concatenate([leaf8, jnp.zeros((8, pad), I32)], axis=1)
        padc = jnp.zeros((32, pad), I32).at[0:4].set(-1)
        carr = jnp.concatenate([carr, padc], axis=1)
    Wp = meta.shape[1]
    grid = Wp // blk
    clamp = lambda i: jnp.clip(i, 0, grid - 1)
    specs = [
        pl.BlockSpec((8, blk), lambda i: (0, clamp(i - 1))),
        pl.BlockSpec((8, blk), lambda i: (0, i)),
        pl.BlockSpec((8, blk), lambda i: (0, clamp(i + 1))),
    ]
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        )
    outm, a0, a1, a2, a3 = pl.pallas_call(
        functools.partial(_kernel, blk=blk, m=m, n_trips=n_trips),
        grid=(grid,),
        in_specs=specs * 3 + [pl.BlockSpec((32, blk), lambda i: (0, i))],
        out_specs=[pl.BlockSpec((8, blk), lambda i: (0, i))] * 5,
        out_shape=[jax.ShapeDtypeStruct((8, Wp), I32)] * 5,
        interpret=interpret,
        **kwargs,
    )(meta, meta, meta, node8, node8, node8, leaf8, leaf8, leaf8, carr)
    return outm[:, :W], [a0[:, :W], a1[:, :W], a2[:, :W], a3[:, :W]]
