"""Anchored-refit long-path table microbenchmark (winning variant).

This is the surviving variant "g" of a family of eight prototypes
(proto_refit3[..g], pruned per ADVICE r1) that timed table assemblies for
the long-node query in `refit.refit_anchored`. Measured losers on v5e,
262K leaves (for provenance, cited from refit.py):
  - full stacked fine table (all levels concatenated): ~0.55 ms extra
    concat bandwidth per build;
  - coarse table as a separate gather operand: XLA relayouts it into VMEM
    with ~13 ms of padded dynamic-update-slice copies;
  - per-level gather loops: ~2.8 ms (one random row-gather per level);
  - scatter-based long-node writeback: ~1.4 ms flat (TPU scatter floor).
Winner (below, now in production): fine level-4 row + block-16 coarse
lifting table assembled by one lane-major concat + transpose (a layout
bitcast), two-sort compaction for the long-node ride-back.
"""
from __future__ import annotations

import math
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from tpu_bvh.models import lbvh
from tpu_bvh.ops import radix_tree, refit
from tpu_bvh.utils import scenes

I32 = jnp.int32
BIG = jnp.float32(3.0e38)


def refit_anchored_v2g(leaf_min, leaf_max, first, last, radius: int = 16):
    """Two-level table: fine level-4 windows at the range ends + coarse
    (block=16) lifting table for the middle. Only ~12 MB is transposed into
    row-gather layout instead of the full stacked table."""
    n = leaf_min.shape[0]
    m = first.shape[0]
    i = jnp.arange(m, dtype=I32)
    packed = jnp.concatenate([leaf_min, -leaf_max], axis=1)  # [n, 6]

    short = (i - first < radius) & (last - i <= radius)

    # dense phase (unchanged)
    pad_t = jnp.full((6, radius), BIG)
    packed_t = jnp.concatenate([pad_t, packed.T, pad_t], axis=1)
    acc_t = jnp.full((6, m), BIG)
    for d in range(-radius + 1, radius + 1):
        shifted = lax.dynamic_slice(packed_t, (0, radius + d), (6, m))
        j = i + d
        valid = (j >= first) & (j <= last)
        acc_t = jnp.where(valid[None, :], jnp.minimum(acc_t, shifted), acc_t)

    # fine level-4 table: T4[i] = min over [i, min(i+16, n))
    pt = packed.T  # [6, n]
    cur = pt
    for k in range(1, 5):
        s = 1 << (k - 1)
        if s < n:
            shifted = jnp.concatenate(
                [cur[:, s:], jnp.broadcast_to(cur[:, -1:], (6, s))], axis=1
            )
            cur = jnp.minimum(cur, shifted)
    # coarse block table over block mins (block = 16), assembled into ONE
    # row table together with T4 so the .T lowers to a layout bitcast
    nb = (n + 15) // 16
    padn = nb * 16
    ptp = pt if padn == n else jnp.concatenate(
        [pt, jnp.full((6, padn - n), BIG)], axis=1
    )
    c0 = ptp.reshape(6, nb, 16).min(axis=2)
    levels_c = max(1, math.ceil(math.log2(max(nb, 2))))
    ctabs = [cur, c0]
    ccur = c0
    for k in range(1, levels_c + 1):
        s = 1 << (k - 1)
        if s < nb:
            shifted = jnp.concatenate(
                [ccur[:, s:], jnp.broadcast_to(ccur[:, -1:], (6, s))], axis=1
            )
            ccur = jnp.minimum(ccur, shifted)
        ctabs.append(ccur)
    table_rows = jnp.concatenate(ctabs, axis=1).T  # [n + (Lc+1)*nb, 6]
    t4_rows = table_rows

    cap = min(m, max(64, m // 12))
    n_long = jnp.sum((~short).astype(I32))

    def _floor_log2(x):
        return (31 - lax.clz(x.astype(jnp.uint32)).astype(I32)).astype(I32)

    def query(cf, cl):
        # ends
        u = jnp.minimum(t4_rows[cf], t4_rows[jnp.maximum(cl - 15, 0)])
        # middle blocks fully inside [cf, cl]
        bf = (cf + 15) >> 4
        bl = ((cl + 1) >> 4) - 1
        has_mid = bl >= bf
        bfs = jnp.minimum(bf, nb - 1)
        cnt = jnp.maximum(bl - bfs + 1, 1)
        kc = _floor_log2(cnt)
        b2 = jnp.maximum(bl - (1 << kc) + 1, 0)
        uc = jnp.minimum(table_rows[n + kc * nb + bfs], table_rows[n + kc * nb + b2])
        return jnp.minimum(u, jnp.where(has_mid[:, None], uc, BIG))

    def compact_path(_):
        key = short.astype(jnp.uint32)
        _, cf, cl, cpos = lax.sort(
            (key, first, last, i), num_keys=1, is_stable=True
        )
        ut = query(cf[:cap], cl[:cap]).T  # [6, cap]
        rank = jnp.arange(m, dtype=I32)
        in_long = rank < n_long
        pad = jnp.full((m - cap,), BIG)
        cols = [
            jnp.where(in_long, jnp.concatenate([ut[k], pad]), BIG)
            for k in range(6)
        ]
        back = lax.sort(tuple([cpos] + cols), num_keys=1)
        return list(back[1:])

    def full_path(_):
        ut = query(first, last).T
        return [ut[k] for k in range(6)]

    long_cols = lax.cond(n_long <= cap, compact_path, full_path, None)
    out_t = jnp.stack(
        [jnp.where(short, acc_t[k], long_cols[k]) for k in range(6)], axis=0
    )
    out = out_t.T
    return out[:, :3], -out[:, 3:]


def _t(f):
    t0 = time.perf_counter()
    jax.block_until_ready(f())
    return time.perf_counter() - t0


def slope(make_loop, k_lo=2, k_hi=12, reps=3):
    f_lo = jax.jit(make_loop(k_lo))
    f_hi = jax.jit(make_loop(k_hi))
    jax.block_until_ready(f_lo())
    jax.block_until_ready(f_hi())
    lo = min(_t(f_lo) for _ in range(reps))
    hi = min(_t(f_hi) for _ in range(reps))
    return (hi - lo) / (k_hi - k_lo) * 1e3


def main():
    tris_np = scenes.sponza_like(262_000)
    tris = jnp.asarray(tris_np)
    codes, leaf_min, leaf_max, leaf_prim = jax.jit(
        lambda t: lbvh._sorted_leaves_from_tris(t, True)
    )(tris)
    _, first0, last0, *_ = jax.jit(radix_tree._threshold_core)(codes)
    first0 = jax.block_until_ready(first0)

    # correctness
    mn1, mx1 = jax.jit(refit.refit_anchored)(leaf_min, leaf_max, first0, last0)
    mn2, mx2 = jax.jit(refit_anchored_v2g)(leaf_min, leaf_max, first0, last0)
    ok_mn = np.array_equal(np.asarray(mn1), np.asarray(mn2))
    ok_mx = np.array_equal(np.asarray(mx1), np.asarray(mx2))
    print("match:", ok_mn, ok_mx, flush=True)
    if not (ok_mn and ok_mx):
        bad = np.nonzero(~np.all(np.asarray(mn1) == np.asarray(mn2), axis=1))[0]
        print("first bad:", bad[:5], np.asarray(first0)[bad[:5]], np.asarray(last0)[bad[:5]])
        return

    def mk(fn):
        def make_loop(k):
            def run():
                def body(i, acc):
                    lm = leaf_min + i.astype(jnp.float32) * 1e-7
                    mn, mx = fn(lm, leaf_max, first0, last0)
                    return acc + mn[0, 0] + mx[0, 0]
                return lax.fori_loop(0, k, body, 0.0)
            return run
        return make_loop

    print(f"refit_anchored (cur)  {slope(mk(refit.refit_anchored)):8.3f} ms", flush=True)
    print(f"refit_anchored_v2g     {slope(mk(refit_anchored_v2g)):8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
