"""Micro-profile of refit_anchored internals on the real TPU."""
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


def _t(f):
    t0 = time.perf_counter()
    np.asarray(f())
    return time.perf_counter() - t0


def slope(make_loop, k_lo=2, k_hi=12, reps=3):
    f_lo = jax.jit(make_loop(k_lo))
    f_hi = jax.jit(make_loop(k_hi))
    np.asarray(f_lo())
    np.asarray(f_hi())
    lo = min(_t(f_lo) for _ in range(reps))
    hi = min(_t(f_hi) for _ in range(reps))
    return (hi - lo) / (k_hi - k_lo) * 1e3


def main():
    tris = jnp.asarray(scenes.sponza_like(262_000))
    codes, leaf_min, leaf_max, leaf_prim = jax.jit(
        lambda t: lbvh._sorted_leaves_from_tris(t, True)
    )(tris)
    _, first, last, *_ = jax.jit(radix_tree._threshold_core)(codes)
    leaf_min, leaf_max, first, last = jax.block_until_ready(
        (leaf_min, leaf_max, first, last)
    )
    n = leaf_min.shape[0]
    m = n - 1
    levels = max(1, math.ceil(math.log2(max(n, 2))))
    radius = 16

    def dense_phase(lm, lx):
        i = jnp.arange(m, dtype=I32)
        packed = jnp.concatenate([lm, -lx], axis=1)
        big = jnp.float32(3.0e38)
        pad_t = jnp.full((6, radius), big)
        packed_t = jnp.concatenate([pad_t, packed.T, pad_t], axis=1)
        acc_t = jnp.full((6, m), big)
        for d in range(-radius + 1, radius + 1):
            shifted = lax.dynamic_slice(packed_t, (0, radius + d), (6, m))
            j = i + d
            valid = (j >= first) & (j <= last)
            acc_t = jnp.where(valid[None, :], jnp.minimum(acc_t, shifted), acc_t)
        return acc_t

    def table_lane_major(lm, lx):
        packed_t = jnp.concatenate([lm, -lx], axis=1).T
        tabs = [packed_t]
        cur = packed_t
        for k in range(1, levels + 1):
            s = 1 << (k - 1)
            if s < n:
                shifted = jnp.concatenate(
                    [cur[:, s:], jnp.broadcast_to(cur[:, -1:], (6, s))], axis=1
                )
                cur = jnp.minimum(cur, shifted)
            tabs.append(cur)
        return jnp.concatenate(tabs, axis=1)

    cases = {}

    def mk(f):
        def make_loop(k):
            def run():
                def body(i, acc):
                    lm = leaf_min + i.astype(jnp.float32) * 1e-7
                    out = f(lm, leaf_max)
                    return acc + out.reshape(-1)[0]
                return lax.fori_loop(0, k, body, 0.0)
            return run
        return make_loop

    cases["A dense_anchored(R=16)"] = mk(dense_phase)
    cases["B table_build[6,19n]"] = mk(table_lane_major)
    cases["C table+transpose"] = mk(lambda lm, lx: table_lane_major(lm, lx).T)

    def compact_path(lm, lx):
        table = table_lane_major(lm, lx).T
        i = jnp.arange(m, dtype=I32)
        short = (i - first < radius) & (last - i <= radius)
        big = jnp.float32(3.0e38)
        cap = min(m, max(64, m // 3))
        n_long = jnp.sum((~short).astype(I32))
        key = short.astype(jnp.uint32)
        _, cf, cl, cpos = lax.sort((key, first, last, i), num_keys=1, is_stable=True)
        sel_f = cf[:cap]
        sel_l = cl[:cap]
        sel_pos = cpos[:cap]
        u = refit._query_table(table, n, sel_f, sel_l)
        rank = jnp.arange(cap, dtype=I32)
        tgt = jnp.where(rank < n_long, sel_pos, m)
        return jnp.full((m, 6), big).at[tgt].set(u, mode="drop")

    cases["D table+compact(cap=m/3)"] = mk(compact_path)

    def compact_small(lm, lx, cap):
        table = table_lane_major(lm, lx).T
        i = jnp.arange(m, dtype=I32)
        short = (i - first < radius) & (last - i <= radius)
        big = jnp.float32(3.0e38)
        n_long = jnp.sum((~short).astype(I32))
        key = short.astype(jnp.uint32)
        _, cf, cl, cpos = lax.sort((key, first, last, i), num_keys=1, is_stable=True)
        u = refit._query_table(table, n, cf[:cap], cl[:cap])
        rank = jnp.arange(cap, dtype=I32)
        tgt = jnp.where(rank < n_long, cpos[:cap], m)
        return jnp.full((m, 6), big).at[tgt].set(u, mode="drop")

    cases["E table+compact(cap=m/8)"] = mk(lambda a, b: compact_small(a, b, m // 8))

    def sort_only(lm, lx):
        i = jnp.arange(m, dtype=I32)
        short = (i - first < radius) & (last - i <= radius) & (lm[0, 0] < 1e30)
        key = short.astype(jnp.uint32)
        out = lax.sort((key, first, last, i), num_keys=1, is_stable=True)
        return out[1].astype(jnp.float32)[:, None]

    cases["F compact sort only"] = mk(sort_only)

    def full_refit(lm, lx):
        mn, mx = refit.refit_anchored(lm, lx, first, last)
        return mn

    cases["G refit_anchored full"] = mk(full_refit)

    def ranges_refit(lm, lx):
        mn, mx = refit.refit_ranges(lm, lx, first, last)
        return mn

    cases["H refit_ranges(2 full gathers)"] = mk(ranges_refit)

    only = sys.argv[1:] if len(sys.argv) > 1 else None
    for name, mkl in cases.items():
        if only and not any(s in name for s in only):
            continue
        try:
            ms = slope(mkl)
            print(f"{name:34s} {ms:8.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:34s} FAILED: {type(e).__name__} {str(e)[:120]}", flush=True)

    nl = int(jnp.sum((jnp.arange(m) - first >= radius) | (last - jnp.arange(m) > radius)))
    print(f"n_long(R=16) = {nl} of {m}", flush=True)


if __name__ == "__main__":
    main()
