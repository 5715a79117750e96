"""Microbench: alternatives for the refit long-node table query.

Candidates:
  A. current: lane-major table build + transpose + 2 row-gathers [cap, 6]
  B. no transpose: 12 x 1-D take from [L*n] component vectors
  C. packed-sort compaction (u32 flag<<22|idx single-key sort) vs 4-col sort
  D. sort-back cost alone
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
    dlt0, first0, last0, *_ = jax.jit(radix_tree._threshold_core)(codes)
    first0 = jax.block_until_ready(first0)
    n = int(codes.shape[0])
    m = n - 1
    radius = 16
    levels = max(1, math.ceil(math.log2(max(n, 2))))
    min_level = min(max(0, math.floor(math.log2(radius + 2))), levels)
    cap = min(m, max(64, m // 12))
    idx = np.random.default_rng(0).integers(0, (levels + 1 - min_level) * n, size=(2, cap))
    idx = jnp.asarray(idx, dtype=I32)

    results = {}

    def mk_table_T(k):
        def run():
            def body(i, acc):
                lm = leaf_min + i.astype(jnp.float32) * 1e-7
                tab = refit._build_table(lm, leaf_max, levels, min_level)
                return acc + tab[0, 0]
            return lax.fori_loop(0, k, body, 0.0)
        return run

    results["table build + transpose (cur)"] = mk_table_T

    def mk_table_noT_take(k):
        def run():
            def body(i, acc):
                lm = leaf_min + i.astype(jnp.float32) * 1e-7
                # lane-major build, no transpose
                packed_t = jnp.concatenate([lm, -leaf_max], axis=1).T
                tabs = []
                cur = packed_t
                for kk in range(1, levels + 1):
                    s = 1 << (kk - 1)
                    if s < n:
                        shifted = jnp.concatenate(
                            [cur[:, s:], jnp.broadcast_to(cur[:, -1:], (6, s))],
                            axis=1,
                        )
                        cur = jnp.minimum(cur, shifted)
                    if kk >= min_level:
                        tabs.append(cur)
                table_t = jnp.concatenate(tabs, axis=1)  # [6, L*n]
                acc2 = acc
                for c in range(6):
                    g = jnp.minimum(
                        jnp.take(table_t[c], idx[0], indices_are_sorted=False),
                        jnp.take(table_t[c], idx[1], indices_are_sorted=False),
                    )
                    acc2 = acc2 + g[0]
                return acc2
            return lax.fori_loop(0, k, body, 0.0)
        return run

    results["table noT + 12x 1-D take"] = mk_table_noT_take

    def mk_rowgather(k):
        tab = jax.jit(
            lambda lm: refit._build_table(lm, leaf_max, levels, min_level)
        )(leaf_min)
        tab = jax.block_until_ready(tab)

        def run():
            def body(i, acc):
                u = jnp.minimum(tab[idx[0] + i], tab[idx[1]])
                return acc + u[0, 0]
            return lax.fori_loop(0, k, body, 0.0)
        return run

    results["2 row-gathers [cap,6] only"] = mk_rowgather

    def mk_take_only(k):
        tabs_c = jax.jit(
            lambda lm: jnp.concatenate([lm, -leaf_max], axis=1).T
        )(leaf_min)
        big_t = jnp.tile(tabs_c, (1, levels + 1 - min_level))
        big_t = jax.block_until_ready(big_t)

        def run():
            def body(i, acc):
                acc2 = acc
                for c in range(6):
                    g = jnp.minimum(
                        jnp.take(big_t[c], idx[0] + i),
                        jnp.take(big_t[c], idx[1]),
                    )
                    acc2 = acc2 + g[0]
                return acc2
            return lax.fori_loop(0, k, body, 0.0)
        return run

    results["12x 1-D take only"] = mk_take_only

    # compaction sort variants
    short = np.zeros(m, dtype=bool)
    short[np.random.default_rng(1).permutation(m)[: m - 15833]] = True
    short_j = jnp.asarray(short)
    f0, l0 = first0, last0

    def mk_sort4(k):
        i_arr = jnp.arange(m, dtype=I32)

        def run():
            def body(i, acc):
                key = short_j.astype(jnp.uint32) + i.astype(jnp.uint32) * 0
                _, cf, cl, cpos = lax.sort((key, f0, l0, i_arr), num_keys=1, is_stable=True)
                return acc + cf[0].astype(jnp.float32) + cpos[0].astype(jnp.float32)
            return lax.fori_loop(0, k, body, 0.0)
        return run

    results["compact sort 4-col (cur)"] = mk_sort4

    def mk_sort_packed(k):
        i_arr = jnp.arange(m, dtype=jnp.uint32)

        def run():
            def body(i, acc):
                key = (short_j.astype(jnp.uint32) << 22) | (i_arr + 0 * i.astype(jnp.uint32))
                s = lax.sort(key)
                cidx = (s & ((1 << 22) - 1)).astype(I32)
                cf = jnp.take(f0, cidx[:cap])
                cl = jnp.take(l0, cidx[:cap])
                return acc + cf[0].astype(jnp.float32) + cl[0].astype(jnp.float32)
            return lax.fori_loop(0, k, body, 0.0)
        return run

    results["compact packed-u32 sort + 2 take"] = mk_sort_packed

    def mk_sortback(k):
        i_arr = jnp.arange(m, dtype=I32)
        cols0 = [jnp.zeros((m,), jnp.float32) for _ in range(6)]

        def run():
            def body(i, acc):
                cpos = i_arr  # stand-in permutation
                cols = [c + i.astype(jnp.float32) for c in cols0]
                back = lax.sort(tuple([cpos] + cols), num_keys=1)
                return acc + back[1][0]
            return lax.fori_loop(0, k, body, 0.0)
        return run

    results["sort-back 7-col (cur)"] = mk_sortback

    only = sys.argv[1:] if len(sys.argv) > 1 else None
    for name, mk in results.items():
        if only and not any(s in name for s in only):
            continue
        try:
            ms = slope(mk)
            print(f"{name:36s} {ms:8.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:36s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
