"""Refit sub-phase ablation at sponza scale (slope-timed on chip).

Parts of `refit.refit_anchored_packed`:
  dense  : refit_dense_pallas stencil kernel alone
  table  : coarse block-16 lifting table build alone
  sort1  : long-node compaction sort alone
  query  : 4 row-gathers at cap width alone
  sort2  : route-back sort alone
  full   : whole refit_anchored_packed
"""
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, "/root/repo")

from tpu_bvh.models import lbvh
from tpu_bvh.ops import radix_tree, refit
from tpu_bvh.ops.pallas.refit_dense import refit_dense_pallas
from tpu_bvh.utils import scenes

I32 = jnp.int32


def slope(loop_fn, k_lo=2, k_hi=12, reps=3):
    f = jax.jit(loop_fn)
    klo = jnp.asarray(k_lo, jnp.int32)
    khi = jnp.asarray(k_hi, jnp.int32)
    np.asarray(f(klo))
    np.asarray(f(khi))

    def t(k):
        t0 = time.perf_counter()
        np.asarray(f(k))
        return time.perf_counter() - t0

    lo = min(t(klo) for _ in range(reps))
    hi = min(t(khi) for _ in range(reps))
    return (hi - lo) / (k_hi - k_lo) * 1e3


def main():
    n = 262_000
    radius = 16
    tris = jnp.asarray(scenes.sponza_like(n))
    codes, leaf_packed_t, leaf_prim = jax.block_until_ready(
        jax.jit(lambda t: lbvh._sorted_leaves_from_tris(t, True))(tris)
    )
    _, first, last, *_ = jax.block_until_ready(
        jax.jit(radix_tree._topology_scans)(codes)
    )
    m = n - 1
    big = jnp.float32(3.0e38)

    def mk_dense(k):
        def body(i, acc):
            lp = leaf_packed_t + i.astype(jnp.float32) * 1e-7
            as_ib = lambda x: lax.bitcast_convert_type(x, I32)
            onecol = jnp.full((1,), n - 1, I32)
            mat = jnp.concatenate(
                [as_ib(lp),
                 jnp.concatenate([first, onecol])[None, :],
                 jnp.concatenate([last, onecol])[None, :]], axis=0)
            acc_all, short_all, t4 = refit_dense_pallas(mat, n, radius)
            return acc + acc_all[0, 0] + t4[0, 0] + short_all[0]
        return lax.fori_loop(0, k, body, 0.0)

    import math
    def coarse_table(pt, t4):
        nb = (n + 15) // 16
        padn = nb * 16
        ptp = pt if padn == n else jnp.concatenate(
            [pt, jnp.full((6, padn - n), big)], axis=1)
        c0 = ptp.reshape(6, nb, 16).min(axis=2)
        levels_c = max(1, math.ceil(math.log2(max(nb, 2))))
        ctabs = [t4, c0]
        ccur = c0
        for kk in range(1, levels_c + 1):
            s = 1 << (kk - 1)
            if s < nb:
                shifted = jnp.concatenate(
                    [ccur[:, s:], jnp.broadcast_to(ccur[:, -1:], (6, s))],
                    axis=1)
                ccur = jnp.minimum(ccur, shifted)
            ctabs.append(ccur)
        return jnp.concatenate(ctabs, axis=1).T, nb

    def mk_table(k):
        def body(i, acc):
            pt = leaf_packed_t + i.astype(jnp.float32) * 1e-7
            tr, _ = coarse_table(pt, pt)
            return acc + tr[0, 0] + tr[-1, -1]
        return lax.fori_loop(0, k, body, 0.0)

    i_arr = jnp.arange(m, dtype=I32)
    short0 = (i_arr - first < radius) & (last - i_arr <= radius)
    print(f"long nodes at R={radius}: {int(jnp.sum(~short0))}", flush=True)
    cap = min(m, max(64, (4 * m) // (3 * radius)))
    print(f"cap: {cap}", flush=True)

    def mk_sort1(k):
        def body(i, acc):
            key = ((short0 ^ (i % 2 == 0)).astype(jnp.uint32) << 22) \
                | i_arr.astype(jnp.uint32)
            skey, cf, cl = lax.sort((key, first, last), num_keys=1,
                                    is_stable=False)
            return acc + skey[0].astype(jnp.float32) + cf[0] + cl[0]
        return lax.fori_loop(0, k, body, 0.0)

    table_rows0, nb = coarse_table(leaf_packed_t, leaf_packed_t)
    table_rows0 = jax.block_until_ready(jax.jit(lambda x: x)(table_rows0))
    key0 = (short0.astype(jnp.uint32) << 22) | i_arr.astype(jnp.uint32)
    skey0, cf0, cl0 = jax.block_until_ready(
        jax.jit(lambda: lax.sort((key0, first, last), num_keys=1,
                                 is_stable=False))())

    def _floor_log2(x):
        return (31 - lax.clz(x.astype(jnp.uint32)).astype(I32)).astype(I32)

    def query(table_rows, cf, cl):
        u = jnp.minimum(table_rows[cf], table_rows[jnp.maximum(cl - 15, 0)])
        bf = (cf + 15) >> 4
        bl = ((cl + 1) >> 4) - 1
        has_mid = bl >= bf
        bfs = jnp.minimum(bf, nb - 1)
        cnt = jnp.maximum(bl - bfs + 1, 1)
        kc = _floor_log2(cnt)
        b2 = jnp.maximum(bl - (1 << kc) + 1, 0)
        uc = jnp.minimum(table_rows[n + kc * nb + bfs],
                         table_rows[n + kc * nb + b2])
        return jnp.minimum(u, jnp.where(has_mid[:, None], uc, big))

    def mk_query(k):
        def body(i, acc):
            cf = jnp.minimum(cf0[:cap] + i, m - 1)
            cl = jnp.maximum(cl0[:cap], cf)
            ut = query(table_rows0, cf, cl)
            return acc + ut[0, 0] + ut[-1, -1]
        return lax.fori_loop(0, k, body, 0.0)

    cpos0 = (skey0 & ((1 << 22) - 1)).astype(I32)
    ut0 = jax.block_until_ready(
        jax.jit(lambda: query(table_rows0, cf0[:cap], cl0[:cap]).T)())

    def mk_sort2(k):
        def body(i, acc):
            pad = jnp.full((m - cap,), big)
            cols = [jnp.concatenate([ut0[kk] + i.astype(jnp.float32), pad])
                    for kk in range(6)]
            back = lax.sort(tuple([cpos0] + cols), num_keys=1,
                            is_stable=False)
            return acc + back[1][0] + back[6][-1]
        return lax.fori_loop(0, k, body, 0.0)

    def mk_full(k):
        def body(i, acc):
            lp = leaf_packed_t + i.astype(jnp.float32) * 1e-7
            out = refit.refit_anchored_packed(lp, first, last, radius)
            return acc + out[0, 0] + out[5, 1]
        return lax.fori_loop(0, k, body, 0.0)

    for name, mk in [("dense", mk_dense), ("table", mk_table),
                     ("sort1", mk_sort1), ("query", mk_query),
                     ("sort2", mk_sort2), ("full", mk_full)]:
        ms = slope(mk)
        print(f"{name:6s} {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
