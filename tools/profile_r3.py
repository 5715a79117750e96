"""Round-3 design measurements: gather/scatter scaling, slab-BFS trip
anatomy, refit stencil cost, build-phase part breakdown.

Run on the real chip: python tools/profile_r3.py  (from repo root with
PYTHONPATH including repo + axon site).
"""
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, ".")

from tpu_bvh.models import lbvh
from tpu_bvh.utils import scenes

I32 = jnp.int32


def slope(loop_fn, k_lo=2, k_hi=16, reps=5):
    f = jax.jit(loop_fn)
    klo = jnp.asarray(k_lo, I32)
    khi = jnp.asarray(k_hi, I32)
    jax.block_until_ready(f(klo)); jax.block_until_ready(f(khi))

    def t(fn):
        t0 = time.perf_counter(); jax.block_until_ready(fn()); return time.perf_counter() - t0

    lo = min(t(lambda: f(klo)) for _ in range(reps))
    hi = min(t(lambda: f(khi)) for _ in range(reps))
    return (hi - lo) / (k_hi - k_lo) * 1e3


def main():
    dev = jax.devices()[0]
    print("device:", dev)
    n = 262_000
    tris = jax.device_put(jnp.asarray(scenes.sponza_like(n)), dev)
    bvh = jax.block_until_ready(lbvh.build_single_pass(tris))
    rng = np.random.default_rng(0)

    # ---- 1. gather cost vs rows (1 operand + 4-operand same-index) ----
    src = jnp.arange(n, dtype=I32)
    src4 = [jnp.arange(n, dtype=I32) + k for k in range(4)]
    for rows in (4096, 16384, 65536, 262_000):
        idx = jnp.asarray(rng.integers(0, n, rows), I32)

        def mk1(k, idx=idx):
            def body(i, acc):
                g = (src + i)[idx]
                return acc + g[0].astype(jnp.float32)
            return lax.fori_loop(0, k, body, 0.0)

        def mk4(k, idx=idx):
            def body(i, acc):
                a = [(s + i)[idx] for s in src4]
                return acc + sum(x[0].astype(jnp.float32) for x in a)
            return lax.fori_loop(0, k, body, 0.0)

        print(f"gather rows={rows:7d}: x1 {slope(mk1):7.4f} ms   x4-sameidx {slope(mk4):7.4f} ms")

    # ---- 2. scatter cost vs rows ----
    for rows in (4096, 16384, 65536, 262_000):
        idx = jnp.asarray(rng.permutation(n)[:rows], I32)
        vals = jnp.arange(rows, dtype=I32)

        def mks(k, idx=idx, vals=vals):
            def body(i, acc):
                out = jnp.zeros((n,), I32).at[idx].set(vals + i, mode="drop")
                return acc + out[0].astype(jnp.float32)
            return lax.fori_loop(0, k, body, 0.0)

        print(f"scatter rows={rows:7d}: {slope(mks):7.4f} ms")

    # ---- 3. slab-BFS trip anatomy: fixed trips, vary fetch count ----
    mm = bvh.n_nodes
    prow = jnp.asarray(rng.integers(0, 2**22, (mm, 12), np.int64), I32)
    SLAB = 4096

    def mk_trips(nfetch):
        def loop(k):
            def body(c):
                t, tq, acc = c
                start = (t * 977) % (mm - SLAB)
                task = lax.dynamic_slice(tq, (start,), (SLAB,))
                s = jnp.zeros((SLAB,), I32)
                rows = task
                for _ in range(nfetch):
                    r = prow[jnp.clip(rows, 0, mm - 1)]
                    rows = r[:, 0] + 1
                    s = s + r[:, 1]
                tq = lax.dynamic_update_slice(tq, s, (start,))
                return t + 1, tq, acc + s[0]
            def cond(c):
                return c[0] < c[2] * 0 + jnp.asarray(38, I32)
            # 38 trips per "iteration": scale k by while trip count
            def kbody(i, carry):
                tq, acc = carry
                _, tq, acc = lax.while_loop(cond, body, (i * 0, tq, acc + i))
                return tq, acc
            tq0 = jnp.arange(mm, dtype=I32) % (mm - 1)
            tq, acc = lax.fori_loop(0, k, kbody, (tq0, jnp.asarray(0, I32)))
            return acc + tq[0]
        return loop

    for nf in (0, 1, 3, 7):
        ms = slope(mk_trips(nf), k_lo=1, k_hi=4)
        print(f"38 trips, {nf} row-fetches[4096x12]/trip: {ms:7.3f} ms  ({ms/38*1000:6.1f} us/trip)")

    # ---- 4. refit stencil kernel cost in isolation ----
    from tpu_bvh.ops.pallas.refit_dense import refit_dense_pallas
    pk = bvh.packed_t
    codes_ = None
    m = bvh.n_leaves - 1
    # reconstruct first/last via topology scans
    from tpu_bvh.ops import radix_tree as RT
    # cheat: use leaf count
    first = jnp.zeros((m,), I32)
    last = jnp.ones((m,), I32)

    as_ib = lambda x: lax.bitcast_convert_type(x, I32)
    leafpk = pk[:, bvh.n_internal:]
    nn = int(leafpk.shape[1])
    onecol = jnp.full((1,), nn - 1, I32)
    fl = jnp.concatenate([jnp.zeros((m,), I32), jnp.zeros((1,), I32)])
    ll = jnp.concatenate([jnp.arange(m, dtype=I32) + 1, onecol * 0])

    def mk_stencil(k):
        def body(i, acc):
            mat = jnp.concatenate(
                [as_ib(leafpk + i.astype(jnp.float32) * 1e-7),
                 fl[None, :], ll[None, :]], axis=0)
            acc_all, short_all, t4 = refit_dense_pallas(mat, nn, 16)
            return acc + acc_all[0, 0] + t4[0, 0]
        return lax.fori_loop(0, k, body, 0.0)

    print(f"refit_dense_pallas (R=16, n={nn}): {slope(mk_stencil):7.3f} ms")

    # ---- 5. build-phase part breakdown ----
    codes, leaf_packed_t, leaf_prim = jax.jit(
        lambda t: lbvh._sorted_leaves_from_tris(t, True)
    )(tris)
    codes = jax.block_until_ready(codes)

    from tpu_bvh.ops.pallas.scan32 import scan_core
    def mk_scan(k):
        def body(i, acc):
            c = codes + i.astype(jnp.uint32)
            psv, psv_val, lc, nsv, nsv_val, rc = scan_core(
                RT.adjacent_deltas(c))
            return acc + psv[0].astype(jnp.float32) + lc[0] + rc[0] + nsv[0]
        return lax.fori_loop(0, k, body, 0.0)
    print(f"scan_core (2 passes): {slope(mk_scan):7.3f} ms")

    from tpu_bvh.ops import refit as RF
    # real first/last from the scans
    dlt, first, last, psv_val, nsv_val, psv, lc, rc = jax.jit(
        RT._topology_scans)(codes)
    first = jax.block_until_ready(first)

    def mk_refit(k):
        def body(i, acc):
            lp = leaf_packed_t + i.astype(jnp.float32) * 1e-7
            out = RF.refit_anchored_packed(lp, first, last)
            return acc + out[0, 0]
        return lax.fori_loop(0, k, body, 0.0)
    print(f"refit_anchored_packed: {slope(mk_refit):7.3f} ms")

    def mk_apetrei(k):
        def body(i, acc):
            lp = leaf_packed_t + i.astype(jnp.float32) * 1e-7
            l, r, p, ipk, root = RT.apetrei_build_packed(codes + i.astype(jnp.uint32), lp)
            return acc + ipk[0, 0] + l[0].astype(jnp.float32)
        return lax.fori_loop(0, k, body, 0.0)
    print(f"apetrei_build_packed (scan+refit+emit): {slope(mk_apetrei, k_hi=8):7.3f} ms")

    def mk_full(k):
        def body(i, acc):
            t = tris + (i.astype(jnp.float32) * 1e-7)
            b = lbvh.build_single_pass(t)
            return acc + b.packed_t[0, 0] + b.left[0].astype(jnp.float32)
        return lax.fori_loop(0, k, body, 0.0)
    print(f"build_single_pass full: {slope(mk_full, k_hi=8):7.3f} ms")


if __name__ == "__main__":
    main()
