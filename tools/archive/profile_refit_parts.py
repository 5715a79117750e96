"""Slope-time the pieces of refit_anchored on the chip."""
from __future__ import annotations

import math
import sys
import time

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # noqa: BLE001
    pass

import jax.numpy as jnp
import numpy as np
from jax import lax

from tpu_bvh.models import lbvh
from tpu_bvh.ops import radix_tree, refit
from tpu_bvh.ops.pallas.refit_dense import refit_dense_pallas
from tpu_bvh.utils import scenes

I32 = jnp.int32


def _t(f):
    t0 = time.perf_counter()
    np.asarray(f())
    return time.perf_counter() - t0


def slope(make_loop, k_lo=2, k_hi=12, reps=4):
    f_lo = jax.jit(make_loop(k_lo))
    f_hi = jax.jit(make_loop(k_hi))
    np.asarray(f_lo())
    np.asarray(f_hi())
    lo = min(_t(f_lo) for _ in range(reps))
    hi = min(_t(f_hi) for _ in range(reps))
    return (hi - lo) / (k_hi - k_lo) * 1e3


def main():
    tris = jnp.asarray(scenes.sponza_like(262_000))
    codes, leaf_min0, leaf_max0, _ = jax.jit(
        lambda t: lbvh._sorted_leaves_from_tris(t, True)
    )(tris)
    _, first0, last0, _, _, _ = jax.jit(radix_tree._threshold_core)(codes)
    leaf_min0, leaf_max0, first0, last0 = map(
        jax.block_until_ready, (leaf_min0, leaf_max0, first0, last0)
    )
    n = leaf_min0.shape[0]
    m = n - 1
    radius = 16
    big = jnp.float32(3.0e38)

    def piece(name, fn, k_hi=12):
        def mk(k):
            def run():
                def body(i, acc):
                    lm = leaf_min0 + i.astype(jnp.float32) * 1e-7
                    return acc + fn(lm, leaf_max0, first0, last0)
                return lax.fori_loop(0, k, body, 0.0)
            return run
        try:
            ms = slope(mk, k_hi=k_hi)
            print(f"{name:38s} {ms:8.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:38s} FAILED {e}", flush=True)

    # full refit
    def full(lm, lx, f, l):
        a, b = refit.refit_anchored(lm, lx, f, l)
        return a[0, 0] + b[0, 0]
    piece("refit_anchored (full)", full)

    # stencil kernel alone
    def stencil(lm, lx, f, l):
        packed = jnp.concatenate([lm, -lx], axis=1)
        as_ib = lambda x: lax.bitcast_convert_type(x, I32)
        onecol = jnp.full((1,), n - 1, I32)
        mat = jnp.concatenate(
            [as_ib(packed.T),
             jnp.concatenate([f, onecol])[None, :],
             jnp.concatenate([l, onecol])[None, :]], axis=0)
        acc_all, short_all, t4 = refit_dense_pallas(mat, n, radius)
        return acc_all[0, 0] + t4[0, 0] + short_all[0].astype(jnp.float32)
    piece("stencil kernel (+pack)", stencil)

    # coarse table build alone (given t4 from kernel): replicate lines 146-175
    def table(lm, lx, f, l):
        packed = jnp.concatenate([lm, -lx], axis=1)
        pt = packed.T
        cur = pt
        for k in range(1, 5):
            s = 1 << (k - 1)
            shifted = jnp.concatenate(
                [cur[:, s:], jnp.broadcast_to(cur[:, -1:], (6, s))], axis=1)
            cur = jnp.minimum(cur, shifted)
        nb = (n + 15) // 16
        padn = nb * 16
        ptp = pt if padn == n else jnp.concatenate(
            [pt, jnp.full((6, padn - n), big)], axis=1)
        c0 = ptp.reshape(6, nb, 16).min(axis=2)
        levels_c = max(1, math.ceil(math.log2(max(nb, 2))))
        ctabs = [cur, c0]
        ccur = c0
        for k in range(1, levels_c + 1):
            s = 1 << (k - 1)
            if s < nb:
                shifted = jnp.concatenate(
                    [ccur[:, s:], jnp.broadcast_to(ccur[:, -1:], (6, s))], axis=1)
                ccur = jnp.minimum(ccur, shifted)
            ctabs.append(ccur)
        table_rows = jnp.concatenate(ctabs, axis=1).T
        return table_rows[0, 0] + table_rows[n, 0]
    piece("coarse table build (XLA)", table)

    # compact path alone (sorts + small gathers), with a fake table
    fake_table = jax.block_until_ready(
        jnp.zeros((n + 2 * ((n + 15) // 16) * 1, 6)) )

    def compact(lm, lx, f, l):
        i = jnp.arange(m, dtype=I32)
        short = (i - f < radius) & (l - i <= radius)
        cap = min(m, max(64, m // 12))
        n_long = jnp.sum((~short).astype(I32))
        key = short.astype(jnp.uint32)
        _, cf, cl, cpos = lax.sort((key, f, l, i), num_keys=1, is_stable=True)
        u = jnp.minimum(fake_table[cf[:cap]], fake_table[jnp.maximum(cl[:cap] - 15, 0)])
        ut = (u + lm[0, 0]).T
        rank = jnp.arange(m, dtype=I32)
        in_long = rank < n_long
        pad = jnp.full((m - cap,), big)
        cols = [jnp.where(in_long, jnp.concatenate([ut[k], pad]), big) for k in range(6)]
        back = lax.sort(tuple([cpos] + cols), num_keys=1)
        return back[1][0] + back[6][0]
    piece("compact path (2 sorts + cap gathers)", compact)

    # where-merge + transpose glue
    acc_t0 = jax.block_until_ready(jnp.zeros((6, m)))
    def glue(lm, lx, f, l):
        i = jnp.arange(m, dtype=I32)
        short = (i - f < radius) & (l - i <= radius)
        lc = [acc_t0[k] + lm[0, 0] for k in range(6)]
        out_t = jnp.stack([jnp.where(short, acc_t0[k], lc[k]) for k in range(6)], axis=0)
        out = out_t.T
        return out[0, 0] + out[m - 1, 5]
    piece("where-merge + transpose glue", glue)


if __name__ == "__main__":
    main()
