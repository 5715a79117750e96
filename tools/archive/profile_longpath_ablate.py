"""Ablate the pieces of the refit long path inside the full single-pass
build: table build+transpose, sort#1 (compact), gathers, sort#2 (route
back). Each variant replaces one piece with a same-shaped dummy."""
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
from tpu_bvh.ops import radix_tree
from tpu_bvh.ops.pallas.refit_dense import refit_dense_pallas
from tpu_bvh.utils import scenes

I32 = jnp.int32
BIG = jnp.float32(3.0e38)


def _floor_log2(x):
    return (31 - lax.clz(x.astype(jnp.uint32)).astype(I32)).astype(I32)


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


def refit_variant(packed_t, first, last, mode, radius=16):
    n = packed_t.shape[1]
    m = first.shape[0]
    i = jnp.arange(m, dtype=I32)
    as_ib = lambda x: lax.bitcast_convert_type(x, I32)
    onecol = jnp.full((1,), n - 1, I32)
    mat = jnp.concatenate(
        [as_ib(packed_t),
         jnp.concatenate([first, onecol])[None, :],
         jnp.concatenate([last, onecol])[None, :]], axis=0)
    acc_all, short_all, t4 = refit_dense_pallas(mat, n, radius)
    acc_t = acc_all[:, :m]
    short = short_all[:m]

    nb = (n + 15) // 16
    if mode == "notable":
        table_rows = jnp.broadcast_to(
            packed_t[:, :1].T, (n + 15 * nb, 6)
        ) * 1.0 + t4[0, 0]
    else:
        pt = packed_t
        cur = t4
        padn = nb * 16
        ptp = pt if padn == n else jnp.concatenate(
            [pt, jnp.full((6, padn - n), BIG)], axis=1)
        c0 = ptp.reshape(6, nb, 16).min(axis=2)
        levels_c = max(1, math.ceil(math.log2(max(nb, 2))))
        ctabs = [cur, c0]
        ccur = c0
        for k in range(1, levels_c + 1):
            s = 1 << (k - 1)
            if s < nb:
                shifted = jnp.concatenate(
                    [ccur[:, s:], jnp.broadcast_to(ccur[:, -1:], (6, s))],
                    axis=1)
                ccur = jnp.minimum(ccur, shifted)
            ctabs.append(ccur)
        # pad level rows to nb each for uniform addressing
        ctabs = [ctabs[0]] + [
            c if c.shape[1] == nb else jnp.concatenate(
                [c, jnp.full((6, nb - c.shape[1]), BIG)], axis=1)
            for c in ctabs[1:]
        ]
        table_rows = jnp.concatenate(ctabs, axis=1).T

    cap = min(m, max(64, m // 12))
    n_long = jnp.sum((~short).astype(I32))

    def query(cf, cl):
        if mode == "nogather":
            return jnp.broadcast_to(table_rows[0], (cf.shape[0], 6)) + (
                cf[:, None] + cl[:, None]).astype(jnp.float32) * 0.0
        u = jnp.minimum(table_rows[cf], table_rows[jnp.maximum(cl - 15, 0)])
        bf = (cf + 15) >> 4
        bl = ((cl + 1) >> 4) - 1
        has_mid = bl >= bf
        bfs = jnp.minimum(bf, nb - 1)
        cnt = jnp.maximum(bl - bfs + 1, 1)
        kc = _floor_log2(cnt)
        b2 = jnp.maximum(bl - (1 << kc) + 1, 0)
        uc = jnp.minimum(
            table_rows[n + kc * nb + bfs], table_rows[n + kc * nb + b2])
        return jnp.minimum(u, jnp.where(has_mid[:, None], uc, BIG))

    if mode == "nosort1":
        cf, cl, cpos = first, last, i
        cf = cf[:cap]; cl = cl[:cap]
    else:
        key = short.astype(jnp.uint32)
        _, cf, cl, cpos = lax.sort(
            (key, first, last, i), num_keys=1, is_stable=True)
        cf = cf[:cap]; cl = cl[:cap]

    ut = query(cf, cl).T  # [6, cap]

    if mode == "nosort2":
        pad = jnp.full((6, m - cap), BIG)
        long_cols_m = jnp.concatenate([ut, pad], axis=1)
        out = [long_cols_m[k] for k in range(6)]
    else:
        rank = jnp.arange(m, dtype=I32)
        in_long = rank < n_long
        pad = jnp.full((m - cap,), BIG)
        cols = [jnp.where(in_long, jnp.concatenate([ut[k], pad]), BIG)
                for k in range(6)]
        back = lax.sort(tuple([cpos] + cols), num_keys=1)
        out = list(back[1:])

    return jnp.stack(
        [jnp.where(short, acc_t[k], out[k]) for k in range(6)], axis=0)


MODES = ["full", "notable", "nogather", "nosort1", "nosort2"]


def main():
    tris = jnp.asarray(scenes.sponza_like(262_000))
    modes = sys.argv[1:] or MODES
    for mode in modes:
        def mk(k, mode=mode):
            def run():
                def body(it, acc):
                    t = tris + it.astype(jnp.float32) * 1e-7
                    codes, lpk, lp = lbvh._sorted_leaves_from_tris(t, True)
                    dlt, first, last, *_ = radix_tree._topology_scans(codes)
                    r = refit_variant(lpk, first, last, mode)
                    return acc + r[0, 0] + r[5, 0] + lp[0].astype(jnp.float32)
                return lax.fori_loop(0, k, body, 0.0)
            return run
        try:
            ms = slope(mk)
            print(f"{mode:12s} {ms:8.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{mode:12s} FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
