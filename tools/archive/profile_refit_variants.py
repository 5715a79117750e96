"""Find the missing 1.2 ms: stitched refit variants with/without cond."""
from __future__ import annotations

import math
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
big = jnp.float32(3.0e38)


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


def refit_variant(leaf_min, leaf_max, first, last, *, use_cond: bool,
                  radius: int = 16):
    """refit_anchored clone, cond optional (always-compact when False)."""
    n = leaf_min.shape[0]
    m = first.shape[0]
    i = jnp.arange(m, dtype=I32)
    packed = jnp.concatenate([leaf_min, -leaf_max], axis=1)

    as_ib = lambda x: lax.bitcast_convert_type(x, I32)
    onecol = jnp.full((1,), n - 1, I32)
    mat = jnp.concatenate(
        [as_ib(packed.T),
         jnp.concatenate([first, onecol])[None, :],
         jnp.concatenate([last, onecol])[None, :]], axis=0)
    acc_all, short_all, t4 = refit_dense_pallas(mat, n, radius)
    acc_t = acc_all[:, :m]
    short = short_all[:m]

    pt = packed.T
    cur = t4
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

    cap = min(m, max(64, m // 12))
    n_long = jnp.sum((~short).astype(I32))

    def _floor_log2(x):
        return (31 - lax.clz(x.astype(jnp.uint32)).astype(I32)).astype(I32)

    def query(cf, cl):
        u = jnp.minimum(table_rows[cf], table_rows[jnp.maximum(cl - 15, 0)])
        bf = (cf + 15) >> 4
        bl = ((cl + 1) >> 4) - 1
        has_mid = bl >= bf
        bfs = jnp.minimum(bf, nb - 1)
        cnt = jnp.maximum(bl - bfs + 1, 1)
        kc = _floor_log2(cnt)
        b2 = jnp.maximum(bl - (1 << kc) + 1, 0)
        uc = jnp.minimum(table_rows[n + kc * nb + bfs], table_rows[n + kc * nb + b2])
        return jnp.minimum(u, jnp.where(has_mid[:, None], uc, big))

    def compact_path(_):
        key = short.astype(jnp.uint32)
        _, cf, cl, cpos = lax.sort((key, first, last, i), num_keys=1, is_stable=True)
        ut = query(cf[:cap], cl[:cap]).T
        rank = jnp.arange(m, dtype=I32)
        in_long = rank < n_long
        pad = jnp.full((m - cap,), big)
        cols = [jnp.where(in_long, jnp.concatenate([ut[k], pad]), big) for k in range(6)]
        back = lax.sort(tuple([cpos] + cols), num_keys=1)
        return list(back[1:])

    def full_path(_):
        ut = query(first, last).T
        return [ut[k] for k in range(6)]

    if use_cond:
        long_cols = lax.cond(n_long <= cap, compact_path, full_path, None)
    else:
        long_cols = compact_path(None)
    out_t = jnp.stack(
        [jnp.where(short, acc_t[k], long_cols[k]) for k in range(6)], axis=0)
    out = out_t.T
    return out[:, :3], -out[:, 3:]


def main():
    tris = jnp.asarray(scenes.sponza_like(262_000))
    codes, leaf_min0, leaf_max0, _ = jax.jit(
        lambda t: lbvh._sorted_leaves_from_tris(t, True))(tris)
    _, first0, last0, _, _, _ = jax.jit(radix_tree._threshold_core)(codes)
    leaf_min0, leaf_max0, first0, last0 = map(
        jax.block_until_ready, (leaf_min0, leaf_max0, first0, last0))

    for name, use_cond in [("with cond (as shipped)", True),
                           ("no cond (always compact)", False)]:
        def mk(k, uc=use_cond):
            def run():
                def body(i, acc):
                    lm = leaf_min0 + i.astype(jnp.float32) * 1e-7
                    a, b = refit_variant(lm, leaf_max0, first0, last0, use_cond=uc)
                    return acc + a[0, 0] + b[0, 0]
                return lax.fori_loop(0, k, body, 0.0)
            return run
        print(f"{name:38s} {slope(mk):8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
