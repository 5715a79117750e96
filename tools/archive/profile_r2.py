"""Round-2 phase profile of the single-pass build at sponza scale.

Slope-times each stage of `apetrei_build_packed` in isolation on the chip:
  front  : _sorted_leaves_from_tris (extents+morton+sort)
  scans  : _topology_scans (fwd+rev scan32 kernels + delta prep)
  refit  : refit_anchored_packed (dense stencil + long path)
  glue   : full build minus the above (concats, finalize)
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
from tpu_bvh.utils import scenes


def slope(make_loop, k_lo=2, k_hi=12, reps=3):
    f_lo = jax.jit(make_loop(k_lo))
    f_hi = jax.jit(make_loop(k_hi))
    np.asarray(f_lo())
    np.asarray(f_hi())

    def t(f):
        t0 = time.perf_counter()
        np.asarray(f())
        return time.perf_counter() - t0

    lo = min(t(f_lo) for _ in range(reps))
    hi = min(t(f_hi) for _ in range(reps))
    return (hi - lo) / (k_hi - k_lo) * 1e3


def main():
    n = 262_000
    tris = jnp.asarray(scenes.sponza_like(n))
    codes, leaf_packed_t, leaf_prim = jax.jit(
        lambda t: lbvh._sorted_leaves_from_tris(t, True)
    )(tris)
    codes, leaf_packed_t, leaf_prim = jax.block_until_ready(
        (codes, leaf_packed_t, leaf_prim)
    )
    dlt, first, last, psv_val, nsv_val, psv, lc, rc = jax.block_until_ready(
        jax.jit(radix_tree._topology_scans)(codes)
    )

    def mk_front(k):
        def run():
            def body(i, acc):
                t = tris + i.astype(jnp.float32) * 1e-7
                c, lpk, lp = lbvh._sorted_leaves_from_tris(t, True)
                return acc + c[0].astype(jnp.float32) + lpk[0, 0]
            return lax.fori_loop(0, k, body, 0.0)
        return run

    def mk_scans(k):
        def run():
            def body(i, acc):
                c = codes + i.astype(jnp.uint32)
                d, f, l, pv, nv, p, lc_, rc_ = radix_tree._topology_scans(c)
                return acc + f[0].astype(jnp.float32) + l[0] + lc_[0] + rc_[0]
            return lax.fori_loop(0, k, body, 0.0)
        return run

    def mk_refit(k):
        def run():
            def body(i, acc):
                lp = leaf_packed_t + i.astype(jnp.float32) * 1e-7
                out = refit.refit_anchored_packed(lp, first, last)
                return acc + out[0, 0] + out[5, 1]
            return lax.fori_loop(0, k, body, 0.0)
        return run

    def mk_full(k):
        def run():
            def body(i, acc):
                t = tris + i.astype(jnp.float32) * 1e-7
                bvh = lbvh.build_single_pass(t)
                return acc + bvh.packed_t[0, 0] + bvh.left[0].astype(jnp.float32)
            return lax.fori_loop(0, k, body, 0.0)
        return run

    for name, mk in [("front", mk_front), ("scans", mk_scans),
                     ("refit", mk_refit), ("full", mk_full)]:
        ms = slope(mk)
        print(f"{name:6s} {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
