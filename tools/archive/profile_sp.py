"""Phase-level slope timing of the CURRENT single-pass build pipeline on
the real TPU (apetrei_build_packed: scan32 topology + anchored packed
refit + finalize). Prints per-phase ms so optimization effort lands where
the time actually is."""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from tpu_bvh.models import lbvh
from tpu_bvh.ops import radix_tree, refit
from tpu_bvh.utils import scenes

I32 = jnp.int32


def _t(f):
    t0 = time.perf_counter()
    jax.block_until_ready(f())
    return time.perf_counter() - t0


def slope(make_loop, k_lo=2, k_hi=12, reps=5):
    f_lo = jax.jit(make_loop(k_lo))
    f_hi = jax.jit(make_loop(k_hi))
    jax.block_until_ready(f_lo())
    jax.block_until_ready(f_hi())
    lo = min(_t(f_lo) for _ in range(reps))
    hi = min(_t(f_hi) for _ in range(reps))
    return (hi - lo) / (k_hi - k_lo) * 1e3


def main():
    n = 261_996
    tris = jnp.asarray(scenes.sponza_like(n))

    codes, leaf_packed_t, leaf_prim = jax.jit(
        lambda t: lbvh._sorted_leaves_from_tris(t, True)
    )(tris)
    codes = jax.block_until_ready(codes)
    dlt, first, last, psv_val, nsv_val, psv, lc, rc = jax.jit(
        radix_tree._topology_scans
    )(codes)
    first = jax.block_until_ready(first)

    phases = {}

    def mk_front(k):
        def run():
            def body(i, acc):
                t = tris + i.astype(jnp.float32) * 1e-7
                c, lpt, lp = lbvh._sorted_leaves_from_tris(t, True)
                return acc + c[0].astype(jnp.float32) + lpt[0, 0] + lp[0].astype(jnp.float32)
            return lax.fori_loop(0, k, body, 0.0)
        return run
    phases["front(extents+morton+sort)"] = mk_front

    def mk_scans(k):
        def run():
            def body(i, acc):
                c = codes + i.astype(jnp.uint32)
                d, f, l, pv, nv, ps, lcx, rcx = radix_tree._topology_scans(c)
                return (acc + f[0].astype(jnp.float32) + l[0].astype(jnp.float32)
                        + lcx[0].astype(jnp.float32) + rcx[1].astype(jnp.float32))
            return lax.fori_loop(0, k, body, 0.0)
        return run
    phases["topology_scans"] = mk_scans

    def mk_refit(k):
        def run():
            def body(i, acc):
                lpt = leaf_packed_t + i.astype(jnp.float32) * 1e-7
                out = refit.refit_anchored_packed(lpt, first, last)
                return acc + out[0, 0] + out[3, 1]
            return lax.fori_loop(0, k, body, 0.0)
        return run
    phases["refit_anchored_packed"] = mk_refit

    # refit sub-phases: dense stencil kernel alone
    def mk_refit_dense(k):
        from tpu_bvh.ops.pallas.refit_dense import refit_dense_pallas
        as_ib = lambda x: lax.bitcast_convert_type(x, I32)
        onecol = jnp.full((1,), n - 1, I32)

        def run():
            def body(i, acc):
                lpt = leaf_packed_t + i.astype(jnp.float32) * 1e-7
                mat = jnp.concatenate(
                    [as_ib(lpt),
                     jnp.concatenate([first, onecol])[None, :],
                     jnp.concatenate([last, onecol])[None, :]],
                    axis=0,
                )
                acc_all, short_all, t4 = refit_dense_pallas(mat, n, 16)
                return acc + lax.bitcast_convert_type(acc_all[0, 0], jnp.float32) + t4[0, 0]
            return lax.fori_loop(0, k, body, 0.0)
        return run
    phases["refit/dense_kernel"] = mk_refit_dense

    def mk_build(k):
        def run():
            def body(i, acc):
                c = codes + i.astype(jnp.uint32)
                lpt = leaf_packed_t + i.astype(jnp.float32) * 1e-7
                left, right, par, ipt, root = radix_tree.apetrei_build_packed(c, lpt)
                return acc + left[0].astype(jnp.float32) + ipt[0, 0] + root.astype(jnp.float32)
            return lax.fori_loop(0, k, body, 0.0)
        return run
    phases["apetrei_build_packed(scans+refit+links)"] = mk_build

    def mk_total(k):
        def run():
            def body(i, acc):
                t = tris + i.astype(jnp.float32) * 1e-7
                b = lbvh.build_single_pass(t)
                return acc + b.node_min[0, 0] + b.left[0].astype(jnp.float32)
            return lax.fori_loop(0, k, body, 0.0)
        return run
    phases["TOTAL build_single_pass"] = mk_total

    for name, mk in phases.items():
        ms = slope(mk)
        print(f"{name:45s} {ms:7.3f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
