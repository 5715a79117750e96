"""Phase-level slope timing of the single-pass build on the real TPU.

Each phase is timed as an in-jit fori_loop with input perturbation (see
bench.py docstring for why); prints per-phase ms so optimization effort
lands where the time actually is.
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from tpu_bvh.models import lbvh
from tpu_bvh.ops import radix_tree, refit, sort
from tpu_bvh.utils import scenes


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
    tris_np = scenes.sponza_like(262_000)
    tris = jnp.asarray(tris_np)
    n = int(tris.shape[0])

    # materialize the front-end products once for downstream phases
    codes, leaf_min, leaf_max, leaf_prim = jax.jit(
        lambda t: lbvh._sorted_leaves_from_tris(t, True)
    )(tris)
    codes = jax.block_until_ready(codes)

    phases = {}

    def mk_front(k):
        def run():
            def body(i, acc):
                t = tris + i.astype(jnp.float32) * 1e-7
                c, lmn, lmx, lp = lbvh._sorted_leaves_from_tris(t, True)
                return acc + c[0].astype(jnp.float32) + lmn[0, 0] + lp[0].astype(jnp.float32)
            return lax.fori_loop(0, k, body, 0.0)
        return run

    phases["front(extents+morton+sort)"] = mk_front

    def mk_threshold(k):
        def run():
            def body(i, acc):
                c = codes + i.astype(jnp.uint32)
                dlt, first, last, pv, nv, ps = radix_tree._threshold_core(c)
                return (acc + first[0].astype(jnp.float32)
                        + last[0].astype(jnp.float32) + pv[0].astype(jnp.float32))
            return lax.fori_loop(0, k, body, 0.0)
        return run

    phases["threshold_core(psv+nsv)"] = mk_threshold

    # real topology inputs
    dlt0, first0, last0, pv0, nv0, ps0 = jax.jit(radix_tree._threshold_core)(codes)
    first0 = jax.block_until_ready(first0)

    def mk_refit(k):
        def run():
            def body(i, acc):
                lm = leaf_min + i.astype(jnp.float32) * 1e-7
                mn, mx = refit.refit_anchored(lm, leaf_max, first0, last0)
                return acc + mn[0, 0] + mx[0, 0]
            return lax.fori_loop(0, k, body, 0.0)
        return run

    phases["refit_anchored"] = mk_refit

    def mk_links(k):
        m = n - 1
        idx = jnp.arange(m, dtype=jnp.int32)
        jdx = jnp.arange(n, dtype=jnp.int32)

        def run():
            def body(i, acc):
                dlt = dlt0 + 0 * i
                is_root = (first0 == 0) & (last0 == n - 1)
                internal_is_right = pv0 > nv0
                parent_internal = jnp.where(
                    is_root, jnp.int32(-1), jnp.where(internal_is_right, ps0, last0)
                )
                ldl = jnp.concatenate([jnp.full((1,), -1, jnp.int32), dlt])
                ldr = jnp.concatenate([dlt, jnp.full((1,), -1, jnp.int32)])
                leaf_is_right = ldl > ldr
                parent_leaf = jnp.where(leaf_is_right, jdx - 1, jdx)
                key_internal = jnp.where(
                    is_root, jnp.int32(2 * m),
                    internal_is_right.astype(jnp.int32) * m + parent_internal,
                )
                key_leaf = leaf_is_right.astype(jnp.int32) * m + parent_leaf
                all_keys = jnp.concatenate([key_internal, key_leaf]).astype(jnp.uint32)
                all_vals = jnp.concatenate([idx, m + jdx]) + i
                _, sv = lax.sort_key_val(all_keys, all_vals)
                return acc + sv[0].astype(jnp.float32) + sv[m].astype(jnp.float32)
            return lax.fori_loop(0, k, body, 0.0)
        return run

    phases["child_links(sort)"] = mk_links

    def mk_full(k):
        def run():
            def body(i, acc):
                t = tris + i.astype(jnp.float32) * 1e-7
                bvh = lbvh.build_single_pass(t)
                return acc + bvh.node_min[0, 0] + bvh.left[0].astype(jnp.float32)
            return lax.fori_loop(0, k, body, 0.0)
        return run

    phases["FULL single_pass"] = mk_full

    def mk_apetrei(k):
        def run():
            def body(i, acc):
                c = codes + 0 * i.astype(jnp.uint32)
                lm = leaf_min + i.astype(jnp.float32) * 1e-7
                left, right, parent, imin, imax, root = radix_tree.apetrei_build(
                    c, lm, leaf_max
                )
                return (acc + imin[0, 0] + left[0].astype(jnp.float32)
                        + root.astype(jnp.float32))
            return lax.fori_loop(0, k, body, 0.0)
        return run

    phases["apetrei_build(thr+refit+links)"] = mk_apetrei

    only = sys.argv[1:] if len(sys.argv) > 1 else None
    for name, mk in phases.items():
        if only and not any(s in name for s in only):
            continue
        try:
            ms = slope(mk)
            print(f"{name:32s} {ms:8.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:32s} FAILED: {e}", flush=True)


if __name__ == "__main__":
    main()
