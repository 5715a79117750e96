"""Ablation slope-timing of build_single_pass: knock out one piece at a
time INSIDE the full jit so XLA's fusion context stays realistic (prefix
timings proved non-additive)."""
from __future__ import annotations

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


def build_variant(t, mode: str):
    """apetrei_build_packed with one piece ablated."""
    codes, leaf_packed_t, leaf_prim = lbvh._sorted_leaves_from_tris(t, True)
    n = codes.shape[0]
    m = n - 1

    if mode == "front":
        acc = codes[0].astype(jnp.float32) + leaf_packed_t[0, 0]
        return acc + leaf_prim[0].astype(jnp.float32)

    if mode == "noscan":
        # fake topology: balanced-ish ranges, skip scan kernels entirely
        idx = jnp.arange(m, dtype=I32)
        first = jnp.maximum(idx - 8, 0)
        last = jnp.minimum(idx + 8, n - 1)
        dlt = radix_tree.adjacent_deltas(codes)
        dlt = jnp.where(dlt <= 31, dlt - 2, dlt - 11)
        psv = first - 1
        psv_val = jnp.zeros((m,), I32)
        nsv_val = jnp.ones((m,), I32)
        lc = jnp.full((m,), -1, I32)
        rc = jnp.full((m,), -1, I32)
    else:
        dlt, first, last, psv_val, nsv_val, psv, lc, rc = (
            radix_tree._topology_scans(codes)
        )

    if mode == "scans":
        return (first[0] + last[0] + psv_val[0] + nsv_val[0] + psv[0]
                + lc[0] + rc[0]).astype(jnp.float32) + leaf_packed_t[0, 0]

    if mode == "norefit":
        int_packed_t = leaf_packed_t[:, :m] * 2.0
    elif mode == "refit_short_only":
        import os
        from tpu_bvh.ops.pallas.refit_dense import refit_dense_pallas

        as_ib = lambda x: lax.bitcast_convert_type(x, I32)
        onecol = jnp.full((1,), n - 1, I32)
        mat = jnp.concatenate(
            [as_ib(leaf_packed_t),
             jnp.concatenate([first, onecol])[None, :],
             jnp.concatenate([last, onecol])[None, :]], axis=0)
        acc_all, short_all, t4 = refit_dense_pallas(mat, n, 16)
        int_packed_t = acc_all[:6, :m] + t4[:, :m] * 0.0
    else:
        int_packed_t = refit.refit_anchored_packed(leaf_packed_t, first, last)

    nsv = last
    idx = jnp.arange(m, dtype=I32)
    is_root = (first == 0) & (last == n - 1)
    internal_is_right = psv_val > nsv_val
    parent_internal = jnp.where(
        is_root, I32(-1), jnp.where(internal_is_right, psv, nsv)
    )
    jdx = jnp.arange(n, dtype=I32)
    ldl = jnp.concatenate([jnp.full((1,), -1, I32), dlt])
    ldr = jnp.concatenate([dlt, jnp.full((1,), -1, I32)])
    leaf_is_right = ldl > ldr
    parent_leaf = jnp.where(leaf_is_right, jdx - 1, jdx)
    left_internal = jnp.where(lc >= 0, lc, m + idx)
    right_internal = jnp.where(rc >= 0, rc, m + idx + 1)
    left = jnp.concatenate([left_internal, jnp.full((n,), -1, I32)])
    right = jnp.concatenate([right_internal, jnp.full((n,), -1, I32)])
    parent = jnp.concatenate([parent_internal, parent_leaf])
    root = jnp.argmax(is_root).astype(I32)

    if mode == "nolinks":
        return int_packed_t[0, 0] + root.astype(jnp.float32)

    bvh = lbvh._finalize_packed(
        leaf_packed_t, leaf_prim, left, right, int_packed_t, root
    )
    return (bvh.node_min[0, 0] + bvh.node_max[0, 0]
            + bvh.left[0].astype(jnp.float32)
            + bvh.right[0].astype(jnp.float32) + parent[0].astype(jnp.float32))


MODES = ["full", "front", "scans", "noscan", "norefit", "refit_short_only",
         "nolinks"]


def main():
    tris = jnp.asarray(scenes.sponza_like(262_000))
    modes = sys.argv[1:] or MODES
    for mode in modes:
        def mk(k, mode=mode):
            def run():
                def body(i, acc):
                    t = tris + i.astype(jnp.float32) * 1e-7
                    return acc + build_variant(t, mode)
                return lax.fori_loop(0, k, body, 0.0)
            return run
        try:
            ms = slope(mk)
            print(f"{mode:18s} {ms:8.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{mode:18s} FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
