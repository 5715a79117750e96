"""Cumulative-prefix slope timing of build_single_pass on the real TPU.

Times successively longer prefixes of the pipeline so each stage's marginal
cost is the difference between adjacent rows — catches glue costs (layout
changes, concats) that per-stage microbenchmarks miss.
"""
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
from tpu_bvh.ops.pallas.threshold_core import child_positions_auto
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


def _prefix(t, stage: int):
    """Run the single-pass pipeline up to `stage`, returning a scalar."""
    codes, leaf_min, leaf_max, leaf_prim = lbvh._sorted_leaves_from_tris(t, True)
    acc = codes[0].astype(jnp.float32) + leaf_min[0, 0] + leaf_prim[0].astype(jnp.float32)
    if stage == 0:
        return acc
    n = codes.shape[0]
    m = n - 1
    dlt, first, last, psv_val, nsv_val, psv, lc, rc = radix_tree._topology_scans(codes)
    acc = acc + (first[0] + last[0] + psv_val[0] + nsv_val[0] + psv[0]).astype(jnp.float32)
    if stage == 1:
        return acc
    acc = acc + (lc[0] + rc[0]).astype(jnp.float32)
    if stage == 2:
        return acc
    int_min, int_max = refit.refit_anchored(leaf_min, leaf_max, first, last)
    acc = acc + int_min[0, 0] + int_max[0, 0]
    if stage == 3:
        return acc
    idx = jnp.arange(m, dtype=I32)
    jdx = jnp.arange(n, dtype=I32)
    is_root = (first == 0) & (last == n - 1)
    internal_is_right = psv_val > nsv_val
    parent_internal = jnp.where(is_root, I32(-1), jnp.where(internal_is_right, psv, last))
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
    acc = acc + (left[0] + right[0] + parent[0] + root).astype(jnp.float32)
    if stage == 4:
        return acc
    bvh = lbvh._finalize(leaf_min, leaf_max, leaf_prim, left, right, int_min, int_max, root)
    return acc + bvh.node_min[0, 0] + bvh.left[0].astype(jnp.float32)


NAMES = [
    "0 front(sort)",
    "1 +threshold_core",
    "2 +child_positions",
    "3 +refit_anchored",
    "4 +links/parents",
    "5 +finalize (=full)",
]


def main():
    tris = jnp.asarray(scenes.sponza_like(262_000))
    only = [int(a) for a in sys.argv[1:]] if len(sys.argv) > 1 else range(6)
    prev = None
    for s in only:
        def mk(k, s=s):
            def run():
                def body(i, acc):
                    t = tris + i.astype(jnp.float32) * 1e-7
                    return acc + _prefix(t, s)
                return lax.fori_loop(0, k, body, 0.0)
            return run
        ms = slope(mk)
        d = "" if prev is None else f"  (+{ms - prev:.3f})"
        print(f"{NAMES[s]:24s} {ms:8.3f} ms{d}", flush=True)
        prev = ms


if __name__ == "__main__":
    main()
