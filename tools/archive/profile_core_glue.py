"""Where does _threshold_core's time go vs the bare kernels?"""
from __future__ import annotations

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
from tpu_bvh.ops.pallas import threshold_core as tc
from tpu_bvh.utils import scenes


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
    codes0 = jax.block_until_ready(jax.jit(
        lambda t: lbvh._sorted_leaves_from_tris(t, True)[0])(tris))
    m = codes0.shape[0] - 1
    rng = np.random.default_rng(0)
    dlt0 = jax.block_until_ready(jax.jit(radix_tree.adjacent_deltas)(codes0))

    def bench(name, fn, src):
        def mk(k):
            def run():
                def body(i, acc):
                    x = src + jnp.where(i < 0, 1, 0).astype(src.dtype)
                    return acc + fn(x)
                return lax.fori_loop(0, k, body, jnp.float32(0))
            return run
        try:
            print(f"{name:44s} {slope(mk):8.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:44s} FAILED {type(e).__name__}: {str(e)[:100]}", flush=True)

    # 1) deltas + remap only
    def f_deltas(codes):
        d = radix_tree.adjacent_deltas(codes)
        d = jnp.where(d <= 31, d - 2, d - 11)
        return d[0].astype(jnp.float32)
    bench("adjacent_deltas + remap", f_deltas, codes0)

    # 2) the two production kernel passes on a fixed dlt
    def f_kern(d):
        psv, nsv = tc.psv_nsv_packed_lanes(d, chunk=2048)
        return (psv[0] + nsv[0]).astype(jnp.float32)
    bench("psv+nsv lanes c=2048 (production pair)", f_kern, dlt0)

    def f_kern4(d):
        psv, nsv = tc.psv_nsv_packed_lanes(d, chunk=4096)
        return (psv[0] + nsv[0]).astype(jnp.float32)
    bench("psv+nsv lanes c=4096", f_kern4, dlt0)

    # 3) full _threshold_core
    def f_core(codes):
        dlt, first, last, psv_val, nsv_val, psv = radix_tree._threshold_core(codes)
        return (dlt[0] + first[0] + last[0] + psv_val[0] + nsv_val[0] + psv[0]).astype(jnp.float32)
    bench("_threshold_core (full)", f_core, codes0)

    # 4) core minus unpack: kernels on remapped deltas from codes
    def f_core2(codes):
        d = radix_tree.adjacent_deltas(codes)
        d = jnp.where(d <= 31, d - 2, d - 11)
        psv, nsv = tc.psv_nsv_packed_lanes(d, chunk=2048)
        return (psv[0] + nsv[0]).astype(jnp.float32)
    bench("deltas + kernels (no unpack)", f_core2, codes0)

    # 5) child positions production pair
    def f_child(d):
        l, r = tc.child_positions_auto(d)
        return (l[0] + r[0]).astype(jnp.float32)
    bench("child_positions_auto (production)", f_child, dlt0)

    # 6) everything consumed: core + child together (as apetrei_build does)
    def f_all(codes):
        dlt, first, last, psv_val, nsv_val, psv = radix_tree._threshold_core(codes)
        l, r = tc.child_positions_auto(dlt)
        return (first[0] + last[0] + psv_val[0] + nsv_val[0] + psv[0] + l[0] + r[0]).astype(jnp.float32)
    bench("core + child_positions", f_all, codes0)


if __name__ == "__main__":
    main()
