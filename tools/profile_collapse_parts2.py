"""Collapse cost split via TBVH_COLLAPSE_PARTS (one part mask per process).

Usage: python tools/profile_collapse_parts2.py [parts_mask]
Times the FULL collapse_lbvh_to_bvh4 pipeline with the kernel restricted to
the given parts mask (0 = passthrough: XLA side + kernel memory traffic
only; 1 sweeps, +2 aabb, +4 ownership, +8 states; 15 = everything).
"""
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, ".")

from tpu_bvh.models import lbvh
from tpu_bvh.utils import scenes
from tpu_bvh.ops import collapse_fast as CF

I32 = jnp.int32


def slope(loop_fn, k_lo=1, k_hi=5, reps=5):
    f = jax.jit(loop_fn)
    klo = jnp.asarray(k_lo, I32)
    khi = jnp.asarray(k_hi, I32)
    t0 = time.perf_counter()
    jax.block_until_ready(f(klo))
    print(f"    (first call {time.perf_counter()-t0:.1f}s)", flush=True)
    jax.block_until_ready(f(khi))

    def t(fn):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        return time.perf_counter() - t0

    lo = min(t(lambda: f(klo)) for _ in range(reps))
    hi = min(t(lambda: f(khi)) for _ in range(reps))
    return (hi - lo) / (k_hi - k_lo) * 1e3


def main():
    import os

    parts = os.environ.get("TBVH_COLLAPSE_PARTS", "15")
    print(f"device: {jax.devices()[0]}  parts={parts}", flush=True)
    n = 262_000
    tris = jnp.asarray(scenes.sponza_like(n))
    bvh, parent, first, last = jax.block_until_ready(
        lbvh.build_single_pass_aux(tris)
    )

    def mk_full(k):
        def body(i, acc):
            b = bvh._replace(
                packed_t=bvh.packed_t + i.astype(jnp.float32) * 1e-7
            )
            w = CF.collapse_lbvh_to_bvh4(b, parent, first, last)
            full = (
                w.child.sum() + w.child_count.sum() + w.parent.sum()
                + w.leaf_parent.sum() + w.n_nodes
                + lax.bitcast_convert_type(w.slot_packed_t, jnp.int32).sum()
            )
            return acc + full
        return lax.fori_loop(0, k, body, jnp.int32(0))

    print(f"full(parts={parts}) : {slope(mk_full):7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
