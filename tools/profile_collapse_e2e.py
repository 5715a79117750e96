"""End-to-end on-chip slope timing of collapse_bvh2_to_bvh4 (round 3)."""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np
from jax import lax

from tpu_bvh.models import lbvh
from tpu_bvh.ops.collapse import collapse_bvh2_to_bvh4
from tpu_bvh.utils import scenes

I32 = jnp.int32


def slope(loop_fn, k_lo=2, k_hi=12, reps=5):
    f = jax.jit(loop_fn)
    klo = jnp.asarray(k_lo, I32)
    khi = jnp.asarray(k_hi, I32)
    jax.block_until_ready(f(klo)); jax.block_until_ready(f(khi))

    def t(fn):
        t0 = time.perf_counter(); jax.block_until_ready(fn()); return time.perf_counter() - t0

    lo = min(t(lambda: f(klo)) for _ in range(reps))
    hi = min(t(lambda: f(khi)) for _ in range(reps))
    return (hi - lo) / (k_hi - k_lo) * 1e3


def main():
    dev = jax.devices()[0]
    print("device:", dev)
    for n in (150_000, 262_000):
        tris = jax.device_put(jnp.asarray(scenes.sponza_like(n)), dev)
        bvh = jax.block_until_ready(lbvh.build_single_pass(tris))

        def mk(k):
            def body(i, acc):
                pk = bvh.packed_t + (i.astype(jnp.float32) % 2) * 1e-7
                b = bvh._replace(packed_t=pk)
                w = collapse_bvh2_to_bvh4(b)
                return acc + w.child[0, 0] + w.n_nodes
            return lax.fori_loop(0, k, body, jnp.int32(0))

        print(f"n={n}: collapse {slope(mk):.3f} ms")


if __name__ == "__main__":
    main()
