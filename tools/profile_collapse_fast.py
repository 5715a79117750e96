"""On-chip timing of the blocked fast collapse vs the slab BFS."""
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, ".")

from tpu_bvh.models import lbvh
from tpu_bvh.ops.collapse_fast import collapse_lbvh_to_bvh4
from tpu_bvh.utils import scenes

I32 = jnp.int32


def slope(loop_fn, k_lo=1, k_hi=5, reps=5):
    f = jax.jit(loop_fn)
    klo = jnp.asarray(k_lo, I32)
    khi = jnp.asarray(k_hi, I32)
    t0 = time.perf_counter()
    jax.block_until_ready(f(klo))
    print(f"  (first call {time.perf_counter()-t0:.1f}s)")
    jax.block_until_ready(f(khi))

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
        bvh, parent, first, last = jax.block_until_ready(
            lbvh.build_single_pass_aux(tris)
        )

        def mk(k):
            def body(i, acc):
                pk = bvh.packed_t + (i.astype(jnp.float32) % 2) * 1e-7
                b = bvh._replace(packed_t=pk)
                w = collapse_lbvh_to_bvh4(b, parent, first, last)
                return acc + w.child[0, 0] + w.n_nodes
            return lax.fori_loop(0, k, body, jnp.int32(0))

        ms = slope(mk)
        print(f"n={n}: collapse_fast {ms:.3f} ms")

    # correctness spot-check on chip at 32K vs CPU oracle
    tris = jax.device_put(jnp.asarray(scenes.sponza_like(32_768)), dev)
    bvh, parent, first, last = jax.block_until_ready(
        lbvh.build_single_pass_aux(tris)
    )
    fast = jax.block_until_ready(
        collapse_lbvh_to_bvh4(bvh, parent, first, last)
    )
    from tpu_bvh.utils.cpu_reference import collapse_cpu

    oracle = collapse_cpu(bvh)
    b2 = oracle["b2_node"]
    k = oracle["n_nodes"]
    used = b2[:k]
    ok = int(fast.n_nodes) == k
    ok &= np.array_equal(
        np.asarray(fast.child_count)[used], oracle["child_count"][:k]
    )
    slot_used = np.arange(4)[None, :] < oracle["child_count"][:k][:, None]
    ok &= np.array_equal(
        np.asarray(fast.child_min)[used][slot_used],
        oracle["child_min"][:k][slot_used],
    )
    cap = fast.n_internal_cap
    o_child = oracle["child"][:k]
    remapped = np.where(
        (o_child >= 0) & (o_child < cap),
        b2[np.clip(o_child, 0, len(b2) - 1)], o_child,
    )
    ok &= np.array_equal(np.asarray(fast.child)[used], remapped)
    print("on-chip oracle isomorphism @32K:", "OK" if ok else "MISMATCH")


if __name__ == "__main__":
    main()
