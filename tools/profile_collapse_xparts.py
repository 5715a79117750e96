"""Isolate collapse XLA-stage costs by re-tracing with TBVH_COLLAPSE_XPARTS
variants in ONE process (fresh jit per mask; results WRONG for != 31 —
timing only). Kernel parts fixed by TBVH_COLLAPSE_PARTS env (default 15).
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


def slope(f, k_lo=1, k_hi=5, reps=5):
    klo = jnp.asarray(k_lo, I32)
    khi = jnp.asarray(k_hi, I32)
    t0 = time.perf_counter()
    jax.block_until_ready(f(klo))
    c = time.perf_counter() - t0
    jax.block_until_ready(f(khi))

    def t(fn):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        return time.perf_counter() - t0

    lo = min(t(lambda: f(klo)) for _ in range(reps))
    hi = min(t(lambda: f(khi)) for _ in range(reps))
    return (hi - lo) / (k_hi - k_lo) * 1e3, c


def main():
    n = 262_000
    tris = jnp.asarray(scenes.sponza_like(n))
    bvh, parent, first, last = jax.block_until_ready(
        lbvh.build_single_pass_aux(tris)
    )

    def mk(mask):
        CF._XPARTS = mask

        @jax.jit
        def run(k):
            def body(i, acc):
                b = bvh._replace(
                    packed_t=bvh.packed_t + i.astype(jnp.float32) * 1e-7
                )
                w = CF.collapse_lbvh_to_bvh4.__wrapped__(
                    b, parent, first, last
                )
                full = (
                    w.child.sum() + w.child_count.sum() + w.parent.sum()
                    + w.leaf_parent.sum() + w.n_nodes
                    + lax.bitcast_convert_type(
                        w.slot_packed_t, jnp.int32).sum()
                )
                return acc + full

            return lax.fori_loop(0, k, body, jnp.int32(0))

        return run

    base = None
    for mask, label in [
        (11, "all"),
        (10, "no seed/own route"),
        (9, "no slots+claims rt"),
        (3, "no sp scatter"),
        (0, "none"),
    ]:
        ms, c = slope(mk(mask))
        d = "" if base is None else f"  (delta {base - ms:+7.3f})"
        if base is None:
            base = ms
        print(f"xparts={mask:2d} {label:20s}: {ms:7.3f} ms{d} "
              f"[compile {c:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
