"""PLOC compile-time + round-time profile at sponza scale."""
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, "/root/repo")

from tpu_bvh.models import lbvh, ploc as ploc_models
from tpu_bvh.utils import scenes


def slope(make_loop, k_lo=1, k_hi=4, reps=3):
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
    which = sys.argv[1] if len(sys.argv) > 1 else "ploc"
    build = ploc_models.build_ploc if which == "ploc" else ploc_models.build_hploc
    n = 262_000
    tris = jnp.asarray(scenes.sponza_like(n))

    t0 = time.perf_counter()
    bvh = jax.block_until_ready(build(tris))
    t1 = time.perf_counter()
    print(f"{which}: first call (compile+run) {t1 - t0:.1f} s", flush=True)

    def mk(k):
        def run():
            def body(i, acc):
                t = tris + (i.astype(jnp.float32) * 1e-7)
                b = build(t)
                return acc + b.packed_t[0, 0] + b.left[0].astype(jnp.float32)
            return lax.fori_loop(0, k, body, 0.0)
        return run

    t0 = time.perf_counter()
    ms = slope(mk)
    t1 = time.perf_counter()
    print(f"{which}: {ms:.3f} ms per build (loop compile+time {t1-t0:.1f} s)",
          flush=True)

    from tpu_bvh.utils.cost import sah_cost_bvh2
    print(f"{which}: sah_bvh2 {float(sah_cost_bvh2(bvh)):.2f}", flush=True)


if __name__ == "__main__":
    main()
