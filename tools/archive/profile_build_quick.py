"""Quick slope timing of build_single_pass / build_two_pass on the chip."""
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
    which = sys.argv[1:] or ["single"]
    builders = {"single": lbvh.build_single_pass, "two": lbvh.build_two_pass}
    for name in which:
        build = builders[name]
        def mk(k, build=build):
            def run():
                def body(i, acc):
                    t = tris + i.astype(jnp.float32) * 1e-7
                    b = build(t)
                    return (acc + b.node_min[0, 0] + b.node_max[0, 0]
                            + b.left[0].astype(jnp.float32)
                            + b.right[0].astype(jnp.float32)
                            + b.root.astype(jnp.float32))
                return lax.fori_loop(0, k, body, 0.0)
            return run
        print(f"{name}: {slope(mk):.3f} ms", flush=True)


if __name__ == "__main__":
    main()
