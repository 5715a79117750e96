"""Sweep TBVH_COLLAPSE_SLEN for the fast collapse (full pipeline timing).

Run as a driver: spawns one subprocess per S_LEN value (the constant is
read at import time), each timing collapse_lbvh_to_bvh4 on a sponza-scale
build with the in-jit loop slope method. Usage:

    python tools/profile_collapse_slen.py [33 25 17]
"""
import os
import subprocess
import sys

_CHILD = r"""
import sys, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
from jax import lax
sys.path.insert(0, ".")
from tpu_bvh.models import lbvh
from tpu_bvh.utils import scenes
from tpu_bvh.ops.collapse_fast import collapse_lbvh_to_bvh4
from tpu_bvh.ops.pallas.collapse_block import S_LEN

n = 262_000
tris = jax.device_put(jnp.asarray(scenes.sponza_like(n)))
bvh, parent, first, last = jax.block_until_ready(
    lbvh.build_single_pass_aux(tris)
)

def mk(k):
    def body(i, acc):
        b = bvh._replace(packed_t=bvh.packed_t + i.astype(jnp.float32) * 1e-7)
        w = collapse_lbvh_to_bvh4(b, parent, first, last)
        return acc + w.child_min[0, 0, 0]
    return lax.fori_loop(0, k, body, 0.0)

f = jax.jit(mk)
klo, khi = jnp.asarray(1, jnp.int32), jnp.asarray(5, jnp.int32)
jax.block_until_ready(f(klo)); jax.block_until_ready(f(khi))

def t(k):
    t0 = time.perf_counter()
    jax.block_until_ready(f(k))
    return time.perf_counter() - t0

lo = min(t(klo) for _ in range(5))
hi = min(t(khi) for _ in range(5))
print(f"S_LEN={S_LEN}: collapse {(hi - lo) / 4 * 1e3:7.3f} ms", flush=True)
"""

if __name__ == "__main__":
    vals = [int(v) for v in sys.argv[1:]] or [33, 25, 17]
    for v in vals:
        env = dict(os.environ, TBVH_COLLAPSE_SLEN=str(v))
        subprocess.run([sys.executable, "-c", _CHILD], env=env, check=False)
