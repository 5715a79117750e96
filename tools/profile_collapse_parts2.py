"""Kernel-phase isolation via TBVH_COLLAPSE_PARTS + finer non-kernel pieces."""
import os
import subprocess
import sys

# parts: 1 sweeps, 2 aabb, 4 own, 8 states
RUNS = [("sweeps only      (1)", "1"), ("sweeps+aabb      (3)", "3"),
        ("sweeps+aabb+own  (7)", "7"), ("all             (15)", "15")]

SCRIPT = r'''
import sys, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
from jax import lax
sys.path.insert(0, ".")
from tpu_bvh.models import lbvh
from tpu_bvh.utils import scenes
from tpu_bvh.ops.pallas.collapse_block import collapse_block_pallas
I32 = jnp.int32

def slope(loop_fn, k_lo=1, k_hi=5, reps=5):
    f = jax.jit(loop_fn)
    klo = jnp.asarray(k_lo, I32); khi = jnp.asarray(k_hi, I32)
    jax.block_until_ready(f(klo)); jax.block_until_ready(f(khi))
    def t(fn):
        t0 = time.perf_counter(); jax.block_until_ready(fn()); return time.perf_counter() - t0
    lo = min(t(lambda: f(klo)) for _ in range(reps))
    hi = min(t(lambda: f(khi)) for _ in range(reps))
    return (hi - lo) / (k_hi - k_lo) * 1e3

n = 262_000
tris = jax.device_put(jnp.asarray(scenes.sponza_like(n)))
bvh, parent, first, last = jax.block_until_ready(lbvh.build_single_pass_aux(tris))
m = bvh.n_internal; nl = bvh.n_leaves
from tpu_bvh.ops.pallas.collapse_block import S_LEN
rlen = last - first + 1
is_long = rlen > S_LEN
pk = bvh.packed_t
ext = jnp.maximum(-pk[3:6] - pk[0:3], 0.0)
area = 2.0 * (ext[0]*ext[1] + ext[0]*ext[2] + ext[1]*ext[2])
area_bits = lax.bitcast_convert_type(area, I32)
W = nl
padm = jnp.full((1, W - m), -1, I32)
row = lambda v: jnp.concatenate([v[None, :], padm], axis=1)
seed = jnp.full((m,), 3, I32)
e2d = jnp.full((m,), -1, I32)
meta = jnp.concatenate([
    jnp.concatenate([area_bits[None, :m], jnp.zeros((1, W-m), I32)], 1),
    row(bvh.left[:m]), row(bvh.right[:m]), row(parent[:m]),
    jnp.concatenate([seed[None, :], jnp.full((1, W-m), 3, I32)], 1),
    jnp.concatenate([(~is_long).astype(I32)[None, :], jnp.zeros((1, W-m), I32)], 1),
    jnp.concatenate([e2d[None, :], padm], 1),
    jnp.zeros((1, W), I32)], axis=0)
node8 = jnp.concatenate([lax.bitcast_convert_type(pk[:, :m], I32), jnp.zeros((2, m), I32)], axis=0)
node8 = jnp.concatenate([node8, jnp.zeros((8, W-m), I32)], axis=1)
leaf8 = jnp.concatenate([lax.bitcast_convert_type(pk[:, m:], I32), jnp.zeros((2, nl), I32)], axis=0)
meta = jax.block_until_ready(meta)

def mk_kernel(k):
    def body(i, acc):
        mt = meta.at[0, 0].add(i)
        outm, outa = collapse_block_pallas(mt, node8, leaf8, m)
        return acc + outm[0, 0].astype(jnp.float32) + outa[0][0, 0].astype(jnp.float32)
    return lax.fori_loop(0, k, body, 0.0)
print(f"kernel: {slope(mk_kernel):7.3f} ms", flush=True)
'''

for label, parts in RUNS:
    env = dict(os.environ, TBVH_COLLAPSE_PARTS=parts)
    r = subprocess.run([sys.executable, "-c", SCRIPT], env=env,
                       capture_output=True, text=True, timeout=400)
    out = [l for l in r.stdout.splitlines() if "kernel" in l]
    print(label, out[0] if out else ("FAIL: " + r.stderr[-300:]), flush=True)
