"""Anchored-refit decomposition: dense stencil kernel vs long path, and a
radius sweep (radius trades stencil taps against long-set size)."""
import sys, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
from jax import lax
sys.path.insert(0, ".")
from tpu_bvh.models import lbvh
from tpu_bvh.ops import refit
from tpu_bvh.ops.radix_tree import _topology_scans
from tpu_bvh.ops.pallas.refit_dense import refit_dense_pallas
from tpu_bvh.utils import scenes
I32 = jnp.int32

def slope(loop_fn, k_lo=1, k_hi=9, reps=5):
    f = jax.jit(loop_fn)
    klo = jnp.asarray(k_lo, I32); khi = jnp.asarray(k_hi, I32)
    jax.block_until_ready(f(klo)); jax.block_until_ready(f(khi))
    def t(fn):
        t0 = time.perf_counter(); jax.block_until_ready(fn()); return time.perf_counter() - t0
    lo = min(t(lambda: f(klo)) for _ in range(reps))
    hi = min(t(lambda: f(khi)) for _ in range(reps))
    return (hi - lo) / (k_hi - k_lo) * 1e3

n = 262_000
tris = jnp.asarray(scenes.sponza_like(n))
codes_s, leaf_packed, _ = jax.block_until_ready(
    jax.jit(lambda t: lbvh._sorted_leaves_from_tris(t, True))(tris))
dlt, first, last, *_rest = jax.block_until_ready(
    _topology_scans(codes_s.astype(jnp.uint32).astype(jnp.int32)))
m = first.shape[0]

# dense kernel alone at each radius
onecol = jnp.full((1,), n - 1, I32)
as_ib = lambda x: lax.bitcast_convert_type(x, I32)
mat = jnp.concatenate([
    as_ib(leaf_packed),
    jnp.concatenate([first, onecol])[None, :],
    jnp.concatenate([last, onecol])[None, :],
], axis=0)
mat = jax.block_until_ready(mat)

for R in (16, 24, 32, 48):
    def mk(k, R=R):
        def body(i, acc):
            acc_all, short_all, t4 = refit_dense_pallas(mat.at[0, 0].add(i), n, R)
            return acc + acc_all[0, 0] + t4[0, 0]
        return lax.fori_loop(0, k, body, jnp.float32(0))
    import numpy as np
    n_long = int(np.sum(~((np.arange(m) - np.asarray(first) < R)
                          & (np.asarray(last) - np.arange(m) <= R))))
    print(f"dense kernel R={R:3d}: {slope(mk):7.3f} ms  (n_long={n_long})", flush=True)

# full refit at each radius
for R in (24, 32, 48, 64):
    def mk(k, R=R):
        def body(i, acc):
            pt = leaf_packed * (1.0 + i.astype(jnp.float32) * 3e-7)
            out = refit.refit_anchored_packed(pt, first, last, radius=R)
            return acc + out[0, 0]
        return lax.fori_loop(0, k, body, jnp.float32(0))
    print(f"full refit  R={R:3d}: {slope(mk):7.3f} ms", flush=True)

# long-path pieces at the default radius (48): compact sort, table build,
# query+scatter (approximated by running with the kernel output discarded)
def mk_sort(k):
    def body(i, acc):
        key = ((first + i - i >= 0).astype(jnp.uint32) << 22) | jnp.arange(m, dtype=jnp.uint32)
        skey, cf, cl = lax.sort((key, first, last), num_keys=1, is_stable=False)
        return acc + skey[0].astype(jnp.float32) + cf[0].astype(jnp.float32)
    return lax.fori_loop(0, k, body, jnp.float32(0))
print(f"long-path sort    : {slope(mk_sort):7.3f} ms", flush=True)
