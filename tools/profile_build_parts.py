"""Single-pass build phase decomposition: scan core, refit, assembly."""
import sys, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
from jax import lax
sys.path.insert(0, ".")
from tpu_bvh.models import lbvh
from tpu_bvh.ops import radix_tree, refit
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
codes_s, leaf_packed, leaf_prim = jax.block_until_ready(
    jax.jit(lambda t: lbvh._sorted_leaves_from_tris(t, True))(tris))
from tpu_bvh.ops.radix_tree import adjacent_deltas, _topology_scans
from tpu_bvh.ops.pallas.scan32 import scan_core

dlt_raw = jax.block_until_ready(adjacent_deltas(codes_s.astype(jnp.uint32).astype(jnp.int32)))

def mk_scan(k):
    def body(i, acc):
        out = scan_core(dlt_raw + (i - i))
        return acc + out[0][0] + out[3][0]
    return lax.fori_loop(0, k, body, jnp.int32(0))
print(f"scan_core (fwd+rev kernel): {slope(mk_scan):7.3f} ms", flush=True)

# full topology scans incl delta prep
def mk_topo(k):
    def body(i, acc):
        out = _topology_scans(codes_s.astype(jnp.uint32).astype(jnp.int32) + (i - i))
        return acc + out[1][0] + out[2][0]
    return lax.fori_loop(0, k, body, jnp.int32(0))
print(f"topology_scans total      : {slope(mk_topo):7.3f} ms", flush=True)

# refit alone (needs first/last)
dlt, first, last, psv_val, nsv_val, psv, lc, rc = jax.block_until_ready(
    _topology_scans(codes_s.astype(jnp.uint32).astype(jnp.int32)))
def mk_refit(k):
    def body(i, acc):
        pt = leaf_packed * (1.0 + i.astype(jnp.float32) * 3e-7)
        out = refit.refit_anchored_packed(pt, first, last)
        return acc + out[0, 0]
    return lax.fori_loop(0, k, body, jnp.float32(0))
print(f"refit_anchored_packed     : {slope(mk_refit):7.3f} ms", flush=True)

# full build from codes
def mk_build(k):
    def body(i, acc):
        out = radix_tree.apetrei_build_packed_full(
            codes_s.astype(jnp.uint32).astype(jnp.int32) + (i - i), leaf_packed)
        return acc + out[3][0, 0]
    return lax.fori_loop(0, k, body, jnp.float32(0))
print(f"apetrei_build_packed_full : {slope(mk_build):7.3f} ms", flush=True)

# front half (extents+morton+sort)
def mk_front(k):
    def body(i, acc):
        c, lpk, lp = lbvh._sorted_leaves_from_tris(
            tris * (1.0 + i.astype(jnp.float32) * 3e-7), True)
        return acc + c[0].astype(jnp.float32) + lpk[0, 0]
    return lax.fori_loop(0, k, body, jnp.float32(0))
print(f"front (ext+morton+sort)   : {slope(mk_front):7.3f} ms", flush=True)

# end-to-end single pass
def mk_e2e(k):
    def body(i, acc):
        b = lbvh.build_single_pass(tris * (1.0 + i.astype(jnp.float32) * 3e-7))
        return acc + b.packed_t[0, 0]
    return lax.fori_loop(0, k, body, jnp.float32(0))
print(f"build_single_pass e2e     : {slope(mk_e2e, k_hi=5):7.3f} ms", flush=True)
