"""Pinpoint the build tail: scans vs refit vs emission, all fully consumed."""
import sys, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
from jax import lax
sys.path.insert(0, ".")
from tpu_bvh.models import lbvh
from tpu_bvh.ops import radix_tree, refit
from tpu_bvh.ops.radix_tree import _topology_scans
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


def consume(*xs):
    tot = jnp.float32(0)
    for x in xs:
        if x.dtype == jnp.float32:
            tot += lax.bitcast_convert_type(x, I32).sum().astype(jnp.float32)
        else:
            tot += x.sum().astype(jnp.float32)
    return tot


n = 262_000
tris = jnp.asarray(scenes.sponza_like(n))
codes_s, leaf_packed, leaf_prim = jax.block_until_ready(
    jax.jit(lambda t: lbvh._sorted_leaves_from_tris(t, True))(tris))
codes_i = codes_s.astype(jnp.uint32).astype(jnp.int32)
dlt, first, last, psv_val, nsv_val, psv, lc, rc = jax.block_until_ready(
    _topology_scans(codes_i))


def mk_scans(k):
    def body(i, acc):
        out = _topology_scans(codes_i + (i - i))
        return acc + consume(*out)
    return lax.fori_loop(0, k, body, jnp.float32(0))
print(f"scans (all consumed)      : {slope(mk_scans):7.3f} ms", flush=True)


def mk_refit(k):
    def body(i, acc):
        pt = leaf_packed + i.astype(jnp.float32) * 1e-9
        out = refit.refit_anchored_packed(pt, first, last)
        return acc + consume(out)
    return lax.fori_loop(0, k, body, jnp.float32(0))
print(f"refit (all consumed)      : {slope(mk_refit):7.3f} ms", flush=True)


def mk_scans_refit(k):
    def body(i, acc):
        d2, f2, l2, pv, nv, ps, lc2, rc2 = _topology_scans(codes_i + (i - i))
        pt = leaf_packed + i.astype(jnp.float32) * 1e-9
        out = refit.refit_anchored_packed(pt, f2, l2)
        return acc + consume(d2, f2, l2, pv, nv, ps, lc2, rc2, out)
    return lax.fori_loop(0, k, body, jnp.float32(0))
print(f"scans+refit (all consumed): {slope(mk_scans_refit):7.3f} ms", flush=True)


def mk_build_full(k):
    def body(i, acc):
        out = radix_tree.apetrei_build_packed_full(codes_i + (i - i), leaf_packed)
        return acc + consume(*out)
    return lax.fori_loop(0, k, body, jnp.float32(0))
print(f"build_full (all consumed) : {slope(mk_build_full):7.3f} ms", flush=True)
