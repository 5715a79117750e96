"""Where does build_single_pass e2e spend time beyond front+topology+refit?
Full consumption (sum everything) so XLA cannot DCE any stage.
"""
import sys, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
from jax import lax
sys.path.insert(0, ".")
from tpu_bvh.models import lbvh
from tpu_bvh.ops import radix_tree
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
codes_i = codes_s.astype(jnp.uint32).astype(jnp.int32)


def consume(*xs):
    tot = jnp.float32(0)
    for x in xs:
        if x.dtype in (jnp.float32,):
            tot += lax.bitcast_convert_type(x, I32).sum().astype(jnp.float32)
        else:
            tot += x.sum().astype(jnp.float32)
    return tot


# build from codes, FULL consumption
def mk_build_full(k):
    def body(i, acc):
        l, r, p, ipk, root, fi, la = radix_tree.apetrei_build_packed_full(
            codes_i + (i - i), leaf_packed)
        return acc + consume(l, r, p, ipk, root, fi, la)
    return lax.fori_loop(0, k, body, jnp.float32(0))
print(f"build_full(all consumed)  : {slope(mk_build_full):7.3f} ms", flush=True)


# build from codes, partial consumption (old style)
def mk_build_part(k):
    def body(i, acc):
        out = radix_tree.apetrei_build_packed_full(codes_i + (i - i), leaf_packed)
        return acc + out[3][0, 0]
    return lax.fori_loop(0, k, body, jnp.float32(0))
print(f"build_full(partial)       : {slope(mk_build_part):7.3f} ms", flush=True)


# e2e single pass, full consumption
def mk_e2e_full(k):
    def body(i, acc):
        b = lbvh.build_single_pass(tris + i.astype(jnp.float32) * 1e-9)
        return acc + consume(b.packed_t, b.left, b.right, b.root)
    return lax.fori_loop(0, k, body, jnp.float32(0))
print(f"e2e(all consumed)         : {slope(mk_e2e_full, k_hi=5):7.3f} ms", flush=True)


# e2e without finalize: front + build, full consumption
def mk_e2e_nofin(k):
    def body(i, acc):
        c, lpk, lp = lbvh._sorted_leaves_from_tris(
            tris + i.astype(jnp.float32) * 1e-9, True)
        l, r, p, ipk, root, fi, la = radix_tree.apetrei_build_packed_full(c, lpk)
        return acc + consume(l, r, p, ipk, root, fi, la, lp)
    return lax.fori_loop(0, k, body, jnp.float32(0))
print(f"front+build (no finalize) : {slope(mk_e2e_nofin, k_hi=5):7.3f} ms", flush=True)

# e2e aux (what bench uses for single_pass+collapse)
def mk_e2e_aux(k):
    def body(i, acc):
        b, p, fi, la = lbvh.build_single_pass_aux(tris + i.astype(jnp.float32) * 1e-9)
        return acc + consume(b.packed_t, b.left, b.right, b.root, p, fi, la)
    return lax.fori_loop(0, k, body, jnp.float32(0))
print(f"e2e aux (all consumed)    : {slope(mk_e2e_aux, k_hi=5):7.3f} ms", flush=True)
