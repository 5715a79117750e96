"""Raster kernel cost decomposition via its debug modes:
0 = full, 1 = no sweeps (binning+loop+DMA), 2 = dot+min only."""
import sys, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
from jax import lax
sys.path.insert(0, ".")
from tpu_bvh.models import lbvh
from tpu_bvh.ops import raster, raster_tpu
from tpu_bvh.utils import camera, scenes
I32 = jnp.int32

def slope(loop_fn, k_lo=2, k_hi=8, reps=3):
    f = jax.jit(loop_fn)
    klo = jnp.asarray(k_lo, I32); khi = jnp.asarray(k_hi, I32)
    jax.block_until_ready(f(klo)); jax.block_until_ready(f(khi))
    def t(fn):
        t0 = time.perf_counter(); jax.block_until_ready(fn()); return time.perf_counter() - t0
    lo = min(t(lambda: f(klo)) for _ in range(reps))
    hi = min(t(lambda: f(khi)) for _ in range(reps))
    return (hi - lo) / (k_hi - k_lo) * 1e3

n = 262_000
W = H = 512
tris = jnp.asarray(scenes.sponza_like(n))
tr, cam = scenes.preset("sponza")
rays = camera.generate_rays(cam, W, H)
bvh = lbvh.build_single_pass(tris)
rpack = raster.pack_raster(bvh, tris, leaf_size=64)

for dbg in (1, 2, 0):
    def raster_loop(k, dbg=dbg):
        def body(i, carry):
            acc, = carry
            r2 = rays._replace(direction=rays.direction * (1.0 + i.astype(jnp.float32) * 1e-7))
            hit, _c, ovf = raster_tpu._render_tpu_impl(
                rpack.tris_sorted, rpack.prim_ids, r2, tr, W, H,
                1024, 4096, 32, 64, False, dbg)
            return (acc + hit.t[0] + hit.u[1],)
        return lax.fori_loop(0, k, body, (jnp.float32(0),))[0]
    ms = slope(raster_loop)
    print(f"debug={dbg}: {ms:.3f} ms = {W*H/ms*1e-3:.1f} Mrays/s", flush=True)
