"""Raster engine Mrays/s on the chip + wavefront agreement spot-check."""
import sys, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np
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
o = jnp.asarray(rays.origin); d = jnp.asarray(rays.direction)

def raster_loop(k):
    def body(i, carry):
        acc, = carry
        r2 = rays._replace(direction=rays.direction * (1.0 + i.astype(jnp.float32) * 1e-7))
        hit, _c, ovf = raster_tpu._render_tpu_impl(
            rpack.tris_sorted, rpack.prim_ids, r2, tr, W, H, 1024, 4096, 32, 64, False)
        return (acc + hit.t[0] + hit.u[1],)
    return lax.fori_loop(0, k, body, (jnp.float32(0),))[0]

ms = slope(raster_loop)
print(f"render(raster) 512x512: {ms:.3f} ms = {W*H/ms*1e-3:.1f} Mrays/s", flush=True)

hit, _c, ovf = jax.block_until_ready(
    raster_tpu._render_tpu_impl(rpack.tris_sorted, rpack.prim_ids, rays, tr, W, H, 1024, 4096, 32, 64, False))
print("overflow:", bool(ovf))
from tpu_bvh.ops import traverse
packed = traverse.pack_bvh2(bvh, tris)
wf, _ = traverse.traverse_packed(packed, bvh.n_internal, bvh.root, rays, tr)
pi_r = np.asarray(hit.prim_idx).reshape(-1)
pi_w = np.asarray(wf.prim_idx).reshape(-1)
t_r = np.asarray(hit.t).reshape(-1)
t_w = np.asarray(wf.t).reshape(-1)
found = (pi_r >= 0) == (pi_w >= 0)
both = (pi_r >= 0) & (pi_w >= 0)
tmatch = np.abs(t_r[both] - t_w[both]) <= 1e-3 * np.maximum(1.0, np.abs(t_w[both]))
pmatch = pi_r[both] == pi_w[both]
print(f"found agree {found.sum()}/{found.size}; t match {tmatch.sum()}/{both.sum()}; prim match {pmatch.sum()}/{both.sum()}")
