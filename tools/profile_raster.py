"""Raster-render throughput on the real TPU: sponza_like 512x512 primary."""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from tpu_bvh.models import lbvh
from tpu_bvh.ops import raster
from tpu_bvh.utils import camera, scenes


def _t(f):
    t0 = time.perf_counter()
    np.asarray(f())
    return time.perf_counter() - t0


def slope(make_loop, k_lo=1, k_hi=6, reps=3):
    f_lo = jax.jit(make_loop(k_lo))
    f_hi = jax.jit(make_loop(k_hi))
    np.asarray(f_lo())
    np.asarray(f_hi())
    lo = min(_t(f_lo) for _ in range(reps))
    hi = min(_t(f_hi) for _ in range(reps))
    return (hi - lo) / (k_hi - k_lo) * 1e3


def main():
    n = 262_000
    W = H = 512
    leaf = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    cap_a = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    tris = jnp.asarray(scenes.sponza_like(n))
    tr, cam = scenes.preset("sponza")
    rays = camera.generate_rays(cam, W, H)

    bvh = lbvh.build_single_pass(tris)
    packed = raster.pack_raster(bvh, tris, leaf_size=leaf)
    packed = jax.tree.map(
        lambda x: jax.block_until_ready(x) if hasattr(x, "block_until_ready") else x,
        packed,
    )

    # correctness spot check on device
    hit, counts, overflow = raster.render_raster_xla(
        packed, rays, tr, W, H, tile=16, cap_a=cap_a, cap_b=256, tiles_b=128
    )
    nh = int(jnp.sum(hit.prim_idx >= 0))
    print(f"hits {nh}/{W*H}, overflow={bool(overflow)}", file=sys.stderr)

    def mk(k):
        def run():
            def body(i, acc):
                r2 = rays._replace(
                    direction=rays.direction * (1.0 + i.astype(jnp.float32) * 1e-7)
                )
                h, c, o = raster._render_xla_impl(
                    packed.tris_sorted,
                    packed.prim_ids,
                    r2,
                    tr,
                    W,
                    H,
                    16,
                    cap_a,
                    256,
                    128,
                    leaf,
                )
                return acc + h.t[0] + h.u[1]
            return lax.fori_loop(0, k, body, 0.0)
        return run

    ms = slope(mk)
    mrays = (W * H) / (ms * 1e-3) / 1e6
    print(f"raster(L={leaf},capA={cap_a}): {ms:.3f} ms = {mrays:.1f} Mrays/s")


if __name__ == "__main__":
    main()
