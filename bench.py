"""Benchmark harness — run on the real TPU chip.

Headline metric (BASELINE.md): full LBVH build (extents + Morton + sort +
topology + refit, the reference's "Total" accounting,
`/root/reference/src/TwoPassLbvh.cpp:308-309`) of a sponza-scale 260K-tri
scene, single-pass builder (our flagship). Baseline: reference single-pass
LBVH Sponza Total = 0.9886 ms on an RX6800 (`README.md:109-127`).

Timing methodology: the axon tunnel adds a ~26 ms fixed dispatch/readback
latency per call, so each build is iterated K times *inside one jit*
(`lax.fori_loop`, input perturbed per iteration so nothing is hoisted or
memoized) and per-build time is the slope between two loop lengths. This
measures pure on-device time, which is what a production (untunneled)
deployment sees.

Prints ONE JSON line on stdout:
  {"metric": ..., "value": ms, "unit": "ms", "vs_baseline": speedup}
(vs_baseline > 1 means faster than the reference). Detail goes to stderr.
"""
from __future__ import annotations

import json
import sys
import time

import jax

# persistent compile cache: tunneled TPU compiles cost 15-100 s per shape,
# so reuse executables across invocations
try:
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # noqa: BLE001
    pass

import jax.numpy as jnp
import numpy as np
from jax import lax

BASELINES_MS = {
    "single_pass": 0.9886,  # README.md:109-127 Sponza Total
    "two_pass": 1.4836,  # README.md:67-85
    "ploc": 1.6410,  # README.md:193-209
    "hploc": 1.3508,  # README.md:151-167
}
HEADLINE = "single_pass"


def _slope_time(make_loop, k_lo=2, k_hi=12, reps=3):
    """Per-iteration ms via the slope between two in-jit loop lengths."""
    f_lo = jax.jit(make_loop(k_lo))
    f_hi = jax.jit(make_loop(k_hi))
    np.asarray(f_lo())
    np.asarray(f_hi())
    lo = min(_t(f_lo) for _ in range(reps))
    hi = min(_t(f_hi) for _ in range(reps))
    return (hi - lo) / (k_hi - k_lo) * 1e3


def _t(f):
    t0 = time.perf_counter()
    np.asarray(f())
    return time.perf_counter() - t0


def main() -> None:
    from tpu_bvh.models import lbvh, ploc
    from tpu_bvh.utils import scenes

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    tris_np = scenes.sponza_like(262_000)
    tris = jax.device_put(jnp.asarray(tris_np), dev)
    print(f"scene: sponza_like {tris.shape[0]} tris", file=sys.stderr)

    builders = {
        "single_pass": lbvh.build_single_pass,
        "two_pass": lbvh.build_two_pass,
    }
    results = {}
    for name, build in builders.items():
        def make_loop(k, build=build):
            def run():
                def body(i, acc):
                    t = tris + (i.astype(jnp.float32) * 1e-7)
                    bvh = build(t)
                    return acc + bvh.node_min[0, 0] + bvh.left[0].astype(jnp.float32)
                return lax.fori_loop(0, k, body, 0.0)

            return run

        try:
            ms = _slope_time(make_loop)
            results[name] = ms
            print(
                f"{name}: build {ms:.3f} ms "
                f"(vs ref {BASELINES_MS[name]:.3f} ms -> {BASELINES_MS[name]/ms:.2f}x)",
                file=sys.stderr,
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name} bench failed: {e}", file=sys.stderr)

    from tpu_bvh.utils.cost import sah_cost_bvh2

    for name, build in builders.items():
        try:
            c = float(sah_cost_bvh2(build(tris)))
            print(f"{name}: sah_bvh2 {c:.2f}", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"{name} cost failed: {e}", file=sys.stderr)

    # BVH2 -> BVH4 collapse (reference: 3.64 ms sponza, README.md:79)
    try:
        from tpu_bvh.ops import collapse as collapse_ops

        bvh0 = lbvh.build_single_pass(tris)

        def make_collapse_loop(k):
            def run():
                def body(i, acc):
                    b = bvh0._replace(
                        node_min=bvh0.node_min + i.astype(jnp.float32) * 0.0
                    )
                    wide = collapse_ops.collapse_bvh2_to_bvh4(b)
                    return acc + wide.child_min[0, 0, 0] + i.astype(jnp.float32)

                return lax.fori_loop(0, k, body, 0.0)

            return run

        ms = _slope_time(make_collapse_loop, k_lo=1, k_hi=4)
        print(
            f"collapse: {ms:.3f} ms (vs ref 3.638 ms -> {3.638/ms:.2f}x)",
            file=sys.stderr,
        )
    except Exception as e:  # noqa: BLE001
        print(f"collapse bench failed: {e}", file=sys.stderr)

    # batched tiny-mesh throughput (the reference's 4096-mesh demo,
    # main.cpp:39-47; no reference timing published)
    try:
        from tpu_bvh.models import batched

        n_meshes = 4096
        base = np.asarray(scenes.cornellbox(), np.float32)
        tris_b = jnp.asarray(
            np.broadcast_to(base, (n_meshes, *base.shape)).copy()
        )

        def mk_batched(k):
            def run():
                def body(i, acc):
                    t = tris_b + (i.astype(jnp.float32) * 1e-7)
                    b = batched.build_batched(t)
                    return acc + b.node_min[0, 0, 0] + b.left[0, 0].astype(jnp.float32)

                return lax.fori_loop(0, k, body, 0.0)

            return run

        ms = _slope_time(mk_batched, k_lo=1, k_hi=4)
        print(
            f"batched: {n_meshes} meshes x32 prims in {ms:.3f} ms "
            f"= {n_meshes/ms*1e3/1e6:.2f} M meshes/s",
            file=sys.stderr,
        )
    except Exception as e:  # noqa: BLE001
        print(f"batched bench failed: {e}", file=sys.stderr)

    import os

    if os.environ.get("TPU_BVH_BENCH_ALL"):
        from tpu_bvh.models import ploc as ploc_models

        for name, build, base in [
            ("ploc", ploc_models.build_ploc, BASELINES_MS["ploc"]),
            ("hploc", ploc_models.build_hploc, BASELINES_MS["hploc"]),
        ]:
            try:
                def mk(k, build=build):
                    def run():
                        def body(i, acc):
                            t = tris + (i.astype(jnp.float32) * 1e-7)
                            b = build(t)
                            return acc + b.node_min[0, 0]

                        return lax.fori_loop(0, k, body, 0.0)

                    return run

                ms = _slope_time(mk, k_lo=1, k_hi=3)
                print(
                    f"{name}: build {ms:.3f} ms (vs ref {base:.3f} -> {base/ms:.2f}x)",
                    file=sys.stderr,
                )
            except Exception as e:  # noqa: BLE001
                print(f"{name} bench failed: {e}", file=sys.stderr)

    # traversal/render throughput, 512x512 primary rays on sponza:
    # raster engine (the TPU-native fast path) + packed wavefront reference
    try:
        from tpu_bvh.ops import raster, raster_tpu
        from tpu_bvh.utils import camera, scenes as sc

        bvh = lbvh.build_single_pass(tris)
        tr, cam = sc.preset("sponza")
        w = h = 512
        rays = camera.generate_rays(cam, w, h)
        rpack = raster.pack_raster(bvh, tris, leaf_size=64)

        def make_loop(k):
            def run():
                def body(i, acc):
                    r2 = rays._replace(
                        direction=rays.direction
                        * (1.0 + i.astype(jnp.float32) * 1e-7)
                    )
                    hit, _ = raster_tpu._render_tpu_impl(
                        rpack.tris_sorted, rpack.prim_ids, r2, tr,
                        w, h, 1024, 4096, 32, 64, False,
                    )
                    return acc + hit.t[0] + hit.u[1]

                return lax.fori_loop(0, k, body, 0.0)

            return run

        ms = _slope_time(make_loop, k_lo=2, k_hi=8, reps=3)
        mrays = (w * h) / (ms * 1e-3) / 1e6
        print(
            f"render(raster): {ms:.3f} ms for {w}x{h} = {mrays:.1f} Mrays/s",
            file=sys.stderr,
        )
    except Exception as e:  # noqa: BLE001
        print(f"raster bench failed: {e}", file=sys.stderr)

    if os.environ.get("TPU_BVH_BENCH_ALL"):
        try:
            from tpu_bvh.ops import traverse
            from tpu_bvh.utils import camera, scenes as sc

            bvh = lbvh.build_single_pass(tris)
            packed = traverse.pack_bvh2(bvh, tris)
            tr, cam = sc.preset("sponza")
            w = h = 512
            rays = camera.generate_rays(cam, w, h)
            ni = bvh.n_internal
            root = bvh.root

            def make_loop(k):
                def run():
                    def body(i, acc):
                        r2 = rays._replace(
                            origin=rays.origin + i.astype(jnp.float32) * 1e-6
                        )
                        hit, _ = traverse.traverse_packed(packed, ni, root, r2, tr)
                        return acc + hit.t[0]

                    return lax.fori_loop(0, k, body, 0.0)

                return run

            ms = _slope_time(make_loop, k_lo=1, k_hi=4, reps=3)
            mrays = (w * h) / (ms * 1e-3) / 1e6
            print(
                f"traversal(packed wavefront): {ms:.3f} ms = {mrays:.1f} Mrays/s",
                file=sys.stderr,
            )
        except Exception as e:  # noqa: BLE001
            print(f"traversal bench failed: {e}", file=sys.stderr)

    value = results.get(HEADLINE)
    if value is None:
        print(json.dumps({"metric": "sponza_260k_lbvh_build_ms", "value": -1,
                          "unit": "ms", "vs_baseline": 0}))
        return
    print(
        json.dumps(
            {
                "metric": "sponza_260k_singlepass_lbvh_build_ms",
                "value": round(value, 4),
                "unit": "ms",
                "vs_baseline": round(BASELINES_MS[HEADLINE] / value, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
