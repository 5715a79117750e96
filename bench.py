"""Benchmark harness — run on the real TPU chip.

Headline metric (BASELINE.md): full LBVH build (extents + Morton + sort +
topology + refit, the reference's "Total" accounting,
`/root/reference/src/TwoPassLbvh.cpp:308-309`) of a sponza-scale 260K-tri
scene. Baseline: reference two-pass LBVH Sponza Total = 1.4836 ms on an
RX6800 (`README.md:67-85`).

Prints ONE JSON line on stdout:
  {"metric": ..., "value": ms, "unit": "ms", "vs_baseline": speedup}
(vs_baseline > 1 means faster than the reference). Detail goes to stderr.
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_SPONZA_TOTAL_MS = 1.4836


def _time_best(fn, *args, warmup=2, iters=10):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main() -> None:
    from tpu_bvh.models import lbvh
    from tpu_bvh.ops import collapse, traverse
    from tpu_bvh.utils import camera, scenes
    from tpu_bvh.utils.cost import sah_cost_bvh2

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    tris_np = scenes.sponza_like(262_000)
    tris = jax.device_put(jnp.asarray(tris_np), dev)
    n = tris.shape[0]
    print(f"scene: sponza_like {n} tris", file=sys.stderr)

    results = {}
    for name, build in [
        ("two_pass", lbvh.build_two_pass),
        ("single_pass", lbvh.build_single_pass),
    ]:
        ms = _time_best(build, tris)
        bvh = build(tris)
        cost = float(sah_cost_bvh2(bvh))
        results[name] = ms
        print(f"{name}: build={ms:.3f} ms  sah_bvh2={cost:.2f}", file=sys.stderr)

    bvh = lbvh.build_two_pass(tris)
    try:
        ms_collapse = _time_best(collapse.collapse_bvh2_to_bvh4, bvh, iters=5)
        print(f"collapse: {ms_collapse:.3f} ms", file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        print(f"collapse bench failed: {e}", file=sys.stderr)

    # traversal throughput (primary rays)
    try:
        tr, cam = scenes.preset("sponza")
        w = h = 1024
        rays = camera.generate_rays(cam, w, h)
        ms_trace = _time_best(
            lambda b, t, r, x: traverse.traverse_bvh2(b, t, r, x, variant="speculative"),
            bvh,
            tris,
            rays,
            tr,
            warmup=1,
            iters=3,
        )
        mrays = (w * h) / (ms_trace * 1e-3) / 1e6
        print(f"traversal: {ms_trace:.3f} ms for {w}x{h} = {mrays:.1f} Mrays/s", file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        print(f"traversal bench failed: {e}", file=sys.stderr)

    value = results["two_pass"]
    print(
        json.dumps(
            {
                "metric": "sponza_260k_lbvh_build_ms",
                "value": round(value, 4),
                "unit": "ms",
                "vs_baseline": round(BASELINE_SPONZA_TOTAL_MS / value, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
