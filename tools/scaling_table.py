"""Multi-device CPU scaling smoke table (bench tail; verdict r3 item 10).

Runs under JAX_PLATFORMS=cpu + --xla_force_host_platform_device_count=8
(set by the bench.py caller). Times the sharded batched build and the
sharded single-scene build at 2/4/8 virtual devices — wall-clock only (CPU
virtual devices share one socket, so this quantifies *readiness and
overhead trend*, not ICI speedup; real multi-chip hardware is unavailable
in this environment, BASELINE.md).
"""
import os
import sys
import time

sys.path.insert(0, ".")

# the baked axon sitecustomize registers the TPU plugin regardless of
# JAX_PLATFORMS; pin the CPU backend the same way tests/conftest.py does
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    devs = jax.devices()
    if devs[0].platform != "cpu" or len(devs) < 8:
        print(f"scaling table: need 8 CPU devices, got {devs}", flush=True)
        return

    from jax.sharding import Mesh

    from tpu_bvh.models import batched, lbvh
    from tpu_bvh.parallel import sharded, sharded_build
    from tpu_bvh.utils import scenes

    n_tris = 4096  # single-scene size (divisible by 8; CPU compile-bound)
    soup = np.asarray(scenes.bunny_like(n_tris), np.float32)
    n_meshes = 128
    base = np.asarray(scenes.cornellbox(), np.float32)
    tris_b = jnp.asarray(np.broadcast_to(base, (n_meshes, *base.shape)).copy())

    def timeit(f, reps=3):
        jax.block_until_ready(f())  # compile
        best = min(
            (lambda t0: (jax.block_until_ready(f()), time.perf_counter() - t0)[1])(
                time.perf_counter()
            )
            for _ in range(reps)
        )
        return best * 1e3

    print("multi-device CPU scaling (virtual devices, wall ms):", flush=True)
    print("  devices | batched 512x32 | sharded single-scene 32K | exact",
          flush=True)
    want = lbvh.build_single_pass(jnp.asarray(soup))
    for p in (2, 4, 8):
        mesh = Mesh(np.array(devs[:p]), ("dp",))
        t_b = timeit(lambda: sharded.build_batched_sharded(mesh, tris_b))
        t_s = timeit(
            lambda: sharded_build.build_single_pass_sharded(
                mesh, jnp.asarray(soup)
            )
        )
        sb = sharded_build.build_single_pass_sharded(mesh, jnp.asarray(soup))
        got = sharded_build.to_bvh2(sb, n_tris)
        exact = (
            not bool(sb.overflow)
            and np.array_equal(np.asarray(got.left), np.asarray(want.left))
            and np.array_equal(
                np.asarray(got.node_min), np.asarray(want.node_min)
            )
        )
        print(
            f"  {p:7d} | {t_b:11.1f} ms | {t_s:21.1f} ms | {exact}",
            flush=True,
        )


if __name__ == "__main__":
    main()
