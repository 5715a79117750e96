"""Probe: does Mosaic/v5e support vectorized in-VMEM gathers, and how fast?

Tries several formulations of y[i] = x[idx[i]] inside one Pallas block.
"""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 8192  # one block


def probe(name, kernel, x, idx):
    try:
        f = jax.jit(
            lambda x, idx: pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x, idx)
        )
        out = np.asarray(jax.block_until_ready(f(x, idx)))
        ok = np.array_equal(out, np.asarray(x)[np.asarray(idx)])
        # time it: loop inside jit
        def loop(k):
            def body(i, acc):
                o = pl.pallas_call(
                    kernel,
                    out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                              pl.BlockSpec(memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                )(x + acc.astype(x.dtype) * 0, idx)
                return acc + o[0, 0]
            return lax.fori_loop(0, k, body, jnp.zeros((), x.dtype))
        g = jax.jit(loop)
        np.asarray(g(jnp.int32(2))); np.asarray(g(jnp.int32(34)))
        t = lambda k: min(
            (lambda t0: (np.asarray(g(k)), time.perf_counter() - t0)[1])(
                time.perf_counter()
            )
            for _ in range(5)
        )
        ms = (t(jnp.int32(34)) - t(jnp.int32(2))) / 32 * 1e3
        print(f"{name}: ok={ok} {ms:.4f} ms/call for {x.size} elems")
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAILED {type(e).__name__}: {msg}")


def main():
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)

    # 2D [rows, 128] gather along sublanes: y[i, :] = x[idx[i], :]
    x2 = jnp.asarray(rng.standard_normal((N // 128, 128)), jnp.float32)
    idxr = jnp.asarray(rng.integers(0, N // 128, N // 128), jnp.int32)

    def k_rows(x_ref, i_ref, o_ref):
        o_ref[:] = x_ref[i_ref[:], :]

    probe("row gather x[idx[:], :]", k_rows, x2, idxr)

    def k_take(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(x_ref[:], i_ref[:], axis=0)

    probe("jnp.take axis=0", k_take, x2, idxr)

    # gather along lanes with take_along_axis: y[r, i] = x[r, idx[r, i]]
    x2l = jnp.asarray(rng.standard_normal((8, N)), jnp.float32)
    idxl = jnp.asarray(rng.integers(0, N, (8, N)), jnp.int32)

    def k_tal(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)

    try:
        f = jax.jit(
            lambda x, idx: pl.pallas_call(
                k_tal,
                out_shape=jax.ShapeDtypeStruct(x2l.shape, x2l.dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x, idx)
        )
        out = np.asarray(jax.block_until_ready(f(x2l, idxl)))
        ok = np.array_equal(
            out, np.take_along_axis(np.asarray(x2l), np.asarray(idxl), 1)
        )
        print(f"take_along_axis lanes: ok={ok}")
    except Exception as e:  # noqa: BLE001
        print(f"take_along_axis lanes: FAILED {type(e).__name__}: "
              f"{str(e).splitlines()[0][:160]}")

    # gather along sublanes with take_along_axis axis=0 on [N/128, 128]
    idxs = jnp.asarray(rng.integers(0, N // 128, (N // 128, 128)), jnp.int32)

    def k_tas(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)

    try:
        f = jax.jit(
            lambda x, idx: pl.pallas_call(
                k_tas,
                out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x, idx)
        )
        out = np.asarray(jax.block_until_ready(f(x2, idxs)))
        ok = np.array_equal(
            out, np.take_along_axis(np.asarray(x2), np.asarray(idxs), 0)
        )
        print(f"take_along_axis sublanes: ok={ok}")
    except Exception as e:  # noqa: BLE001
        print(f"take_along_axis sublanes: FAILED {type(e).__name__}: "
              f"{str(e).splitlines()[0][:160]}")


if __name__ == "__main__":
    main()
