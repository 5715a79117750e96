"""PLOC round cost by stage size on the real TPU."""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from tpu_bvh.models import lbvh
from tpu_bvh.ops import ploc
from tpu_bvh.utils import scenes


def _t(f):
    t0 = time.perf_counter()
    np.asarray(f())
    return time.perf_counter() - t0


def slope(make_loop, k_lo=2, k_hi=10, reps=3):
    f_lo = jax.jit(make_loop(k_lo))
    f_hi = jax.jit(make_loop(k_hi))
    np.asarray(f_lo())
    np.asarray(f_hi())
    lo = min(_t(f_lo) for _ in range(reps))
    hi = min(_t(f_hi) for _ in range(reps))
    return (hi - lo) / (k_hi - k_lo) * 1e3


def main():
    tris = jnp.asarray(scenes.sponza_like(262_000))
    codes, leaf_min, leaf_max, _ = jax.jit(
        lambda t: lbvh._sorted_leaves_from_tris(t, True)
    )(tris)
    n = leaf_min.shape[0]

    as_f = lambda x: lax.bitcast_convert_type(x, jnp.float32)
    for size in (262_144, 65_536, 16_384, 4_096):
        sz = min(size, n)
        cnode = jnp.arange(sz, dtype=jnp.int32) + (n - 1)
        mat = jnp.stack(
            [
                leaf_min[:sz, 0], leaf_min[:sz, 1], leaf_min[:sz, 2],
                -leaf_max[:sz, 0], -leaf_max[:sz, 1], -leaf_max[:sz, 2],
                as_f(codes[:sz].astype(jnp.int32)), as_f(cnode),
            ],
            axis=0,
        )
        nodes = jnp.zeros((8, 2 * n + 8704), jnp.float32)
        state0 = (
            jnp.asarray(sz, jnp.int32), jnp.asarray(32, jnp.int32), mat, nodes
        )

        def mk(k, state0=state0):
            def run():
                def body(i, s):
                    (nc, sb, m, nd) = s
                    m = m.at[6].set(m[6] + i.astype(jnp.float32) * 0)
                    s2 = ploc._round((nc, sb, m, nd), 8)
                    # keep cluster count fixed so every iteration does the
                    # same-size work (ignore the real shrink)
                    return (nc, sb, s2[2], s2[3])

                out = lax.fori_loop(0, k, body, state0)
                return out[2][0, 0] + out[3][0, 0]
            return run

        ms = slope(mk)
        print(f"one PLOC round @ {sz:>7}: {ms:7.3f} ms", flush=True)

    # count rounds for the real build (host loop replication)
    from tpu_bvh.ops.ploc import _STAGE_RATIO, _MIN_STAGE
    print(f"stage ratio {_STAGE_RATIO}, min stage {_MIN_STAGE}", flush=True)

    # sort cost vs payload operand count at 262K
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, 2**31, 262_144), jnp.uint32)
    for n_pay in (1, 4, 8):
        pays = [jnp.asarray(rng.normal(size=262_144), jnp.float32)
                for _ in range(n_pay)]

        def mk(k, pays=pays):
            def run():
                def body(i, acc):
                    out = lax.sort(tuple([keys + i.astype(jnp.uint32)] + pays),
                                   num_keys=1, is_stable=True)
                    return acc + out[1][0]
                return lax.fori_loop(0, k, body, 0.0)
            return run

        print(f"sort 262K + {n_pay} payloads: {slope(mk):7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
