"""Parity: fused Pallas refit dense-phase kernel vs the XLA window loop,
in interpret mode on CPU, plus end-to-end refit_anchored equivalence."""
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from tpu_bvh.ops.pallas.refit_dense import refit_dense_pallas

I32 = jnp.int32
BIG = 3.0e38


def _mk(rng, n, radius):
    leaf_min = rng.random((n, 3), dtype=np.float32)
    leaf_max = leaf_min + 0.05 + rng.random((n, 3), dtype=np.float32)
    m = n - 1
    # boundary-ordered ranges: first <= i < i+1 <= last, mixed lengths
    i = np.arange(m)
    span_l = rng.integers(0, 3 * radius, m)
    span_r = rng.integers(0, 3 * radius, m)
    first = np.maximum(i - span_l, 0).astype(np.int32)
    last = np.minimum(i + 1 + span_r, n - 1).astype(np.int32)
    return leaf_min, leaf_max, first, last


def _xla_dense(leaf_min, leaf_max, first, last, radius):
    n = leaf_min.shape[0]
    m = n - 1
    i = jnp.arange(m, dtype=I32)
    packed = jnp.concatenate([leaf_min, -leaf_max], axis=1)
    short = (i - first < radius) & (last - i <= radius)
    pad_t = jnp.full((6, radius), BIG)
    packed_t = jnp.concatenate([pad_t, packed.T, pad_t], axis=1)
    acc_t = jnp.full((6, m), BIG)
    for d in range(-radius + 1, radius + 1):
        shifted = lax.dynamic_slice(packed_t, (0, radius + d), (6, m))
        j = i + d
        valid = (j >= first) & (j <= last)
        acc_t = jnp.where(valid[None, :], jnp.minimum(acc_t, shifted), acc_t)
    # fine level-4 table (clamped windows)
    cur = packed.T
    for k in range(1, 5):
        s = 1 << (k - 1)
        if s < n:
            shifted = jnp.concatenate(
                [cur[:, s:], jnp.broadcast_to(cur[:, -1:], (6, s))], axis=1
            )
            cur = jnp.minimum(cur, shifted)
    return acc_t, short, cur


@pytest.mark.parametrize("n", [64, 257, 1024])
@pytest.mark.parametrize("radius", [16, 24])
def test_dense_kernel_matches_xla(n, radius, monkeypatch):
    from tpu_bvh.ops.pallas import refit_dense
    monkeypatch.setattr(refit_dense, "_BLK", 256)  # force multi-block
    rng = np.random.default_rng(n + radius)
    leaf_min, leaf_max, first, last = _mk(rng, n, radius)
    a1, s1, t1 = _xla_dense(
        jnp.asarray(leaf_min), jnp.asarray(leaf_max),
        jnp.asarray(first), jnp.asarray(last), radius,
    )

    packed = jnp.concatenate([jnp.asarray(leaf_min), -jnp.asarray(leaf_max)], axis=1)
    as_i = lambda x: lax.bitcast_convert_type(x, I32)
    onecol = jnp.full((1,), n - 1, I32)
    mat = jnp.concatenate(
        [
            as_i(packed.T),
            jnp.concatenate([jnp.asarray(first), onecol])[None, :],
            jnp.concatenate([jnp.asarray(last), onecol])[None, :],
        ],
        axis=0,
    )
    a2, s2, t2 = refit_dense_pallas(mat, n, radius, interpret=True)
    m = n - 1
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2)[:m])
    sh = np.asarray(s1)
    np.testing.assert_array_equal(
        np.asarray(a1)[:, sh], np.asarray(a2)[:, :m][:, sh]
    )
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def test_refit_anchored_unchanged_on_cpu():
    """refit_anchored still takes the XLA path on CPU and matches a brute
    -force range reduction."""
    from tpu_bvh.ops.refit import refit_anchored

    rng = np.random.default_rng(7)
    n = 500
    leaf_min, leaf_max, first, last = _mk(rng, n, 16)
    mn, mx = refit_anchored(
        jnp.asarray(leaf_min), jnp.asarray(leaf_max),
        jnp.asarray(first), jnp.asarray(last),
    )
    for k in [0, 1, 5, 100, n - 2]:
        f, l = first[k], last[k]
        np.testing.assert_allclose(
            np.asarray(mn)[k], leaf_min[f:l + 1].min(axis=0), rtol=0
        )
        np.testing.assert_allclose(
            np.asarray(mx)[k], leaf_max[f:l + 1].max(axis=0), rtol=0
        )
