"""Structure stats for the collapse redesign: locality of parent/child links
in boundary (split-position) layout, tree depth, wide fraction. CPU backend."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np
import jax
import jax.numpy as jnp

from tpu_bvh.models import lbvh
from tpu_bvh.utils import scenes


def main(n=262_000):
    tris = jnp.asarray(scenes.sponza_like(n))
    bvh = jax.block_until_ready(lbvh.build_single_pass(tris))
    n_leaves = bvh.n_leaves
    n_int = bvh.n_internal
    left = np.asarray(bvh.left)
    right = np.asarray(bvh.right)
    root = int(bvh.root)
    pk = np.asarray(bvh.packed_t)
    ext = np.maximum(-pk[3:6] - pk[0:3], 0.0)
    area = 2.0 * (ext[0] * ext[1] + ext[0] * ext[2] + ext[1] * ext[2])

    # parent array
    parent = np.full(2 * n_leaves - 1, -1, np.int64)
    src = np.arange(n_int)
    parent[left[:n_int]] = src
    parent[right[:n_int]] = src

    # child distance (internal children only), boundary layout
    for name, ch in (("left", left[:n_int]), ("right", right[:n_int])):
        is_int = ch < n_int
        d = np.abs(ch[is_int] - src[is_int])
        for r in (8, 16, 32, 64, 128, 512, 4096):
            print(f"child {name}: |d|<={r}: {np.mean(d <= r)*100:.2f}%")
        print(f"child {name}: max |d| = {d.max()}")

    # parent distance for internal nodes
    p = parent[:n_int]
    has = p >= 0
    dp = np.abs(p[has] - src[has])
    for r in (8, 16, 32, 64, 128, 512, 4096):
        print(f"parent: |d|<={r}: {np.mean(dp <= r)*100:.2f}%")
    print(f"parent: max |d| = {dp.max()}")

    # depth: iterate levels from root
    depth = np.full(2 * n_leaves - 1, -1, np.int64)
    depth[root] = 0
    frontier = [root]
    lvl = 0
    sizes = []
    while frontier:
        nxt = []
        for x in frontier:
            if x < n_int:
                for c in (left[x], right[x]):
                    depth[c] = lvl + 1
                    nxt.append(int(c))
        sizes.append(len(frontier))
        frontier = nxt
        lvl += 1
    print(f"max depth = {lvl-1}, levels with >1000 nodes: "
          f"{sum(1 for s in sizes if s > 1000)}")
    d_int = depth[:n_int]
    print(f"internal depth p50/p90/p99/max: {np.percentile(d_int, [50,90,99]).astype(int)} {d_int.max()}")

    # expansion simulation (vectorized, like ops/collapse.py phase 1)
    mm = 2 * n_leaves - 1
    ids = np.stack([left[:n_int], right[:n_int],
                    np.full(n_int, -1), np.full(n_int, -1)], 1)
    count = np.full(n_int, 2)
    for _ in range(2):
        is_int2 = (ids >= 0) & (ids < n_int)
        a = np.where(is_int2, area[np.clip(ids, 0, mm - 1)], -1.0)
        pos = np.argmax(a, 1)
        best = a[src, pos]
        do = best > 0
        chosen = ids[src, pos]
        cs = np.clip(chosen, 0, mm - 1)
        ids[do, pos[do]] = left[cs][do]
        ids[do, count[do]] = right[cs][do]
        count += do

    # wide fraction via BFS from root using expansion ids
    wide = np.zeros(n_int, bool)
    q = [root]
    wide[root] = True
    cnt = 0
    while q:
        x = q.pop()
        cnt += 1
        for k in range(count[x]):
            c = ids[x, k]
            if 0 <= c < n_int:
                wide[c] = True
                q.append(int(c))
    print(f"wide nodes: {cnt} / {n_int} = {cnt/n_int*100:.1f}%")

    # expansion slot distance from node (boundary layout)
    dd = np.abs(ids - src[:, None])
    m_int = (ids >= 0) & (ids < n_int)
    m_leaf = ids >= n_int
    # leaf slot j corresponds to boundary-adjacent leaf (ids - n_int)
    dleaf = np.abs((ids - n_int) - src[:, None])
    alld = np.concatenate([dd[m_int], dleaf[m_leaf]])
    for r in (8, 16, 32, 64, 128):
        print(f"expansion slots: |d|<={r}: {np.mean(alld <= r)*100:.2f}%")


if __name__ == "__main__":
    import sys
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 262_000)


def exit_stats(n=262_000, R=32):
    """Distance from each node to its first ancestor with range > R
    (the 'C set' the blocked collapse freezes its local DP at)."""
    import jax
    import jax.numpy as jnp
    tris = jnp.asarray(scenes.sponza_like(n))
    bvh = jax.block_until_ready(lbvh.build_single_pass(tris))
    n_int = bvh.n_internal
    left = np.asarray(bvh.left); right = np.asarray(bvh.right)
    root = int(bvh.root)
    parent = np.full(2 * (n_int + 1) - 1, -1, np.int64)
    src = np.arange(n_int)
    parent[left[:n_int]] = src
    parent[right[:n_int]] = src
    # ranges via leaf-count DP (iterative, bottom-up by processing order)
    import sys
    sys.setrecursionlimit(10**6)
    size = np.zeros(n_int, np.int64)
    # postorder via stack
    st = [(root, False)]
    while st:
        x, done = st.pop()
        if x >= n_int:
            continue
        if done:
            l, r = left[x], right[x]
            sl = size[l] if l < n_int else 1
            sr = size[r] if r < n_int else 1
            size[x] = sl + sr
        else:
            st.append((x, True))
            for c in (left[x], right[x]):
                if c < n_int:
                    st.append((int(c), False))
    in_c = size > R  # range length (leaves) > R+1-ish; close enough
    in_c[root] = True
    # chain from each internal node to first C ancestor
    hops_hist = []
    dist = np.zeros(n_int, np.int64)
    hops = np.zeros(n_int, np.int64)
    cur = parent[:n_int].copy()
    unresolved = (~in_c) & (cur >= 0)
    exit_node = np.where(in_c, src, -1)
    k = 0
    live = ~in_c
    exitp = np.full(n_int, -1, np.int64)
    cur = src.copy()
    while live.any() and k < 100:
        nxt = parent[cur]
        hit = live & (nxt >= 0) & in_c[np.clip(nxt, 0, n_int - 1)]
        exitp[hit] = nxt[hit]
        live = live & ~hit
        cur = np.where(live, np.maximum(nxt, 0), cur)
        hops[live] += 1
        k += 1
    d = np.abs(exitp - src)[exitp >= 0]
    print(f"R={R}: |C|={in_c.sum()} ({in_c.mean()*100:.1f}%), "
          f"max chain hops={hops.max()}")
    for r in (16, 32, 64, 128, 256):
        print(f"  |exit - i| <= {r}: {np.mean(d <= r)*100:.2f}%")
    hh = hops[~in_c]
    for hmax in (4, 8, 12, 16, 24, 32, 48):
        print(f"  chain hops <= {hmax}: {np.mean(hh <= hmax)*100:.3f}%")
