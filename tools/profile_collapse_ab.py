"""A/B the working-tree collapse_fast against a git ref, SAME process.

The chip/tunnel throughput drifts by up to 2x between processes (identical
code measured 0.38 vs 0.77 ms in consecutive runs), so cross-run
comparisons are meaningless. This tool materializes `collapse_fast` from a
git ref as a sibling module, compiles both variants in one process, and
interleaves their timing rounds so drift hits both equally.

Usage: python tools/profile_collapse_ab.py [ref]   (default HEAD)
"""
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REF = sys.argv[1] if len(sys.argv) > 1 else "HEAD"
old_src = subprocess.run(
    ["git", "-C", REPO, "show", f"{REF}:tpu_bvh/ops/collapse_fast.py"],
    capture_output=True, text=True, check=True,
).stdout
old_path = os.path.join(REPO, "tpu_bvh", "ops", "_cfab_old.py")
with open(old_path, "w") as f:
    f.write(old_src)

try:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    from jax import lax

    from tpu_bvh.models import lbvh
    from tpu_bvh.utils import scenes
    import tpu_bvh.ops.collapse_fast as NEW
    import tpu_bvh.ops._cfab_old as OLD

    I32 = jnp.int32
    n = 262_000
    tris = jax.device_put(jnp.asarray(scenes.sponza_like(n)))
    bvh, parent, first, last = jax.block_until_ready(
        lbvh.build_single_pass_aux(tris)
    )

    def consume(w):
        return (
            w.slot_packed_t[0, 0, 0]
            + (w.child_t[0, 0] + w.child_count[1] + w.parent[2]
               + w.leaf_parent[3] + w.leaf_prim[4] + w.n_nodes
               ).astype(jnp.float32)
        )

    def mk(mod):
        def loop(k):
            def body(i, acc):
                b = bvh._replace(
                    packed_t=bvh.packed_t * (1.0 + i.astype(jnp.float32) * 3e-7)
                )
                w = mod.collapse_lbvh_to_bvh4(b, parent, first, last)
                return acc + consume(w)

            return lax.fori_loop(0, k, body, 0.0)

        return jax.jit(loop)

    fns = {"old": mk(OLD), "new": mk(NEW)}
    klo = jnp.asarray(1, I32)
    khi = jnp.asarray(5, I32)
    for name, f in fns.items():
        jax.block_until_ready(f(klo))
        jax.block_until_ready(f(khi))
        print(f"compiled {name}", flush=True)

    def t(f, k):
        t0 = time.perf_counter()
        jax.block_until_ready(f(k))
        return time.perf_counter() - t0

    obs = {name: [] for name in fns}
    for rnd in range(4):
        for name, f in fns.items():
            lo = min(t(f, klo) for _ in range(3))
            hi = min(t(f, khi) for _ in range(3))
            obs[name].append((hi - lo) / 4 * 1e3)
    for name, xs in obs.items():
        print(
            f"{name}: min {min(xs):7.3f} ms   rounds "
            + " ".join(f"{x:7.3f}" for x in xs),
            flush=True,
        )
finally:
    os.remove(old_path)
