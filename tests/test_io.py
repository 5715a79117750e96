"""IO layer: native C++ loader/writer vs Python fallbacks, serialization,
split clipping."""
import os

import numpy as np
import pytest

from tests.conftest import random_tris
from tpu_bvh.utils import image, native, obj, serialize, split_clip

CORNELL = "/root/reference/src/Meshes/cornellbox/cornellBox.obj"


def test_native_builds():
    assert native.available(), "native lib should build in this environment"


@pytest.mark.skipif(not os.path.exists(CORNELL), reason="asset missing")
def test_native_obj_matches_python():
    a = obj.load_obj(CORNELL, prefer_native=False)
    b = native.load_obj(CORNELL)
    assert a.shape == b.shape
    assert np.allclose(a, b)


def test_obj_roundtrip(tmp_path):
    path = tmp_path / "tri.obj"
    path.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\nf 1 2 3\nf 2 4 3\nf -4 -3 -2 -1\n"
    )
    tris = obj.load_obj(str(path), prefer_native=False)
    tris_n = native.load_obj(str(path))
    assert tris.shape == (4, 3, 3)  # quad fan adds 2
    assert np.allclose(tris, tris_n)


def test_png_native_matches_python(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(17, 23, 4), dtype=np.uint8)
    p1 = tmp_path / "py.png"
    p2 = tmp_path / "native.png"
    image.write_png(str(p1), img, prefer_native=False)
    native.write_png(str(p2), img)
    # decode both with zlib-level parsing: compare IDAT-decompressed bytes
    import struct, zlib

    def decode(path):
        data = path.read_bytes()
        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        off = 8
        idat = b""
        while off < len(data):
            (ln,) = struct.unpack(">I", data[off : off + 4])
            tag = data[off + 4 : off + 8]
            if tag == b"IDAT":
                idat += data[off + 8 : off + 8 + ln]
            off += 12 + ln
        return zlib.decompress(idat)

    assert decode(p1) == decode(p2)


def test_serialize_roundtrip(rng, tmp_path):
    from tpu_bvh.models import lbvh
    from tpu_bvh.ops import collapse

    tris = random_tris(rng, 50)
    bvh = lbvh.build_two_pass(tris)
    p = tmp_path / "bvh.npz"
    serialize.save_bvh(str(p), bvh)
    back = serialize.load_bvh(str(p))
    for a, b in zip(bvh, back):
        assert np.array_equal(np.asarray(a), np.asarray(b))

    wide = collapse.collapse_bvh2_to_bvh4(bvh)
    p4 = tmp_path / "bvh4.npz"
    serialize.save_bvh(str(p4), wide)
    back4 = serialize.load_bvh(str(p4))
    for a, b in zip(wide, back4):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_split_clipping_identity(rng):
    tris = random_tris(rng, 20)
    mn, mx, idx = split_clip.early_split_clipping(tris, np.inf)
    assert len(idx) == 20
    assert np.array_equal(idx, np.arange(20))


def test_split_clipping_splits(rng):
    tris = random_tris(rng, 30, spread=2.0, size=2.0)
    full_mn = tris.min(axis=1)
    full_mx = tris.max(axis=1)
    areas = split_clip._area(full_mn, full_mx)
    sa_max = float(np.median(areas))
    mn, mx, idx = split_clip.early_split_clipping(tris, sa_max)
    assert len(idx) > 30  # something split
    assert (split_clip._area(mn, mx) <= sa_max + 1e-4).all()
    # refs stay inside their primitive's AABB and every prim is covered
    assert set(idx.tolist()) == set(range(30))
    for k in range(len(idx)):
        p = idx[k]
        assert (mn[k] >= full_mn[p] - 1e-5).all()
        assert (mx[k] <= full_mx[p] + 1e-5).all()


def test_build_from_split_refs(rng):
    """PrimRefs from clipping feed the builders (the reference's
    USE_PRIM_SPLITTING path, TwoPassLbvh.cpp:22-32)."""
    import jax.numpy as jnp

    from tpu_bvh.models import lbvh
    from tpu_bvh.types import PrimRefs
    from tpu_bvh.utils import validate

    tris = random_tris(rng, 40, spread=2.0, size=2.0)
    mn, mx, idx = split_clip.early_split_clipping(
        tris, float(np.median(split_clip._area(tris.min(1), tris.max(1))))
    )
    refs = PrimRefs(
        aabb_min=jnp.asarray(mn), aabb_max=jnp.asarray(mx), prim_idx=jnp.asarray(idx)
    )
    bvh = lbvh.build_two_pass_refs(refs)
    # with prim splitting, leaf prims repeat: check structure only
    assert validate.check_root_aabb(bvh)
    prims = validate.collect_leaf_prims(bvh)
    assert len(prims) == len(idx)
    assert set(prims.tolist()) == set(range(40))


def test_pallas_kernel_report():
    """Introspection parity (`Kernel.cpp:170-182` analog): every pallas_call
    in a build is reported with grid + VMEM working set."""
    import numpy as np
    import jax.numpy as jnp

    from tpu_bvh.ops.pallas.scan32 import scan_core
    from tpu_bvh.utils.introspect import pallas_kernel_report

    d = jnp.asarray(np.random.default_rng(0).integers(2, 31, 8192), jnp.int32)
    reports = pallas_kernel_report(lambda x: scan_core(x), d)
    assert len(reports) == 1
    r = reports[0]
    assert r["grid"] == (2,)
    assert r["vmem_working_set_bytes"] > 0
    assert all(b["bytes"] > 0 for b in r["buffers"])
