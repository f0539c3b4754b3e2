"""Native host runtime (C++ PNG codec + accessor unpack) vs Python oracles."""

import numpy as np
import pytest

from pathtracer.utils import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable")


def test_png_roundtrip_rgb():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (37, 53, 3), np.uint8)
    data = native.png_encode(img)
    assert data is not None and data[:4] == b"\x89PNG"
    back = native.png_decode(data)
    np.testing.assert_array_equal(back, img)


def test_png_roundtrip_rgba_and_gray():
    rng = np.random.default_rng(1)
    for ch in (1, 4):
        img = rng.integers(0, 256, (16, 9, ch), np.uint8)
        back = native.png_decode(native.png_encode(img))
        np.testing.assert_array_equal(back, img)


def test_png_matches_pil():
    PIL = pytest.importorskip("PIL.Image")
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (24, 31, 3), np.uint8)
    data = native.png_encode(img)
    import io

    pil = np.asarray(PIL.open(io.BytesIO(data)))
    np.testing.assert_array_equal(pil, img)

    # and decode a PIL-written PNG (filters chosen by PIL)
    buf = io.BytesIO()
    PIL.fromarray(img).save(buf, format="PNG")
    back = native.png_decode(buf.getvalue())
    np.testing.assert_array_equal(back, img)


def test_png_palette_trns_matches_pil():
    """Palettized PNG with tRNS decodes to RGBA (alpha-cutout textures)."""
    PIL = pytest.importorskip("PIL.Image")
    import io

    rng = np.random.default_rng(4)
    idx = rng.integers(0, 4, (10, 13), np.uint8)
    im = PIL.fromarray(idx, mode="P")
    im.putpalette([10, 20, 30, 40, 50, 60, 70, 80, 90, 200, 210, 220])
    buf = io.BytesIO()
    im.save(buf, format="PNG", transparency=bytes([255, 128, 0, 64]),
            bits=8)  # keep 8-bit indices (the native decoder's scope)
    data = buf.getvalue()

    back = native.png_decode(data)
    assert back is not None and back.shape == (10, 13, 4)
    ref = np.asarray(PIL.open(io.BytesIO(data)).convert("RGBA"))
    np.testing.assert_array_equal(back, ref)

    # opaque palette still decodes as plain RGB
    buf2 = io.BytesIO()
    im.save(buf2, format="PNG", bits=8)
    back2 = native.png_decode(buf2.getvalue())
    assert back2 is not None and back2.shape == (10, 13, 3)
    ref2 = np.asarray(PIL.open(io.BytesIO(buf2.getvalue())).convert("RGB"))
    np.testing.assert_array_equal(back2, ref2)


def test_accessor_f32_strided_normalized():
    # interleaved [pos f32x3 | normal i16x3 normalized] stride 20
    count = 11
    rng = np.random.default_rng(3)
    pos = rng.normal(size=(count, 3)).astype(np.float32)
    nrm = rng.integers(-32767, 32767, (count, 3), np.int16)
    stride = 12 + 8
    buf = bytearray(count * stride)
    for i in range(count):
        buf[i * stride:i * stride + 12] = pos[i].tobytes()
        buf[i * stride + 12:i * stride + 18] = nrm[i].tobytes()
    got_pos = native.accessor_to_f32(bytes(buf), 0, count, 3, 5126, stride,
                                     False)
    np.testing.assert_array_equal(got_pos, pos)
    got_nrm = native.accessor_to_f32(bytes(buf), 12, count, 3, 5122, stride,
                                     True)
    ref = np.maximum(nrm.astype(np.float32) / 32767.0, -1.0)
    np.testing.assert_allclose(got_nrm, ref, rtol=1e-6)


def test_accessor_i32_u16():
    idx = np.arange(300, dtype=np.uint16) * 7 % 999
    got = native.accessor_to_i32(idx.tobytes(), 0, 300, 5123, 0)
    np.testing.assert_array_equal(got, idx.astype(np.int32))


def test_accessor_bounds_checked():
    assert native.accessor_to_f32(b"\x00" * 10, 0, 4, 3, 5126, 0,
                                  False) is None


def _room_scene(n_clutter=400, seed=11):
    """Huge straddling quads + clutter: the spatial-split trigger case."""
    rng = np.random.default_rng(seed)
    quads = [
        ((-10, 0, -10), (10, 0, -10), (10, 0, 10), (-10, 0, 10)),
        ((-10, 8, -10), (10, 8, -10), (10, 8, 10), (-10, 8, 10)),
        ((-10, 0, -10), (10, 0, -10), (10, 8, -10), (-10, 8, -10)),
    ]
    tv0, tv1, tv2 = [], [], []
    for a, b, c, d in quads:
        tv0 += [a, a]
        tv1 += [b, c]
        tv2 += [c, d]
    base = rng.uniform(-9, 9, (n_clutter, 3)).astype(np.float32)
    base[:, 1] = rng.uniform(0.2, 7.5, n_clutter)
    v0 = np.concatenate([np.array(tv0, np.float32), base])
    v1 = np.concatenate([np.array(tv1, np.float32),
                         base + rng.uniform(-.4, .4, (n_clutter, 3))
                         .astype(np.float32)])
    v2 = np.concatenate([np.array(tv2, np.float32),
                         base + rng.uniform(-.4, .4, (n_clutter, 3))
                         .astype(np.float32)])
    return v0, v1, v2


def test_sah_split_build_invariants():
    """Native SBVH build: coverage, leaf bounds, clipped-union property."""
    v0, v1, v2 = _room_scene()
    t = v0.shape[0]
    k = 32
    res = native.sah_split_build(v0, v1, v2, k)
    assert res is not None
    leaves, lo, hi = res
    assert len(leaves) == lo.shape[0] == hi.shape[0]
    all_ids = np.concatenate(leaves)
    # every triangle is referenced (duplicates allowed - SBVH)
    np.testing.assert_array_equal(np.unique(all_ids), np.arange(t))
    assert all_ids.shape[0] > t, "spatial splits never triggered"
    for leaf in leaves:
        assert 1 <= leaf.shape[0] <= k
        assert np.unique(leaf).shape[0] == leaf.shape[0]  # deduped
    # a triangle's clipped boxes union to its full AABB: the union of
    # the boxes of every leaf containing tri i must cover tri i's AABB
    # (THE exactness invariant - the cull may never miss a hit)
    tlo = np.minimum(np.minimum(v0, v1), v2)
    thi = np.maximum(np.maximum(v0, v1), v2)
    ulo = np.full_like(tlo, np.inf)
    uhi = np.full_like(thi, -np.inf)
    for i, leaf in enumerate(leaves):
        np.minimum.at(ulo, leaf, lo[i])
        np.maximum.at(uhi, leaf, hi[i])
    eps = 1e-4
    assert (ulo <= tlo + eps).all()
    assert (uhi >= thi - eps).all()


def test_sah_split_build_matches_python_quality():
    """Native vs pure-Python builder: same cost model => same quality.

    Float tie-breaks may shuffle leaf boundaries, so assert parity of
    the quality metrics (summed clipped-leaf surface area, leaf count),
    not bit-equality of the partition."""
    from pathtracer.accel.cluster import _sah_split_leaves

    v0, v1, v2 = _room_scene(n_clutter=600, seed=5)
    k = 32
    nat = native.sah_split_build(v0, v1, v2, k)
    assert nat is not None
    py = _sah_split_leaves(v0, v1, v2, k)

    def sa(lo, hi):
        e = np.maximum(hi - lo, 0.0)
        return float((e[:, 0] * e[:, 1] + e[:, 1] * e[:, 2]
                      + e[:, 0] * e[:, 2]).sum())

    sa_nat, sa_py = sa(nat[1], nat[2]), sa(py[1], py[2])
    assert abs(len(nat[0]) - len(py[0])) <= max(4, len(py[0]) // 10)
    assert sa_nat <= sa_py * 1.05, (sa_nat, sa_py)


def test_sah_split_native_accel_exact(monkeypatch):
    """build_clusters(sahsplit) through BOTH builders stays brute-exact."""
    import jax.numpy as jnp

    from pathtracer.accel.cluster import build_clusters
    from pathtracer.kernels.intersect import intersect_brute
    from pathtracer.kernels.packet import intersect_clusters

    v0n, v1n, v2n = _room_scene(n_clutter=300, seed=7)
    v0, v1, v2 = map(jnp.asarray, (v0n, v1n, v2n))
    rng = np.random.default_rng(3)
    n = 256
    o = rng.uniform(-9, 9, (n, 3)).astype(np.float32)
    o[:, 1] = rng.uniform(0.5, 7.5, n)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    ref = intersect_brute(o, d, v0, v1, v2, 1e-3, 1e20)

    for env in ("1", "0"):
        monkeypatch.setenv("PT_NATIVE_BUILD", env)
        accel = build_clusters(v0, v1, v2, 8, method="sahsplit")
        hit = intersect_clusters(accel, o, d, 1e-3, 1e20)
        np.testing.assert_array_equal(np.asarray(hit.tri) >= 0,
                                      np.asarray(ref.tri) >= 0,
                                      err_msg=f"native={env}")
        m = np.asarray(ref.tri) >= 0
        np.testing.assert_allclose(np.asarray(hit.t)[m],
                                   np.asarray(ref.t)[m], rtol=1e-5,
                                   err_msg=f"native={env}")


def test_sah_split_build_bad_args_fall_back():
    """rc != 0 paths return None so callers engage the Python oracle."""
    v0, v1, v2 = _room_scene(n_clutter=40, seed=2)
    # dup_budget < 1.0 is invalid (rc=2) -> None
    assert native.sah_split_build(v0, v1, v2, 16, dup_budget=0.5) is None
    # k <= 0 is invalid
    assert native.sah_split_build(v0, v1, v2, 0) is None


def test_sah_split_build_degenerate_geometry():
    """Identical / zero-area triangles terminate and stay covered."""
    t = 70
    a = np.zeros((t, 3), np.float32)         # all tris collapse to origin
    res = native.sah_split_build(a, a, a, 16)
    assert res is not None
    leaves, lo, hi = res
    np.testing.assert_array_equal(np.unique(np.concatenate(leaves)),
                                  np.arange(t))
    assert all(1 <= l.shape[0] <= 16 for l in leaves)
    # coplanar fan sharing one vertex (degenerate on one axis)
    ang = np.linspace(0, 2 * np.pi, t, endpoint=False)
    v1 = np.stack([np.cos(ang), np.zeros(t), np.sin(ang)], 1) \
        .astype(np.float32)
    v2 = np.roll(v1, 1, axis=0)
    res = native.sah_split_build(np.zeros((t, 3), np.float32), v1, v2, 8)
    assert res is not None
    leaves, lo, hi = res
    np.testing.assert_array_equal(np.unique(np.concatenate(leaves)),
                                  np.arange(t))
