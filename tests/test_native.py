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
