"""Radiance .hdr codec (scene/hdr.py) - the stb_image HDR role."""

import numpy as np
import pytest

from pathtracer.scene.hdr import read_hdr, write_hdr


def _radiance(h, w, seed=0):
    rng = np.random.default_rng(seed)
    # wide dynamic range incl. zeros and >1 values
    img = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
    img[::3] *= 50.0
    img[1::3] *= 0.01
    img[0, 0] = 0.0
    return img


def _assert_rgbe_close(back, img):
    # RGBE shares one exponent per pixel: error bound is ~1/256 of the
    # pixel's MAX channel, not of each channel.
    pmax = img.max(axis=-1, keepdims=True)
    bound = np.broadcast_to(pmax * 1e-2 + 1e-6, img.shape)
    np.testing.assert_array_less(np.abs(back - img), bound)


def test_hdr_roundtrip_rle():
    img = _radiance(24, 64)
    write_hdr("/tmp/t_rt.hdr", img)
    back = read_hdr("/tmp/t_rt.hdr")
    assert back.shape == img.shape
    _assert_rgbe_close(back, img)


def test_hdr_roundtrip_flat_narrow():
    # width < 8 takes the flat (non-RLE) writer path
    img = _radiance(5, 4, seed=3)
    write_hdr("/tmp/t_flat.hdr", img)
    back = read_hdr("/tmp/t_flat.hdr")
    _assert_rgbe_close(back, img)


def test_hdr_run_compression_decodes():
    # constant rows exercise run records on read (our writer emits
    # literals; synthesize a run-coded file by hand)
    w, h = 16, 2
    rgbe = np.zeros((h, w, 4), np.uint8)
    rgbe[..., 0] = 200
    rgbe[..., 3] = 129
    with open("/tmp/t_run.hdr", "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {h} +X {w}\n".encode())
        for _ in range(h):
            f.write(bytes([2, 2, 0, w]))
            f.write(bytes([128 + w, 200]))   # run: red = 200 x16
            f.write(bytes([128 + w, 0]))     # green
            f.write(bytes([128 + w, 0]))     # blue
            f.write(bytes([128 + w, 129]))   # exponent
    img = read_hdr("/tmp/t_run.hdr")
    expect = 200.0 * 2.0 ** (129 - 136)
    np.testing.assert_allclose(img[..., 0], expect, rtol=1e-6)
    np.testing.assert_allclose(img[..., 1:], 0.0)


def test_hdr_rejects_non_hdr():
    with open("/tmp/t_bad.hdr", "wb") as f:
        f.write(b"not an hdr file")
    with pytest.raises(ValueError):
        read_hdr("/tmp/t_bad.hdr")


def test_envmap_cli_ingestion():
    """app.load_envmap reads a .hdr into a linear radiance array."""
    from pathtracer.app import load_envmap

    img = _radiance(8, 16, seed=5)
    write_hdr("/tmp/t_env.hdr", img)
    env = load_envmap("/tmp/t_env.hdr")
    _assert_rgbe_close(env, img)


def test_native_and_python_decoders_agree(tmp_path, monkeypatch):
    """The C++ RGBE scanline decoder must match the numpy fallback."""
    import numpy as np

    from pathtracer.scene import hdr
    from pathtracer.utils import native

    rng = np.random.default_rng(9)
    img = (rng.random((64, 96, 3)).astype(np.float32) * 10.0) ** 3
    img[5:9, 10:20] = 0.0           # runs (RLE) + black (e=0) pixels
    p = str(tmp_path / "par.hdr")
    hdr.write_hdr(p, img)

    got_native = hdr.read_hdr(p)
    monkeypatch.setattr(native, "hdr_decode", lambda *a: None)
    got_python = hdr.read_hdr(p)
    assert got_native.shape == got_python.shape == img.shape
    assert np.array_equal(got_native, got_python)
