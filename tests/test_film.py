"""Film accumulation / tone map / checkpoint tests."""

import os

import jax.numpy as jnp
import numpy as np

from pathtracer import film as fm


def test_accumulate_recurrence():
    """accum' = (accum*frame + x)/(frame+1) (raygen.rgen:300-302) in f32."""
    f = fm.new_film(4, 2)
    imgs = [np.full((2, 4, 3), v, np.float32) for v in (1.0, 2.0, 6.0)]
    for img in imgs:
        f = fm.accumulate(f, jnp.asarray(img))
    assert int(f.frame) == 3
    np.testing.assert_allclose(np.asarray(f.accum), 3.0, atol=1e-6)


def test_reset():
    f = fm.new_film(2, 2)
    f = fm.accumulate(f, jnp.ones((2, 2, 3)))
    from pathtracer.film.film import reset

    f = reset(f)
    assert int(f.frame) == 0
    np.testing.assert_allclose(np.asarray(f.accum), 0.0)


def test_display_gamma():
    x = jnp.array([[[0.0, 0.5, 1.0]]])
    y = np.asarray(fm.to_display(x))
    np.testing.assert_allclose(y[0, 0], [0.0, 0.5 ** (1 / 2.2), 1.0],
                               atol=1e-6)
    # negative and >1 inputs clamp
    y = np.asarray(fm.to_display(jnp.array([[[-1.0, 2.0, 0.1]]])))
    assert y[0, 0, 0] == 0.0 and y[0, 0, 1] == 1.0


def test_checkpoint_roundtrip(tmp_path):
    f = fm.new_film(3, 3)
    f = fm.accumulate(f, jnp.arange(27, dtype=jnp.float32).reshape(3, 3, 3))
    p = os.path.join(tmp_path, "ckpt.npz")
    fm.save_checkpoint(p, f)
    g = fm.load_checkpoint(p)
    assert int(g.frame) == int(f.frame)
    np.testing.assert_array_equal(np.asarray(g.accum), np.asarray(f.accum))


def test_png_roundtrip(tmp_path):
    img = np.random.default_rng(0).uniform(0, 1, (8, 8, 3)).astype(np.float32)
    p = os.path.join(tmp_path, "x.png")
    fm.write_png(p, img)
    back = fm.read_png(p)
    assert back.shape == (8, 8, 3)
    assert fm.rmse(img, back) < 0.01  # 8-bit quantization only


def test_rmse():
    a = np.zeros((4, 4, 3))
    b = np.full((4, 4, 3), 0.1)
    assert abs(fm.rmse(a, b) - 0.1) < 1e-12
