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


def test_atrous_denoise_reduces_noise():
    """The denoiser moves a noisy 1-frame render toward the converged one.

    Cornell at 24x24: render 1 frame (noisy) and 32 frames (reference);
    denoising the noisy accumulation with its own G-buffer must cut the
    RMSE to the reference by a wide margin, and sky pixels (depth = inf)
    must pass through bit-exactly.
    """
    import dataclasses

    import jax.numpy as jnp

    from pathtracer.config import RenderConfig
    from pathtracer.film.denoise import atrous_denoise
    from pathtracer.integrator.camera import Camera
    from pathtracer.render import Renderer
    from pathtracer.scene.procedural import cornell_box

    scene = cornell_box().finalize()
    cam = Camera(position=(0.5, 0.5, 2.2))
    cam.look_at((0.5, 0.5, 0.0))
    cfg = RenderConfig(width=24, height=24, spp=1, max_depth=3,
                       intersector="brute", denoise=True)

    r = Renderer(scene, cfg, cam)
    r.camera.moved = False
    noisy_film = r.step()
    noisy = np.asarray(noisy_film.accum)
    assert r._gbuf is not None
    h, w = cfg.height, cfg.width
    den = np.asarray(atrous_denoise(
        jnp.asarray(noisy),
        r._gbuf["normal"].reshape(h, w, 3),
        r._gbuf["depth"].reshape(h, w),
        r._gbuf["albedo"].reshape(h, w, 3)))

    ref_cfg = dataclasses.replace(cfg, denoise=False)
    r2 = Renderer(scene, ref_cfg, cam)
    r2.camera.moved = False
    for _ in range(32):
        ref_film = r2.step()
    ref = np.asarray(ref_film.accum)

    # Compare in DISPLAY space: linear RMSE at this tiny resolution is
    # dominated by a handful of emitter-silhouette AA pixels (geometric
    # edge noise that a G-buffer-guided filter must NOT touch).
    def tm(x):
        return np.clip(np.maximum(x, 0.0) ** (1 / 2.2), 0.0, 1.0)

    rmse_noisy = float(np.sqrt(np.mean((tm(noisy) - tm(ref)) ** 2)))
    rmse_den = float(np.sqrt(np.mean((tm(den) - tm(ref)) ** 2)))
    assert rmse_den < 0.75 * rmse_noisy, (rmse_noisy, rmse_den)

    # display() path applies it end-to-end without touching the film
    img = r.display()
    assert img.shape == (h, w, 3)
    np.testing.assert_array_equal(np.asarray(r.film.accum), noisy)


def test_tonemap_modes():
    """reinhard/aces (display-only, net-new) are monotonic, bounded,
    compress highlights below plain gamma, and the default 'gamma' is
    exactly the reference transform."""
    x = jnp.array([[[0.0, 0.1, 0.5], [1.0, 4.0, 100.0]]])
    g = np.asarray(fm.to_display(x))
    np.testing.assert_array_equal(g, np.asarray(fm.to_display(x, "gamma")))
    for mode in ("reinhard", "aces"):
        y = np.asarray(fm.to_display(x, mode))
        assert (y >= 0).all() and (y <= 1).all()
        flat = y.reshape(-1)
        assert (np.diff(flat) >= -1e-6).all()          # monotonic
        assert flat[-2] < g.reshape(-1)[-2] + 1e-6     # rolls off x=4
    import pytest

    with pytest.raises(ValueError):
        fm.to_display(x, "nope")
