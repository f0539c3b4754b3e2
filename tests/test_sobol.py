"""Owen-scrambled Sobol sampler (sampling/sobol.py, net-new vs reference).

Validates (a) the raw Sobol construction against the published first
points of the sequence, (b) the Owen scramble's structural guarantees
(bijectivity, prefix stratification), and (c) the renderer-level payoff:
lower error at equal spp than the independent-PCG estimator.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pathtracer.sampling import rng, sobol


def test_sobol_dim0_is_van_der_corput_of_gray_code():
    idx = np.arange(16, dtype=np.uint64)
    pts = np.asarray(sobol.sobol4(jnp.asarray(idx, jnp.uint32)))
    pts = pts.astype(np.uint64) / 2.0**32

    def radinv(i):
        return sum(((int(i) >> b) & 1) * 0.5 ** (b + 1) for b in range(32))

    expect = [radinv(i ^ (i >> np.uint64(1))) for i in idx]
    np.testing.assert_allclose(pts[:, 0], expect, atol=0)


def test_sobol_first_points_2d():
    # Known first points of the (dim0, dim1) Sobol pair (Gray-code order).
    idx = jnp.arange(8, dtype=jnp.uint32)
    pts = np.asarray(sobol.sobol4(idx)).astype(np.uint64) / 2.0**32
    expect = np.array([
        [0.0, 0.0], [0.5, 0.5], [0.75, 0.25], [0.25, 0.75],
        [0.375, 0.375], [0.875, 0.875], [0.625, 0.125], [0.125, 0.625],
    ])
    np.testing.assert_allclose(pts[:, :2], expect, atol=0)


def test_sobol_matches_scipy_qmc():
    scipy_qmc = pytest.importorskip("scipy.stats.qmc")
    ref = scipy_qmc.Sobol(d=4, scramble=False).random(64)
    idx = jnp.arange(64, dtype=jnp.uint32)
    pts = np.asarray(sobol.sobol4(idx)).astype(np.uint64) / 2.0**32
    np.testing.assert_allclose(pts, ref, atol=1e-9)


def test_owen_scramble_is_bijective():
    x = jnp.arange(4096, dtype=jnp.uint32)
    for seed in (0, 1, 0xDEADBEEF):
        y = np.asarray(sobol.owen_scramble(x, jnp.uint32(seed)))
        assert len(np.unique(y)) == 4096


def test_owen_scramble_preserves_elementary_intervals():
    """Scrambled dim-0 points of any 2^m prefix stay one-per-interval."""
    n = 256
    idx = jnp.arange(n, dtype=jnp.uint32)
    gk = rng.pcg4d(rng._key(jnp.uint32(7), jnp.uint32(0x536F626C),
                            jnp.uint32(3), 42))
    pts = np.asarray(sobol.scrambled_sobol4(idx, gk)).astype(np.uint64)
    for d in range(4):
        cells = pts[:, d] >> np.uint64(32 - 8)   # 256 intervals
        assert len(np.unique(cells)) == n, f"dim {d} not stratified"
    # every power-of-two PREFIX is stratified too (progressive property)
    for m in (2, 4, 6):
        cells = pts[: 1 << m, 0] >> np.uint64(32 - m)
        assert len(np.unique(cells)) == 1 << m


def test_uniform4_sobol_jitter_stratifies_pixel_aa():
    """16 frames of SALT_JITTER samples stratify the pixel footprint."""
    pix = jnp.full((16,), 5, jnp.uint32)
    samp = jnp.arange(16, dtype=jnp.uint32)
    u = np.asarray(rng.uniform4(pix, samp, 0, rng.SALT_JITTER, 0, "sobol"))
    # 4x4 stratification of (jx, jy)
    cx = np.floor(u[:, 0] * 4).astype(int)
    cy = np.floor(u[:, 1] * 4).astype(int)
    assert len({(a, b) for a, b in zip(cx, cy)}) == 16
    # PCG does NOT have this property at n=16 (overwhelmingly likely)
    up = np.asarray(rng.uniform4(pix, samp, 0, rng.SALT_JITTER, 0, "pcg"))
    assert u.shape == up.shape


def test_sobol_groups_decorrelated():
    """Different pixels / salts get different scrambled sequences."""
    samp = jnp.arange(64, dtype=jnp.uint32)
    a = np.asarray(rng.uniform4(jnp.uint32(1), samp, 0, 0, 0, "sobol"))
    b = np.asarray(rng.uniform4(jnp.uint32(2), samp, 0, 0, 0, "sobol"))
    c = np.asarray(rng.uniform4(jnp.uint32(1), samp, 1, 0, 0, "sobol"))
    assert not np.allclose(a, b)
    assert not np.allclose(a, c)
    # and each is still marginally uniform-ish
    for u in (a, b, c):
        assert abs(float(u.mean()) - 0.5) < 0.05


def test_sobol_mean_converges_faster_than_pcg():
    """QMC integration error << MC error on a smooth integrand."""
    n = 256
    pix = jnp.full((n,), 11, jnp.uint32)
    samp = jnp.arange(n, dtype=jnp.uint32)
    f = lambda u: u[..., 0] * u[..., 1]          # E = 1/4
    err_s = abs(float(f(rng.uniform4(pix, samp, 0, 4, 0, "sobol")).mean())
                - 0.25)
    err_p = abs(float(f(rng.uniform4(pix, samp, 0, 4, 0, "pcg")).mean())
                - 0.25)
    assert err_s < 2e-3                           # near 1/N decay
    assert err_s < err_p


def test_render_sobol_lower_error_at_equal_spp():
    """Cornell at 16 spp: Sobol image is closer to the converged image."""
    from pathtracer.config import RenderConfig
    from pathtracer.render import Renderer
    from pathtracer.scene.procedural import cornell_box

    scene = cornell_box().finalize()
    base = dict(width=32, height=32, spp=4, max_depth=3,
                intersector="brute", traversal_backend="xla")

    def render_n_frames(sampler, frames):
        cfg = RenderConfig(sampler=sampler, **base)
        r = Renderer(scene, cfg)
        for _ in range(frames):
            r.step()
        return np.asarray(r.film.accum)      # running mean (film.py)

    ref = render_n_frames("pcg", 64)              # 256 spp reference
    img_p = render_n_frames("pcg", 4)             # 16 spp
    img_s = render_n_frames("sobol", 4)
    rmse_p = float(np.sqrt(np.mean((img_p - ref) ** 2)))
    rmse_s = float(np.sqrt(np.mean((img_s - ref) ** 2)))
    assert rmse_s < rmse_p, (rmse_s, rmse_p)


def test_sobol_sampler_reproducible_and_distinct():
    pix = jnp.arange(32, dtype=jnp.uint32)
    samp = jnp.zeros((32,), jnp.uint32)
    a = np.asarray(rng.uniform4(pix, samp, 2, 5, 9, "sobol"))
    b = np.asarray(rng.uniform4(pix, samp, 2, 5, 9, "sobol"))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(rng.uniform4(pix, samp, 2, 5, 10, "sobol"))
    assert not np.allclose(a, c)
