"""Counter-based RNG tests (SURVEY.md par.4.1: RNG unit oracles)."""

import jax.numpy as jnp
import numpy as np

from pathtracer.sampling import rng


def test_pcg4d_deterministic():
    v = jnp.array([[1, 2, 3, 4], [5, 6, 7, 8]], jnp.uint32)
    a = np.asarray(rng.pcg4d(v))
    b = np.asarray(rng.pcg4d(v))
    assert (a == b).all()
    assert a.dtype == np.uint32


def test_pcg4d_distinct_lanes():
    n = 4096
    keys = jnp.stack([jnp.arange(n, dtype=jnp.uint32),
                      jnp.zeros(n, jnp.uint32),
                      jnp.zeros(n, jnp.uint32),
                      jnp.zeros(n, jnp.uint32)], axis=-1)
    out = np.asarray(rng.pcg4d(keys))
    # no collisions across any output component for distinct keys
    assert len(np.unique(out[:, 0])) > n * 0.999


def test_uniform_range_and_moments():
    n = 1 << 14
    pix = jnp.arange(n, dtype=jnp.uint32)
    u = np.asarray(rng.uniform4(pix, 0, 0, 0))
    assert (u >= 0.0).all() and (u < 1.0).all()
    assert abs(u.mean() - 0.5) < 0.01
    assert abs(u.var() - 1.0 / 12.0) < 0.01


def test_uniform_salt_independence():
    """Different salts must give (empirically) independent streams."""
    n = 1 << 14
    pix = jnp.arange(n, dtype=jnp.uint32)
    a = np.asarray(rng.uniform1(pix, 0, 0, rng.SALT_JITTER))
    b = np.asarray(rng.uniform1(pix, 0, 0, rng.SALT_RR))
    corr = np.corrcoef(a, b)[0, 1]
    assert abs(corr) < 0.03
    assert not np.allclose(a, b)


def test_uniform_depth_and_sample_independence():
    n = 1 << 12
    pix = jnp.arange(n, dtype=jnp.uint32)
    d0 = np.asarray(rng.uniform1(pix, 0, 0, 0))
    d1 = np.asarray(rng.uniform1(pix, 0, 1, 0))
    s1 = np.asarray(rng.uniform1(pix, 1, 0, 0))
    assert not np.allclose(d0, d1)
    assert not np.allclose(d0, s1)
    assert abs(np.corrcoef(d0, d1)[0, 1]) < 0.05


def test_ref_pcg_stream_semantics():
    """Oracle re-derivation of common.glsl:27-33: state advances by LCG,
    output mixes the *previous* state; independently verified with python
    big-int arithmetic."""
    state = np.uint32(12345)
    out, new_state = rng.ref_pcg(state)
    prev = (12345 * 747796405 + 2891336453) % (1 << 32)
    word = (((prev >> ((prev >> 28) + 4)) ^ prev) * 277803737) % (1 << 32)
    expect = (word >> 22) ^ word
    assert int(out) == expect
    assert int(new_state) == prev


def test_ref_pcg2d_semantics():
    """Oracle for common.glsl:34-44 via python big-int arithmetic."""
    def py_pcg2d(x, y):
        m = (1 << 32) - 1
        x = (x * 1664525 + 1013904223) & m
        y = (y * 1664525 + 1013904223) & m
        x = (x + y * 1664525) & m
        y = (y + x * 1664525) & m
        x ^= x >> 16
        y ^= y >> 16
        x = (x + y * 1664525) & m
        y = (y + x * 1664525) & m
        x ^= x >> 16
        y ^= y >> 16
        return x, y

    for vx, vy in [(0, 0), (1, 2), (640, 360), (123456789, 987654321)]:
        got = rng.ref_pcg2d([vx, vy])
        assert tuple(int(g) for g in got) == py_pcg2d(vx, vy)


def test_ref_rand_unit_range():
    s = np.uint32(7)
    vals = []
    for _ in range(100):
        v, s = rng.ref_rand(s)
        vals.append(float(v))
    vals = np.array(vals)
    assert (vals >= 0).all() and (vals <= 1.0).all()
    assert vals.std() > 0.2
