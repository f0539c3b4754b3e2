"""Camera basis + primary-ray generation tests (camera.cpp, raygen.rgen)."""

import jax.numpy as jnp
import numpy as np

from pathtracer.integrator.camera import Camera, generate_primary_rays


def test_basis_orthonormal():
    cam = Camera(position=(1, 2, 3), yaw=35.0, pitch=-20.0)
    for v in (cam.front, cam.right, cam.up):
        np.testing.assert_allclose(np.linalg.norm(v), 1.0, atol=1e-6)
    assert abs(np.dot(cam.front, cam.right)) < 1e-6
    assert abs(np.dot(cam.front, cam.up)) < 1e-6
    # right-handed: front x up == -right? up = right x front
    np.testing.assert_allclose(np.cross(cam.right, cam.front), cam.up,
                               atol=1e-6)


def test_pitch_clamp():
    cam = Camera()
    cam.process_mouse(0.0, 10000.0)
    assert cam.pitch == 89.0
    cam.process_mouse(0.0, -100000.0)
    assert cam.pitch == -89.0


def test_look_at():
    cam = Camera(position=(0, 0, 5))
    cam.look_at((0, 0, 0))
    np.testing.assert_allclose(cam.front, [0, 0, -1], atol=1e-6)


def test_keyboard_moves():
    cam = Camera(position=(0, 0, 0), yaw=-90.0)  # front = -z
    cam.process_keyboard("forward", 0.5)  # speed 8 * 0.5 = 4 units
    np.testing.assert_allclose(cam.position, [0, 0, -4], atol=1e-5)


def test_center_ray_is_front():
    cam = Camera(position=(0, 0, 0), yaw=-90.0)
    w = h = 65  # odd: center pixel exists
    state = cam.state()
    pid = jnp.array([(h // 2) * w + w // 2], jnp.int32)
    o, d = generate_primary_rays(state, w, h, 70.0, pid,
                                 jnp.zeros(1, jnp.uint32))
    d = np.asarray(d)[0]
    # jitter keeps it within a pixel of center; cos to front near 1
    assert np.dot(d, cam.front) > 0.999


def test_image_orientation():
    """Row 0 must look upward (image top), column 0 leftward."""
    cam = Camera(position=(0, 0, 0), yaw=-90.0)
    w = h = 64
    state = cam.state()
    pid = jnp.array([0, (h - 1) * w], jnp.int32)  # top-left, bottom-left
    o, d = generate_primary_rays(state, w, h, 70.0, pid,
                                 jnp.zeros(2, jnp.uint32))
    d = np.asarray(d)
    assert d[0] @ cam.up > 0    # top row looks up
    assert d[1] @ cam.up < 0    # bottom row looks down
    assert d[0] @ cam.right < 0  # left column looks left


def test_fov():
    """Horizontal half-angle ~ atan(aspect * tan(fov/2)) at the center row."""
    cam = Camera(position=(0, 0, 0), yaw=-90.0)
    w, h = 201, 101
    state = cam.state()
    # center row, extreme columns
    pid = jnp.array([(h // 2) * w + 0, (h // 2) * w + (w - 1)], jnp.int32)
    o, d = generate_primary_rays(state, w, h, 70.0, pid,
                                 jnp.zeros(2, jnp.uint32))
    d = np.asarray(d)
    half = np.degrees(np.arccos(d[0] @ cam.front))
    expect = np.degrees(np.arctan((w / h) * np.tan(np.radians(35.0))))
    assert abs(half - expect) < 1.5  # jitter tolerance


def test_rays_deterministic():
    cam = Camera(position=(0, 0, 0))
    state = cam.state()
    pid = jnp.arange(16, dtype=jnp.int32)
    sid = jnp.zeros(16, jnp.uint32)
    o1, d1 = generate_primary_rays(state, 4, 4, 70.0, pid, sid)
    o2, d2 = generate_primary_rays(state, 4, 4, 70.0, pid, sid)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))


def test_thin_lens_dof_geometry():
    """Thin-lens rays (aperture > 0) re-converge exactly on the focal
    plane and spread away from it; aperture == 0 is bit-identical to
    the pinhole path (net-new feature, reference is pinhole-only)."""
    import jax.numpy as jnp
    import numpy as np

    from pathtracer.integrator.camera import (Camera,
                                              generate_primary_rays)

    cam = Camera(position=(0.0, 0.0, 0.0))
    cam.look_at((0.0, 0.0, -1.0))
    cs = cam.state()
    w = h = 64    # pixel footprint << lens radius at the
    pix = jnp.arange(w * h, dtype=jnp.int32)  # focal plane

    # 4 lens samples of the same pixel set
    rays = []
    for s in range(4):
        samp = jnp.full((w * h,), s, jnp.uint32)
        o, d = generate_primary_rays(cs, w, h, 70.0, pix, samp,
                                     aperture=0.4, focus_dist=3.0)
        rays.append((np.asarray(o), np.asarray(d)))

    front = np.asarray(cs.front)

    def plane_hits(dist):
        pts = []
        for o, d in rays:
            t = dist / (d @ front)
            pts.append(o + d * t[:, None])
        return np.stack(pts)            # [S, N, 3]

    # On the focal plane all lens samples of a pixel agree (up to the
    # per-sample PIXEL jitter, bounded by ~2 pixel footprints there);
    # at 3x the distance the lens blur dominates by an order of
    # magnitude.
    spread_focus = plane_hits(3.0).std(axis=0).max()
    spread_far = plane_hits(9.0).std(axis=0).max()
    assert spread_far > 4 * spread_focus, (spread_focus, spread_far)

    # origins actually jitter on the lens disk
    o0 = rays[0][0]
    assert np.abs(o0 - np.asarray(cs.position)).max() <= 0.2 + 1e-6
    assert np.abs(o0 - np.asarray(cs.position)).max() > 0.01

    # pinhole (aperture=0) is bit-identical to the original path
    samp = jnp.zeros((w * h,), jnp.uint32)
    o_a, d_a = generate_primary_rays(cs, w, h, 70.0, pix, samp)
    o_b, d_b = generate_primary_rays(cs, w, h, 70.0, pix, samp,
                                     aperture=0.0, focus_dist=5.0)
    np.testing.assert_array_equal(np.asarray(o_a), np.asarray(o_b))
    np.testing.assert_array_equal(np.asarray(d_a), np.asarray(d_b))
