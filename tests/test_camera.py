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
