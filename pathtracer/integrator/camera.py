"""Camera model and primary-ray generation.

Host side: an FPS controller with yaw/pitch mouse-look and WASD translation
(re-derivation of render/camera.{h,cpp}: +/-89 deg pitch clamp camera.cpp:35-38,
speed=8 camera.h:14, sensitivity=0.1 camera.h:15). The reference pre-flips with
worldUp=(0,-1,0) for Vulkan's Y-down clip space (camera.h:8-10, SURVEY.md
par.3.6.11); we use the standard worldUp=(0,+1,0) and instead negate the NDC y
in ray generation so that image row 0 is the top of the frame - same observable
image, conventional math.

Device side: jittered pinhole ray generation matching raygen.rgen:103-119
(fov 70 deg vertical-ish: tanFov scales y, aspect*tanFov scales x).

Camera basis is passed to jitted render steps as a small pytree of arrays -
the analog of the reference's per-frame push constants (main.cpp:691-696).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from pathtracer.sampling import rng


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class CameraState:
    """Device-side camera basis: the push-constant analog. All f32[3]."""

    position: jnp.ndarray
    front: jnp.ndarray
    up: jnp.ndarray
    right: jnp.ndarray


class Camera:
    """Host-side FPS camera (render/camera.{h,cpp} semantics, y-up)."""

    WORLD_UP = np.array([0.0, 1.0, 0.0], np.float32)

    def __init__(self, position=(0.0, 0.0, 0.0), yaw=-90.0, pitch=0.0,
                 speed=8.0, sensitivity=0.1):
        self.position = np.asarray(position, np.float32).copy()
        self.yaw = float(yaw)
        self.pitch = float(pitch)
        self.speed = float(speed)
        self.sensitivity = float(sensitivity)
        self.moved = True
        self._update_basis()

    # camera.cpp:6-16 updateCameraVectors, with y-up convention.
    def _update_basis(self):
        cy, sy = math.cos(math.radians(self.yaw)), math.sin(math.radians(self.yaw))
        cp, sp = math.cos(math.radians(self.pitch)), math.sin(math.radians(self.pitch))
        front = np.array([cy * cp, sp, sy * cp], np.float32)
        self.front = front / np.linalg.norm(front)
        right = np.cross(self.front, self.WORLD_UP)
        self.right = (right / np.linalg.norm(right)).astype(np.float32)
        up = np.cross(self.right, self.front)
        self.up = (up / np.linalg.norm(up)).astype(np.float32)

    def process_mouse(self, dx: float, dy: float):
        """Mouse-look: camera.cpp:29-41 (pitch clamped to +/-89 deg)."""
        self.yaw += dx * self.sensitivity
        self.pitch = float(np.clip(self.pitch + dy * self.sensitivity, -89.0, 89.0))
        self._update_basis()
        self.moved = True

    def process_keyboard(self, direction: str, dt: float):
        """WASD translation: camera.cpp:18-27."""
        v = self.speed * dt
        step = {
            "forward": self.front, "backward": -self.front,
            "left": -self.right, "right": self.right,
            "up": self.up, "down": -self.up,
        }[direction]
        self.position = (self.position + step * v).astype(np.float32)
        self.moved = True

    def look_at(self, target):
        """Aim the camera at a world-space point."""
        d = np.asarray(target, np.float32) - self.position
        d = d / np.linalg.norm(d)
        self.pitch = math.degrees(math.asin(float(np.clip(d[1], -1, 1))))
        self.yaw = math.degrees(math.atan2(float(d[2]), float(d[0])))
        self._update_basis()
        self.moved = True

    def state(self) -> CameraState:
        return CameraState(
            position=jnp.asarray(self.position),
            front=jnp.asarray(self.front),
            up=jnp.asarray(self.up),
            right=jnp.asarray(self.right),
        )


def generate_primary_rays(cam: CameraState, width: int, height: int,
                          fov_deg: float, pixel_ids, sample_ids, seed=0,
                          sampler="pcg", aperture: float = 0.0,
                          focus_dist: float = 0.0):
    """Jittered primary rays (raygen.rgen:103-119 semantics).

    pixel_ids: i32[N] flat pixel index (row-major, row 0 = image top).
    sample_ids: u32[N] global sample index (frame * spp + s) - the RNG
    counter replacing the reference's seed derivation (raygen.rgen:105-106).

    aperture/focus_dist (net-new; the reference is pinhole-only): with
    aperture > 0, thin-lens depth of field - the ray origin jitters on
    a disk of that diameter in the lens plane and re-aims at the
    pixel's point on the focal plane (perpendicular distance focus_dist
    along cam.front). The lens sample rides lanes 2-3 of the SAME
    SALT_JITTER draw, so pinhole draws are untouched. aperture == 0 is
    a static no-op (identical program to the pinhole path).

    Returns (origins f32[N,3], directions f32[N,3]).
    """
    px = (pixel_ids % width).astype(jnp.float32)
    py = (pixel_ids // width).astype(jnp.float32)

    uj = rng.uniform4(pixel_ids, sample_ids, 0, rng.SALT_JITTER, seed,
                      sampler)
    jx, jy = uj[..., 0], uj[..., 1]

    # inUV in [0,1]^2 then NDC in [-1,1]^2 (raygen.rgen:110-111).
    u = (px + jx) / width * 2.0 - 1.0
    v = (py + jy) / height * 2.0 - 1.0

    aspect = width / height
    tan_fov = math.tan(math.radians(fov_deg * 0.5))

    # Row 0 is top => negate v against the y-up basis (see module docstring).
    d = (cam.front[None, :]
         + cam.right[None, :] * (u * aspect * tan_fov)[:, None]
         - cam.up[None, :] * (v * tan_fov)[:, None])
    d = d * jax.lax.rsqrt(jnp.sum(d * d, axis=-1, keepdims=True))
    o = jnp.broadcast_to(cam.position[None, :], d.shape)
    if aperture > 0.0 and focus_dist > 0.0:
        # focal point of this pixel: where the pinhole ray crosses the
        # plane at perpendicular distance focus_dist
        t_focus = focus_dist / jnp.sum(d * cam.front[None, :], axis=-1,
                                       keepdims=True)
        p_focus = o + d * t_focus
        r = 0.5 * aperture * jnp.sqrt(uj[..., 2])
        phi = 2.0 * math.pi * uj[..., 3]
        lens = (cam.right[None, :] * (r * jnp.cos(phi))[:, None]
                + cam.up[None, :] * (r * jnp.sin(phi))[:, None])
        o = o + lens
        d = p_focus - o
        d = d * jax.lax.rsqrt(jnp.sum(d * d, axis=-1, keepdims=True))
    return o, d
