"""Pinhole camera model shared by the renderer and the vision pipeline.

The reference camera is a Panda3D lens with a 36x24 mm film and 35 mm focal
length rendering an 84x84 buffer (reference computer_vision/img_2_cv.py:13-14
— note the anisotropic pixels: the 3:2 film maps onto a square image), set
nadir-pointing with a fixed orientation that does NOT follow the quad's
attitude (reference visual_landing/rl_worker.py:127-128: setHpr(0, 270, 0),
position-only updates at :362).

Conventions (ours, consistent across render/ and vision/):
  * world: z up; ground plane at z = 0 (the env's z = -5, reference
    rl_worker.py:358: world z = 5 + env z)
  * camera frame: +x right, +y down, +z forward (optical axis)
  * nadir pose: optical axis = -world z; image +u = +world x,
    +v = +world y
  * intrinsics: fx = focal/film_w * width, fy = focal/film_h * height,
    principal point at the image center
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..config import CameraConfig


class CameraModel(NamedTuple):
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    width: int
    height: int

    @property
    def k(self) -> jnp.ndarray:
        """3x3 intrinsics matrix."""
        z = jnp.zeros(())
        o = jnp.ones(())
        return jnp.stack(
            [
                jnp.stack([self.fx, z, self.cx]),
                jnp.stack([z, self.fy, self.cy]),
                jnp.stack([z, z, o]),
            ]
        )


def make_camera(cfg: CameraConfig | None = None) -> CameraModel:
    cfg = cfg or CameraConfig()
    return CameraModel(
        fx=jnp.asarray(cfg.fx, jnp.float32),
        fy=jnp.asarray(cfg.fy, jnp.float32),
        cx=jnp.asarray((cfg.width - 1) / 2.0, jnp.float32),
        cy=jnp.asarray((cfg.height - 1) / 2.0, jnp.float32),
        width=cfg.width,
        height=cfg.height,
    )


def nadir_rotation(dtype=jnp.float32) -> jnp.ndarray:
    """World->camera rotation for the fixed nadir camera: a proper SO(3)
    rotation (pi about world x): camera x = world x, camera y = -world y,
    camera z (forward) = -world z. Image +u = +world x, +v = -world y.
    (The reference's vertical flip of the GL buffer, img_2_cv.py:29, plays
    the same convention-fixing role.)"""
    return jnp.asarray(
        [[1.0, 0.0, 0.0], [0.0, -1.0, 0.0], [0.0, 0.0, -1.0]], dtype
    )


def project_points(
    cam: CameraModel,
    points_w: jnp.ndarray,  # (..., 3) world points
    r_wc: jnp.ndarray,      # (3, 3) world->camera rotation
    t_c: jnp.ndarray,       # (3,) camera-frame translation: X_c = R X_w + t
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Project world points -> pixel (u, v); also returns camera-frame depth."""
    xc = points_w @ r_wc.T + t_c
    z = xc[..., 2]
    u = cam.fx * xc[..., 0] / z + cam.cx
    v = cam.fy * xc[..., 1] / z + cam.cy
    return jnp.stack([u, v], axis=-1), z


def pixel_rays(cam: CameraModel, dtype=jnp.float32) -> jnp.ndarray:
    """Unit-less camera-frame ray directions for every pixel, (H, W, 3) with
    z = 1 (normalized image plane)."""
    u = jnp.arange(cam.width, dtype=dtype)
    v = jnp.arange(cam.height, dtype=dtype)
    uu, vv = jnp.meshgrid(u, v)  # (H, W)
    x = (uu - cam.cx) / cam.fx
    y = (vv - cam.cy) / cam.fy
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
