"""Projective ground-plane + checkerboard-marker renderer.

Replaces the reference's Panda3D scene (reference visual_landing/
ppo_world_setup.py:7-103: city ground model — absent from the repo — plus
`target_final.egg` checkerboard scaled 0.5 with 0.2046 m squares) with a
closed-form projective sample: every pixel's ray is intersected with the
ground plane z=0 and colored by a procedural checkerboard/ground shader.
Pure elementwise math over an (H, W) grid — VPU-friendly, `vmap`s over the
env batch, and differentiable (the checker edges use a smooth step whose
width tracks the pixel footprint, which also acts as the anti-aliasing the
reference gets from hardware rasterization).

Board geometry matches the reference detector's expectation
(computer_vision/detector_setup.py:10-15): 9x6 inner corners => 10x7
squares of side scale*sqr_size = 0.1023 m, with a light border around the
board.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import MarkerConfig
from .camera import CameraModel, nadir_rotation, pixel_rays

GROUND_RGB = (0.35, 0.42, 0.32)   # muted greenish ground
BORDER_RGB = (0.9, 0.9, 0.9)
DARK = 0.05
LIGHT = 0.95


def _smooth_square_wave(x: jnp.ndarray, half_period: float, soft: jnp.ndarray) -> jnp.ndarray:
    """Anti-aliased alternating 0/1 pattern with cell size `half_period`.

    Distance to the nearest cell edge is mapped through a linear smoothstep
    of width `soft` (the projected pixel footprint).
    """
    t = x / half_period
    cell = jnp.floor(t)
    parity = jnp.mod(cell, 2.0)
    # distance (in world units) to nearest edge of this cell
    frac = t - cell
    dist = jnp.minimum(frac, 1.0 - frac) * half_period
    w = jnp.clip(0.5 + (dist / jnp.maximum(soft, 1e-6)) * 0.5, 0.0, 1.0)
    # blend toward the neighboring parity near the edge
    return parity * w + (1.0 - parity) * (1.0 - w)


def checkerboard_color(
    xy: jnp.ndarray,         # (..., 2) world coords relative to marker center
    footprint: jnp.ndarray,  # (...,) projected pixel size in world units
    marker: MarkerConfig,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (rgb (...,3), coverage (...,)) of the marker at these points.

    coverage = 1 inside the bordered board, 0 outside (smooth edge).
    """
    s = marker.square
    nx, ny = marker.cols + 1, marker.rows + 1   # 10 x 7 squares
    half_w, half_h = nx * s / 2.0, ny * s / 2.0
    border = s

    x = xy[..., 0]
    y = xy[..., 1]
    # checker pattern, phase-aligned so corners land on the square lattice
    px = _smooth_square_wave(x + half_w, s, footprint)
    py = _smooth_square_wave(y + half_h, s, footprint)
    checker = px * (1.0 - py) + py * (1.0 - px)     # XOR with AA
    val = DARK + (LIGHT - DARK) * checker

    inside_x = jnp.clip((half_w - jnp.abs(x)) / jnp.maximum(footprint, 1e-6) + 0.5, 0.0, 1.0)
    inside_y = jnp.clip((half_h - jnp.abs(y)) / jnp.maximum(footprint, 1e-6) + 0.5, 0.0, 1.0)
    on_board = inside_x * inside_y
    in_border_x = jnp.clip(
        (half_w + border - jnp.abs(x)) / jnp.maximum(footprint, 1e-6) + 0.5, 0.0, 1.0
    )
    in_border_y = jnp.clip(
        (half_h + border - jnp.abs(y)) / jnp.maximum(footprint, 1e-6) + 0.5, 0.0, 1.0
    )
    coverage = in_border_x * in_border_y

    board_rgb = val[..., None] * jnp.ones(3, val.dtype)
    border_rgb = jnp.asarray(BORDER_RGB, val.dtype)
    rgb = board_rgb * on_board[..., None] + border_rgb * (1.0 - on_board[..., None])
    return rgb, coverage


def shade_ground(xy: jnp.ndarray, dtype) -> jnp.ndarray:
    """Procedural ground shading: base color with a soft low-frequency
    variation so the scene is not uniform (stand-in for the missing
    city.egg texture; also gives the CNN translation cues like the
    reference's city model did)."""
    g = jnp.asarray(GROUND_RGB, dtype)
    wave = (
        0.06 * jnp.sin(xy[..., 0] * 1.7) * jnp.cos(xy[..., 1] * 1.3)
        + 0.04 * jnp.sin(xy[..., 0] * 5.1 + xy[..., 1] * 3.7)
    )
    return jnp.clip(g + wave[..., None], 0.0, 1.0)


def render_pinhole(
    cam: CameraModel,
    r_wc: jnp.ndarray,       # (3,3) world->camera rotation
    cam_pos_w: jnp.ndarray,  # (3,) camera position in world frame
    marker_xy: jnp.ndarray,  # (2,) marker center on the ground plane
    marker: MarkerConfig,
    brightness: jnp.ndarray | float = 1.0,
) -> jnp.ndarray:
    """Render an (H, W, 3) float image in [0, 1] for an arbitrary pose.

    Rays through each pixel are cast from `cam_pos_w` and intersected with
    the ground plane z=0; pixels whose ray points away from the plane render
    a sky color.
    """
    dtype = cam_pos_w.dtype
    dirs_c = pixel_rays(cam, dtype)            # (H, W, 3)
    dirs_w = dirs_c @ r_wc                      # R^T per row: camera->world
    dz = dirs_w[..., 2]
    # Intersection parameter t with plane z=0: cam_z + t*dz = 0.
    t = -cam_pos_w[2] / jnp.where(jnp.abs(dz) < 1e-6, 1e-6, dz)
    valid = (t > 0.0) & (dz < 0.0)
    hit = cam_pos_w + t[..., None] * dirs_w    # (H, W, 3)
    xy = hit[..., 0:2]

    # Projected pixel footprint ~ ground distance per pixel.
    footprint = jnp.abs(t) / cam.fx

    rel = xy - marker_xy
    marker_rgb, cover = checkerboard_color(rel, footprint, MarkerConfig() if marker is None else marker)
    ground_rgb = shade_ground(xy, dtype)
    rgb = marker_rgb * cover[..., None] + ground_rgb * (1.0 - cover[..., None])
    sky = jnp.asarray([0.55, 0.65, 0.8], dtype)
    rgb = jnp.where(valid[..., None], rgb, sky)
    return jnp.clip(rgb * brightness, 0.0, 1.0)


def render_nadir(
    cam: CameraModel,
    quad_pos_env: jnp.ndarray,  # (3,) env-frame quad position (ground at -5)
    marker_xy: jnp.ndarray,     # (2,) marker position
    marker: MarkerConfig,
    ground_z_env: float = -5.0,
    brightness: jnp.ndarray | float = 1.0,
) -> jnp.ndarray:
    """The landing camera: fixed nadir orientation, position follows the
    quad (reference rl_worker.py:127-128, 358-362: world z = 5 + env z,
    attitude NOT applied to the camera)."""
    height = quad_pos_env[2] - ground_z_env
    cam_pos = jnp.stack([quad_pos_env[0], quad_pos_env[1], jnp.maximum(height, 1e-3)])
    return render_pinhole(
        cam, nadir_rotation(cam_pos.dtype), cam_pos, marker_xy, marker, brightness
    )
