"""Renderer golden-property tests (SURVEY.md §7 stage 5).

No golden image files — properties instead: geometric consistency between
`project_points` and the rendered checkerboard (a projected inner corner
must land on a checker edge crossing), marker translation/zoom behavior,
and batching.
"""

import jax
import jax.numpy as jnp
import numpy as np

from autonomous_quadrotor_environment_tpu.config import CameraConfig, MarkerConfig
from autonomous_quadrotor_environment_tpu.render import (
    make_camera,
    project_points,
    render_nadir,
)
from autonomous_quadrotor_environment_tpu.render.camera import nadir_rotation

CAM = make_camera(CameraConfig())
MARKER = MarkerConfig()


def test_intrinsics_match_film_model():
    cfg = CameraConfig()
    assert abs(cfg.fx - 35.0 / 36.0 * 84) < 1e-6
    assert abs(cfg.fy - 35.0 / 24.0 * 84) < 1e-6


def test_render_shapes_and_range():
    img = render_nadir(CAM, jnp.asarray([0.0, 0.0, -2.0]), jnp.zeros(2), MARKER)
    assert img.shape == (84, 84, 3)
    a = np.asarray(img)
    assert a.min() >= 0.0 and a.max() <= 1.0
    # marker visible: dark and light pixels both present near the center
    c = a[30:54, 30:54, 0]
    assert c.min() < 0.25 and c.max() > 0.75


def test_marker_centered_when_quad_above():
    """Quad directly above the marker -> dark/light checker pattern is
    centered; shifting the marker moves it the right direction in the image
    (+world x -> +u)."""
    img0 = np.asarray(render_nadir(CAM, jnp.asarray([0.0, 0.0, -2.0]), jnp.zeros(2), MARKER))
    img1 = np.asarray(
        render_nadir(CAM, jnp.asarray([0.0, 0.0, -2.0]), jnp.asarray([1.0, 0.0]), MARKER)
    )
    # contrast energy (board is high-contrast vs smooth ground)
    def center_of_contrast(img):
        w = np.abs(np.diff(img[..., 0], axis=1))[:-1, :] + np.abs(
            np.diff(img[..., 0], axis=0)
        )[:, :-1]
        ys, xs = np.mgrid[0 : w.shape[0], 0 : w.shape[1]]
        tot = w.sum()
        return (xs * w).sum() / tot, (ys * w).sum() / tot

    x0, y0 = center_of_contrast(img0)
    x1, y1 = center_of_contrast(img1)
    assert abs(x0 - 41.5) < 3 and abs(y0 - 41.5) < 3, (x0, y0)
    assert x1 > x0 + 10, (x0, x1)


def test_projected_corner_lies_on_checker_crossing():
    """Project the board's central inner corner through the camera model and
    verify the rendered image has a checker crossing there (all four
    quadrants around the pixel alternate)."""
    height = 1.2  # low enough that one square spans ~7 px
    quad = jnp.asarray([0.1, -0.05, height - 5.0])
    marker_xy = jnp.asarray([0.05, 0.08])
    img = np.asarray(render_nadir(CAM, quad, marker_xy, MARKER))

    cam_pos = jnp.asarray([quad[0], quad[1], height])
    # An inner corner: x lattice passes through the center (10 squares),
    # y lattice is offset half a square (7 squares).
    corner_w = jnp.asarray([marker_xy[0], marker_xy[1] + 0.5 * MARKER.square, 0.0])
    uv, depth = project_points(
        CAM, corner_w, nadir_rotation(), -(nadir_rotation() @ cam_pos)
    )
    u, v = float(uv[0]), float(uv[1])
    assert 2 < u < 81 and 2 < v < 81
    assert abs(float(depth) - height) < 1e-5
    ui, vi = int(round(u)), int(round(v))
    patch = img[vi - 2 : vi + 3, ui - 2 : ui + 3, 0]
    # crossing => diagonal quadrants match, adjacent differ
    q00, q01 = patch[0, 0], patch[0, -1]
    q10, q11 = patch[-1, 0], patch[-1, -1]
    assert (q00 - 0.5) * (q11 - 0.5) > 0
    assert (q01 - 0.5) * (q10 - 0.5) > 0
    assert (q00 - 0.5) * (q01 - 0.5) < 0


def test_render_vmaps_and_jits():
    f = jax.jit(
        jax.vmap(lambda p, m: render_nadir(CAM, p, m, MARKER))
    )
    quad = jnp.asarray([[0.0, 0.0, -2.0], [1.0, 1.0, -3.0]])
    marker = jnp.asarray([[0.0, 0.0], [0.5, -0.5]])
    imgs = f(quad, marker)
    assert imgs.shape == (2, 84, 84, 3)
    assert np.isfinite(np.asarray(imgs)).all()


def test_higher_altitude_shrinks_marker():
    def marker_pixels(h):
        img = np.asarray(render_nadir(CAM, jnp.asarray([0.0, 0.0, h - 5.0]), jnp.zeros(2), MARKER))
        # count pixels far from ground color (board or border)
        g = np.asarray([0.35, 0.42, 0.32])
        d = np.linalg.norm(img - g, axis=-1)
        return (d > 0.25).sum()

    low, high = marker_pixels(1.5), marker_pixels(5.0)
    assert low > high * 2, (low, high)
