"""Camera calibration: recover pinhole intrinsics from board observations.

Capability match for the reference's `calibration` class
(reference: computer_vision/camera_calibration.py:5-67: >50 random-pose
chessboard captures -> cv.calibrateCamera with distortion zeroed :54).
Since we own the synthetic pinhole camera the intrinsics are known in
closed form (config.CameraConfig.fx/fy) — this module keeps the
*calibration path* for parity: a batched least-squares fit of (fx, fy, cx,
cy) from corner observations of boards at known poses, plus a reprojection
RMS check. Distortion is identically zero, like the reference's synthetic
camera.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..render.camera import CameraModel


def calibrate_camera(
    obj_pts_cam: jnp.ndarray,  # (V, N, 3) board corners in CAMERA frame per view
    uv: jnp.ndarray,           # (V, N, 2) observed pixels
    width: int,
    height: int,
) -> CameraModel:
    """Linear least squares for (fx, cx) and (fy, cy):
        u = fx * (x/z) + cx,  v = fy * (y/z) + cy.
    Views with known camera-frame geometry make this exactly determined —
    the synthetic-camera analogue of cv.calibrateCamera."""
    xn = (obj_pts_cam[..., 0] / obj_pts_cam[..., 2]).reshape(-1)
    yn = (obj_pts_cam[..., 1] / obj_pts_cam[..., 2]).reshape(-1)
    u = uv[..., 0].reshape(-1)
    v = uv[..., 1].reshape(-1)

    def fit(x, y):
        a = jnp.stack([x, jnp.ones_like(x)], axis=-1)
        sol, *_ = jnp.linalg.lstsq(a, y)
        return sol[0], sol[1]

    fx, cx = fit(xn, u)
    fy, cy = fit(yn, v)
    return CameraModel(fx=fx, fy=fy, cx=cx, cy=cy, width=width, height=height)


def reprojection_rms(
    cam: CameraModel,
    obj_pts_cam: jnp.ndarray,  # (..., 3) camera-frame points
    uv: jnp.ndarray,           # (..., 2) observed pixels
) -> jnp.ndarray:
    u = cam.fx * obj_pts_cam[..., 0] / obj_pts_cam[..., 2] + cam.cx
    v = cam.fy * obj_pts_cam[..., 1] / obj_pts_cam[..., 2] + cam.cy
    err = jnp.stack([u, v], axis=-1) - uv
    return jnp.sqrt(jnp.mean(jnp.sum(err**2, axis=-1)))
