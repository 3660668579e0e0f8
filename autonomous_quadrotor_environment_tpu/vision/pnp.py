"""Batched Gauss-Newton PnP: planar-board pose from ordered 2D corners.

Replaces the reference's `cv.solvePnP` (reference computer_vision/
quadrotor_cv.py:70) with a homography initialization + fixed-iteration
Gauss-Newton refinement over (so(3) rotation, translation) — static shapes
and iteration counts, `vmap`-able over the env batch.

Conventions: object points live on the marker plane z=0 (board frame);
the solved pose maps board->camera: ``X_c = R X_b + t``. The camera position
in the board frame is ``-R^T t`` — the quantity the reference assembles with
ad-hoc sign flips (quadrotor_cv.py:78-88).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import MarkerConfig
from ..render.camera import CameraModel


def board_object_points(marker: MarkerConfig | None = None, centered: bool = True) -> jnp.ndarray:
    """(rows*cols, 3) inner-corner coordinates on the board plane.

    The reference uses a corner-origin grid (detector_setup.py:13-14:
    mgrid * scale * sqr_size); `centered=True` shifts the origin to the
    board center to match our renderer's marker frame.
    """
    marker = marker or MarkerConfig()
    s = marker.square
    jj, ii = jnp.meshgrid(jnp.arange(marker.rows), jnp.arange(marker.cols), indexing="ij")
    pts = jnp.stack([ii.reshape(-1) * s, jj.reshape(-1) * s], axis=-1).astype(jnp.float32)
    if centered:
        # inner-corner lattice: x spans (cols-1)*s centered, y likewise
        pts = pts - jnp.asarray(
            [(marker.cols - 1) * s / 2.0, (marker.rows - 1) * s / 2.0], jnp.float32
        )
    z = jnp.zeros((pts.shape[0], 1), jnp.float32)
    return jnp.concatenate([pts, z], axis=-1)


def _so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: so(3) vector -> rotation matrix. Written so both the value
    AND its forward-mode derivative are finite at w = 0 (the Gauss-Newton
    refinement linearizes around zero): sin(t)/t and (1-cos t)/t^2 are
    computed with a softened t, never k = w/|w|."""
    theta2 = jnp.sum(w * w)
    # eps=1e-12 keeps every intermediate (incl. squared denominators in the
    # JVP quotient rule) well above the float32 underflow threshold.
    theta = jnp.sqrt(theta2 + 1e-12)
    a = jnp.sin(theta) / theta
    half_sinc = jnp.sin(theta / 2.0) / (theta / 2.0)
    b = 0.5 * half_sinc**2  # == (1 - cos t) / t^2, smooth at t = 0
    wx = jnp.asarray(
        [[0.0, -w[2], w[1]], [w[2], 0.0, -w[0]], [-w[1], w[0], 0.0]], w.dtype
    )
    return jnp.eye(3, dtype=w.dtype) + a * wx + b * (wx @ wx)


def _homography_init(obj_xy: jnp.ndarray, uv_n: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """DLT homography from the plane to normalized image coords, decomposed
    into an initial (R, t) (classic plane-based pose init)."""
    n = obj_xy.shape[0]
    x, y = obj_xy[:, 0], obj_xy[:, 1]
    u, v = uv_n[:, 0], uv_n[:, 1]
    zero = jnp.zeros(n, obj_xy.dtype)
    one = jnp.ones(n, obj_xy.dtype)
    rows_u = jnp.stack([x, y, one, zero, zero, zero, -u * x, -u * y, -u], axis=-1)
    rows_v = jnp.stack([zero, zero, zero, x, y, one, -v * x, -v * y, -v], axis=-1)
    a = jnp.concatenate([rows_u, rows_v], axis=0)
    # h = eigenvector of A^T A with smallest eigenvalue
    _, vecs = jnp.linalg.eigh(a.T @ a)
    h = vecs[:, 0]
    hmat = h.reshape(3, 3)
    # normalize so that ||h1|| = 1 and depth positive
    h1, h2, h3 = hmat[:, 0], hmat[:, 1], hmat[:, 2]
    scale = jnp.linalg.norm(h1)
    sign = jnp.where(h3[2] / scale > 0, 1.0, -1.0)
    h1, h2, h3 = h1 / scale * sign, h2 / scale * sign, h3 / scale * sign
    r3 = jnp.cross(h1, h2)
    r_approx = jnp.stack([h1, h2, r3], axis=-1)
    # project onto SO(3) via SVD
    u_, _s, vt = jnp.linalg.svd(r_approx)
    r = u_ @ vt
    r = r * jnp.linalg.det(r)  # ensure det +1 (flips all cols; ok for init)
    return r, h3


def solve_pnp(
    cam: CameraModel,
    obj_pts: jnp.ndarray,  # (N, 3) board-frame points (z=0 plane)
    uv: jnp.ndarray,       # (N, 2) pixel observations
    iters: int = 10,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (R, t, rms) with X_c = R X_b + t and rms the final pixel
    reprojection error."""
    dtype = uv.dtype
    uv_n = jnp.stack(
        [(uv[:, 0] - cam.cx) / cam.fx, (uv[:, 1] - cam.cy) / cam.fy], axis=-1
    ).astype(dtype)
    r0, t0 = _homography_init(obj_pts[:, 0:2].astype(dtype), uv_n)

    f_scale = jnp.stack([cam.fx, cam.fy]).astype(dtype)

    def residuals(params):
        w, t = params[:3], params[3:6]
        r = _so3_exp(w) @ r0
        xc = obj_pts.astype(dtype) @ r.T + t
        proj = xc[:, 0:2] / xc[:, 2:3]
        return ((proj - uv_n) * f_scale).reshape(-1)  # pixel units

    def gn_step(params, _):
        j = jax.jacfwd(residuals)(params)
        res = residuals(params)
        jtj = j.T @ j + 1e-6 * jnp.eye(6, dtype=dtype)
        delta = jnp.linalg.solve(jtj, j.T @ res)
        return params - delta, None

    params0 = jnp.concatenate([jnp.zeros(3, dtype), t0])
    params, _ = jax.lax.scan(gn_step, params0, None, length=iters)
    r = _so3_exp(params[:3]) @ r0
    t = params[3:6]
    rms = jnp.sqrt(jnp.mean(residuals(params) ** 2))
    return r, t, rms


def camera_pose_from_pnp(r: jnp.ndarray, t: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Camera position and board->camera-frame rotation transposed:
    (cam position in board frame, R_cb = R^T). The reference's equivalent
    is its sign-flipped `trans`/`euler` assembly (quadrotor_cv.py:78-88)."""
    return -(r.T @ t), r.T
