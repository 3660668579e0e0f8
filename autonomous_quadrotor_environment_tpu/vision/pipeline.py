"""End-to-end vision pose-correction step for closed-loop control.

The reference's `pos_deter` task (reference computer_vision/
quadrotor_cv.py:57-105) as one batched function: every N-th frame, render
the nadir view, gate on the FAST-equivalent corner count (>50, :64-66),
find the ordered chessboard corners, solve PnP, convert the camera pose to
an env-frame position/attitude estimate, and blend it into the INS with the
complementary filter (:90-99). Used by the hybrid ("IMG_POS_DETER") control
mode of the mission harness (reference config/menu.py:28-50, position.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import CameraConfig, MarkerConfig
from ..core.quaternion import quat_normalize, quat_rot_mat, rot_mat_quat
from ..envs.sensors import SensorState
from ..render import make_camera, render_pinhole
from ..render.camera import nadir_rotation
from .corners import chessboard_corners_nadir, count_corners
from .fusion import VisionFusionState, vision_fuse
from .pnp import board_object_points, camera_pose_from_pnp, solve_pnp


class VisionPoseOut(NamedTuple):
    ok: jnp.ndarray        # () detection+solve success
    pos_env: jnp.ndarray   # (3,) estimated env-frame position
    quat: jnp.ndarray      # (4,) estimated attitude
    rms: jnp.ndarray       # () reprojection error [px]


def vision_pose(
    quad_pos_env: jnp.ndarray,   # (3,) TRUE position (renders the view)
    marker_xy: jnp.ndarray,      # (2,) marker position on the ground
    cam_cfg: CameraConfig,
    marker_cfg: MarkerConfig,
    ground_z_env: float = -5.0,
    corner_gate: int = 50,
    rms_gate: float = 1.0,
    quad_quat: jnp.ndarray | None = None,
) -> VisionPoseOut:
    """Render -> detect -> PnP -> env-frame pose estimate.

    With ``quad_quat`` the camera is BODY-ATTACHED, optical axis along body
    -z (the reference's mission camera is reparented to the quad,
    quadrotor_cv.py:29-32), so PnP also measures attitude; without it the
    camera is gimbal-stabilized nadir (the landing camera's fixed
    orientation, rl_worker.py:128) and the recovered quaternion is only the
    camera mount's (≈ identity).
    """
    cam = make_camera(cam_cfg)
    dtype = quad_pos_env.dtype
    height = quad_pos_env[2] - ground_z_env
    cam_pos_w = jnp.stack(
        [quad_pos_env[0], quad_pos_env[1], jnp.maximum(height, 1e-3)]
    )
    if quad_quat is None:
        r_wc = nadir_rotation(dtype)
    else:
        # camera frame = nadir-convention frame rigidly attached to the body:
        # world->camera = R_cam<-body @ R_body<-world = nadir @ rot_mat^T.
        r_wc = nadir_rotation(dtype) @ quat_rot_mat(quat_normalize(quad_quat)).T
    img = render_pinhole(cam, r_wc, cam_pos_w, marker_xy, marker_cfg)
    gray = jnp.mean(img, axis=-1)
    n_corners = count_corners(gray)
    uv, found = chessboard_corners_nadir(gray, marker_cfg.cols, marker_cfg.rows)
    obj = board_object_points(marker_cfg)
    r, t, rms = solve_pnp(cam, obj, uv)
    cam_pos_board, _r_cb = camera_pose_from_pnp(r, t)
    # board frame == world translated to the marker; env z = height + ground.
    pos_env = jnp.stack(
        [
            cam_pos_board[0] + marker_xy[0],
            cam_pos_board[1] + marker_xy[1],
            cam_pos_board[2] + ground_z_env,
        ]
    )
    # attitude: R maps board->camera = nadir @ R_body<-world, so
    # R_body->world = (nadir^T R)^T.
    r_body_world = (nadir_rotation(r.dtype).T @ r).T
    quat = rot_mat_quat(r_body_world)
    ok = jnp.logical_and(
        jnp.logical_and(n_corners > corner_gate, found),
        jnp.logical_and(rms < rms_gate, jnp.isfinite(rms)),
    )
    safe = lambda x: jnp.where(jnp.isfinite(x), x, jnp.zeros_like(x))
    return VisionPoseOut(ok=ok, pos_env=safe(pos_env), quat=safe(quat), rms=rms)


def vision_correction_step(
    fstate: VisionFusionState,
    sens: SensorState,
    quad_pos_env: jnp.ndarray,
    marker_xy: jnp.ndarray,
    step_i: jnp.ndarray,
    dt: float,
    cam_cfg: CameraConfig,
    marker_cfg: MarkerConfig,
    every: int = 10,
    quad_quat: jnp.ndarray | None = None,
    innovation_gate: float = 1.5,
) -> tuple[VisionFusionState, SensorState, VisionPoseOut]:
    """The full pos_deter cadence: run the vision pipeline on every
    ``every``-th step (reference quadrotor_cv.py:62: task.frame % 10 == 1)
    and fuse on success. The render+detect+PnP work runs under `lax.cond`,
    so off-cadence steps skip it entirely (in un-vmapped scans; under vmap
    XLA lowers cond to select and both branches execute).

    Beyond the reference's corner-count gate, fixes are also innovation-
    gated: an estimate further than ``innovation_gate`` meters from the
    current INS position is rejected (our top-k detector, unlike OpenCV's
    findChessboardCorners, always returns 54 peaks — marginal detections at
    altitude must not yank the filter)."""
    due = jnp.mod(step_i, every) == 1
    out = jax.lax.cond(
        due,
        lambda: vision_pose(
            quad_pos_env, marker_xy, cam_cfg, marker_cfg, quad_quat=quad_quat
        ),
        lambda: VisionPoseOut(
            ok=jnp.zeros((), bool),
            pos_env=jnp.zeros(3, quad_pos_env.dtype),
            quat=jnp.zeros(4, quad_pos_env.dtype),
            rms=jnp.asarray(jnp.inf, quad_pos_env.dtype),
        ),
    )
    innovation = jnp.linalg.norm(out.pos_env - sens.pos_ins)
    ok = jnp.logical_and(
        jnp.logical_and(out.ok, due), innovation < innovation_gate
    )
    fstate, sens = vision_fuse(fstate, sens, out.pos_env, out.quat, ok, step_i, dt)
    return fstate, sens, VisionPoseOut(ok=ok, pos_env=out.pos_env, quat=out.quat, rms=out.rms)
