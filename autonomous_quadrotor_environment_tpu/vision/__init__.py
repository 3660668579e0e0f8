"""Computer-vision pose pipeline: corner detection, PnP, sensor fusion.

TPU-native replacement for the reference's OpenCV pipeline
(reference: computer_vision/quadrotor_cv.py:51-105 — FAST prefilter,
findChessboardCorners, solvePnP, complementary-filter fusion into the INS —
and camera_calibration.py): every stage is a batched JAX function, so pose
correction runs on-device for the whole env batch inside the compiled step.
"""

from .calibration import calibrate_camera, reprojection_rms
from .corners import chessboard_corners_nadir, corner_response, count_corners
from .fusion import VisionFusionState, vision_fuse, vision_fusion_init
from .pipeline import VisionPoseOut, vision_correction_step, vision_pose
from .pnp import board_object_points, solve_pnp

__all__ = [
    "VisionFusionState",
    "VisionPoseOut",
    "board_object_points",
    "calibrate_camera",
    "chessboard_corners_nadir",
    "corner_response",
    "count_corners",
    "reprojection_rms",
    "solve_pnp",
    "vision_correction_step",
    "vision_fuse",
    "vision_fusion_init",
    "vision_pose",
]
