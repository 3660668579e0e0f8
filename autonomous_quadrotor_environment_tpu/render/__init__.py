"""On-device camera rendering: pinhole model + checkerboard/ground raster.

TPU-native replacement for the reference's Panda3D offscreen-buffer camera
(reference: computer_vision/img_2_cv.py:9-33, visual_landing/
ppo_world_setup.py:70-103): instead of a C++ rasterizer producing frames on
the host GPU, the onboard view is a pure JAX function of (quad position,
marker position) — it `vmap`s over the env batch and fuses into the
training step, so the entire visual-landing rollout is one XLA program.
"""

from .camera import CameraModel, make_camera, pixel_rays, project_points
from .scene import render_nadir, render_pinhole

__all__ = [
    "CameraModel",
    "make_camera",
    "pixel_rays",
    "project_points",
    "render_nadir",
    "render_pinhole",
]
