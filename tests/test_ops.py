"""Pallas kernels vs their jnp reference implementations (interpret mode on
the CPU suite; compiled on TPU via the verify smoke)."""

import jax
import jax.numpy as jnp
import numpy as np

from autonomous_quadrotor_environment_tpu.config import CameraConfig, MarkerConfig
from autonomous_quadrotor_environment_tpu.ops import render_nadir_batch_pallas
from autonomous_quadrotor_environment_tpu.render import make_camera, render_nadir


def test_pallas_render_matches_jnp_renderer():
    cam_cfg = CameraConfig()
    marker = MarkerConfig()
    cam = make_camera(cam_cfg)
    quad = jnp.asarray(
        [[0.0, 0.0, -2.0], [0.5, -0.3, -3.5], [-1.0, 1.0, -1.0]], jnp.float32
    )
    mxy = jnp.asarray([[0.0, 0.0], [0.2, 0.1], [-0.4, 0.6]], jnp.float32)

    want = jax.vmap(lambda p, m: render_nadir(cam, p, m, marker))(quad, mxy)
    got = render_nadir_batch_pallas(quad, mxy, cam_cfg, marker, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
