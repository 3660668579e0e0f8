"""Vision pipeline: PnP on synthetic projections (SURVEY.md §4 "PnP/pose
test against synthetic projections") and the full render->detect->PnP round
trip, plus calibration and complementary-fusion semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from autonomous_quadrotor_environment_tpu.config import CameraConfig, MarkerConfig, SensorConfig
from autonomous_quadrotor_environment_tpu.envs.sensors import SensorState
from autonomous_quadrotor_environment_tpu.render import make_camera, render_nadir
from autonomous_quadrotor_environment_tpu.render.camera import nadir_rotation, project_points
from autonomous_quadrotor_environment_tpu.vision import (
    board_object_points,
    calibrate_camera,
    chessboard_corners_nadir,
    corner_response,
    count_corners,
    reprojection_rms,
    solve_pnp,
    vision_fuse,
    vision_fusion_init,
)
from autonomous_quadrotor_environment_tpu.vision.pnp import camera_pose_from_pnp, _so3_exp

MARKER = MarkerConfig()


def _sensor_state(pos, vel, quat):
    z = jnp.zeros(())
    return SensorState(
        a_b_accel=z, a_b_grav=z, g_b=z, m_b=z, a_b_d=z, g_b_d=z, m_b_d=z,
        pos_ins=jnp.asarray(pos), vel_ins=jnp.asarray(vel),
        quat_ins=jnp.asarray(quat), r_est=jnp.eye(3),
    )


def test_so3_exp_matches_scipy():
    from scipy.spatial.transform import Rotation

    for v in ([0.1, -0.2, 0.3], [1e-8, 0, 0], [0, 2.0, 0]):
        got = np.asarray(_so3_exp(jnp.asarray(v, jnp.float32)))
        want = Rotation.from_rotvec(v).as_matrix()
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_pnp_recovers_pose_from_synthetic_projections():
    """Project the board through a known general pose; PnP must recover it."""
    cam = make_camera(CameraConfig(width=320, height=320))
    obj = board_object_points(MARKER)
    rng = np.random.default_rng(0)
    for trial in range(5):
        w = rng.normal(0, 0.15, 3)  # small tilt around nadir
        r_true = np.asarray(_so3_exp(jnp.asarray(w, jnp.float32))) @ np.asarray(
            nadir_rotation()
        )
        cam_pos = np.array([rng.normal(0, 0.2), rng.normal(0, 0.2), rng.uniform(1.0, 3.0)])
        t_true = -(r_true @ cam_pos)
        uv, depth = project_points(
            cam, obj, jnp.asarray(r_true, jnp.float32), jnp.asarray(t_true, jnp.float32)
        )
        assert np.all(np.asarray(depth) > 0)
        uv_noisy = np.asarray(uv) + rng.normal(0, 0.1, np.asarray(uv).shape)
        r, t, rms = solve_pnp(cam, obj, jnp.asarray(uv_noisy, jnp.float32))
        pos_est, _ = camera_pose_from_pnp(r, t)
        np.testing.assert_allclose(np.asarray(pos_est), cam_pos, atol=0.03)
        np.testing.assert_allclose(np.asarray(r), r_true, atol=0.02)
        assert float(rms) < 0.5


def test_render_detect_pnp_round_trip():
    """The full GPS-denied pose pipeline on our own rendered images."""
    cam_cfg = CameraConfig(width=240, height=240)
    cam = make_camera(cam_cfg)
    obj = board_object_points(MARKER)
    for quad_xy, marker_xy, h in [
        ((0.0, 0.0), (0.0, 0.0), 1.6),
        ((0.3, -0.2), (0.1, 0.1), 2.0),
        ((-0.2, 0.25), (-0.1, 0.2), 1.2),
    ]:
        quad_env = jnp.asarray([quad_xy[0], quad_xy[1], h - 5.0], jnp.float32)
        marker = jnp.asarray(marker_xy, jnp.float32)
        img = render_nadir(cam, quad_env, marker, MARKER)
        gray = jnp.mean(img, axis=-1)
        uv, ok = chessboard_corners_nadir(gray)
        assert bool(ok)
        r, t, rms = solve_pnp(cam, obj, uv)
        assert float(rms) < 1.0, float(rms)
        pos_est, _ = camera_pose_from_pnp(r, t)
        want = np.array([quad_xy[0] - marker_xy[0], quad_xy[1] - marker_xy[1], h])
        np.testing.assert_allclose(np.asarray(pos_est), want, atol=0.05)
        # attitude ~ nadir
        np.testing.assert_allclose(np.asarray(r), np.asarray(nadir_rotation()), atol=0.03)


def test_corner_gate_counts():
    cam = make_camera(CameraConfig(width=240, height=240))
    img = render_nadir(cam, jnp.asarray([0.0, 0.0, -3.2]), jnp.zeros(2), MARKER)
    gray = jnp.mean(img, axis=-1)
    n_board = int(count_corners(gray))
    # far away / no marker in view
    img2 = render_nadir(cam, jnp.asarray([20.0, 20.0, -3.2]), jnp.zeros(2), MARKER)
    n_empty = int(count_corners(jnp.mean(img2, axis=-1)))
    assert n_board > 50 >= n_empty, (n_board, n_empty)


def test_calibration_recovers_intrinsics():
    cfg = CameraConfig(width=240, height=240)
    cam = make_camera(cfg)
    obj = board_object_points(MARKER)
    rng = np.random.default_rng(1)
    views, uvs = [], []
    for _ in range(10):
        w = rng.normal(0, 0.2, 3)
        r = np.asarray(_so3_exp(jnp.asarray(w, jnp.float32))) @ np.asarray(nadir_rotation())
        cam_pos = np.array([rng.normal(0, 0.3), rng.normal(0, 0.3), rng.uniform(1.0, 3.0)])
        t = -(r @ cam_pos)
        xc = np.asarray(obj) @ r.T + t
        uv, _ = project_points(cam, obj, jnp.asarray(r, jnp.float32), jnp.asarray(t, jnp.float32))
        views.append(xc)
        uvs.append(np.asarray(uv))
    est = calibrate_camera(
        jnp.asarray(np.stack(views), jnp.float32),
        jnp.asarray(np.stack(uvs), jnp.float32),
        cfg.width,
        cfg.height,
    )
    assert abs(float(est.fx) - cfg.fx) < 0.5
    assert abs(float(est.fy) - cfg.fy) < 0.5
    rms = reprojection_rms(est, jnp.asarray(np.stack(views), jnp.float32), jnp.asarray(np.stack(uvs), jnp.float32))
    assert float(rms) < 0.1


def test_fusion_blends_with_reference_gains():
    s = _sensor_state([1.0, 0.0, 0.0], [0.0, 0.0, 0.0], [1.0, 0.0, 0.0, 0.0])
    f = vision_fusion_init()
    vpos = jnp.asarray([2.0, 0.0, 0.0])
    vquat = jnp.asarray([0.9, 0.1, 0.0, 0.0])
    f, s2 = vision_fuse(f, s, vpos, vquat, jnp.asarray(True), jnp.asarray(10, jnp.int32), 0.01)
    np.testing.assert_allclose(np.asarray(s2.pos_ins), [0.8 * 1 + 0.2 * 2, 0, 0], rtol=1e-6)
    np.testing.assert_allclose(float(s2.quat_ins[0]), 0.8 * 1 + 0.2 * 0.9, rtol=1e-6)
    # velocity untouched before the variance gate opens
    np.testing.assert_allclose(np.asarray(s2.vel_ins), [0, 0, 0], atol=1e-7)

    # feed >50 consistent fixes: gate opens, velocity starts blending
    step = 10
    for k in range(60):
        step += 10
        vpos = vpos + jnp.asarray([0.05, 0.0, 0.0])  # 0.5 m/s at dt=0.01,10 steps
        f, s2 = vision_fuse(f, s2, vpos, vquat, jnp.asarray(True), jnp.asarray(step, jnp.int32), 0.01)
    assert float(s2.vel_ins[0]) > 0.04  # pulled toward 0.5 m/s


def test_fusion_noop_when_not_ok():
    s = _sensor_state([1.0, 2.0, 3.0], [0.1, 0.2, 0.3], [1.0, 0.0, 0.0, 0.0])
    f = vision_fusion_init()
    f2, s2 = vision_fuse(
        f, s, jnp.zeros(3), jnp.asarray([1.0, 0, 0, 0]), jnp.asarray(False),
        jnp.asarray(5, jnp.int32), 0.01,
    )
    np.testing.assert_array_equal(np.asarray(s2.pos_ins), np.asarray(s.pos_ins))
    np.testing.assert_array_equal(np.asarray(s2.vel_ins), np.asarray(s.vel_ins))


def test_vision_correction_bounds_ins_drift():
    """Hybrid mode (reference pos_deter): with PnP corrections every 10
    frames the INS position error stays bounded, while pure dead reckoning
    drifts (the GPS-denied premise of the whole reference project)."""
    import jax.numpy as jnp
    from autonomous_quadrotor_environment_tpu.config import (
        CameraConfig,
        EnvConfig,
        SensorConfig,
    )
    from autonomous_quadrotor_environment_tpu.core.dynamics import physics_step
    from autonomous_quadrotor_environment_tpu.core.randomization import zeros_domain
    from autonomous_quadrotor_environment_tpu.envs.sensors import (
        reads_from_env,
        sensor_fused,
        sensor_reset,
    )
    from autonomous_quadrotor_environment_tpu.vision import (
        vision_correction_step,
        vision_fusion_init,
    )

    env_cfg = EnvConfig()
    scfg = SensorConfig()
    cam_cfg = CameraConfig(width=240, height=240)
    x = jnp.zeros(13).at[4].set(-2.0).at[6].set(1.0)  # parked 3 m above ground
    zc = jnp.full((4,), env_cfg.physics.hover_action_direct)
    _, aux = physics_step(x, zc, jnp.zeros(3), env_cfg.physics, zeros_domain(), dt=env_cfg.dt)
    reads = reads_from_env(x, aux)

    def run(with_vision: bool):
        sens = sensor_reset(jax.random.PRNGKey(0), reads, scfg)
        f = vision_fusion_init()

        def body(carry, i):
            sens, f, key = carry
            key, ks = jax.random.split(key)
            sens, fused = sensor_fused(sens, reads, ks, scfg, env_cfg.physics, env_cfg.dt)
            if with_vision:
                f, sens, _ = vision_correction_step(
                    f, sens, x[0:5:2], jnp.zeros(2), i, env_cfg.dt, cam_cfg, MARKER
                )
            err = jnp.linalg.norm(sens.pos_ins - x[0:5:2])
            return (sens, f, key), err

        (_, _, _), errs = jax.lax.scan(
            body, (sens, f, jax.random.PRNGKey(1)), jnp.arange(1, 301)
        )
        return np.asarray(errs)

    err_vis = run(True)
    err_ins = run(False)
    # vision-corrected estimate stays tight; pure INS drifts well past it
    assert err_vis[-1] < 0.3, err_vis[-1]
    assert err_ins[-1] > err_vis[-1] * 2, (err_ins[-1], err_vis[-1])
