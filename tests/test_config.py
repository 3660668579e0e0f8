"""Config-constant pin tests: the reward/physics magic numbers are
load-bearing parity surface (SURVEY.md §7 "port them exactly, test them in
isolation") — these tests freeze them against the reference values."""

import math

from autonomous_quadrotor_environment_tpu.config import (
    CameraConfig,
    EnvConfig,
    LandingConfig,
    MarkerConfig,
    PhysicsConfig,
    PPOConfig,
    RewardConfig,
    SensorConfig,
)


def test_physics_constants_match_reference():
    p = PhysicsConfig()
    # reference environment/quadrotor_env.py:30-67
    assert p.mass == 1.03 and p.gravity == 9.82
    assert p.k_f == 1.435e-5 and p.k_m == 2.4086e-7
    assert p.i_r == 5e-5 and p.t2wr == 2.0
    assert (p.j_xx, p.j_yy, p.j_zz) == (16.83e-3, 16.83e-3, 28.34e-3)
    assert p.d_arm == 0.26 and p.beam_thickness == 0.05
    assert abs(p.max_motor_thrust - 2.0 * 1.03 * 9.82 / 4) < 1e-9
    assert p.hover_action_direct == 0.0  # 2/T2WR - 1 with T2WR=2
    # closed form of sum(linspace(0, D, 10)^3)
    import numpy as np

    assert abs(p.arm_drag_sum - float((np.linspace(0, 0.26, 10) ** 3).sum())) < 1e-12


def test_primary_reward_constants():
    r = RewardConfig()
    # reference quadrotor_env.py:69-81: SHAPING_WEIGHT/sum(W)*W = 5/20*(15,4,1)
    assert r.shaping_coefs == (3.75, 1.0, 0.25)
    assert r.solved_reward == 20.0 and r.broken_reward == -20.0
    assert r.p_c == 0.003
    assert r.tr == (0.005, 0.01, 0.1) and r.tr_p == (3.0, 2.0, 1.0)
    assert not r.terminal_replaces and r.cascade_ang_factor == 4.0


def test_opt_reward_constants():
    r = RewardConfig.opt_variant()
    # reference quadrotor_env_opt.py:62-69, :437-480
    assert r.solved_reward == 500.0 and r.broken_reward == -200.0
    assert r.shaping_coefs == (100.0, 100.0, 30.0)
    assert r.p_c == 1.0
    assert r.tr == (0.001, 0.01, 0.1) and r.tr_p == (300.0, 100.0, 10.0)
    assert r.terminal_replaces and r.cascade_ang_all3 and r.cascade_ang_factor == 2.0


def test_landing_task_constants():
    lc = LandingConfig()
    # reference visual_landing/rl_worker.py:25-66
    assert lc.total_steps == 1500 and lc.task_interval == 10
    assert lc.velocity_scale == (0.5, 0.5, 1.0)
    assert lc.velocity_d == (0.0, 0.0, -1.0 / 1.5)
    assert lc.image_size == 84 and lc.marker_std == 0.8
    assert lc.eval_episodes == 100

    env = EnvConfig.landing_variant()
    assert env.n_steps == 1500 and env.training
    assert EnvConfig.landing_variant(training=False).bb_scale == 1000.0


def test_sensor_constants():
    s = SensorConfig()
    # reference quadrotor_env.py:587-591
    assert (s.accel_std, s.accel_bias_drift) == (0.1, 0.0005)
    assert (s.gyro_std, s.gyro_bias_drift) == (0.035, 0.00015)
    assert (s.magnet_std, s.magnet_bias_drift) == (15.0, 0.075)
    assert (s.gps_std_p, s.gps_std_v) == (1.71, 0.5)
    # Santo André magnetic vector (reference :651-653, mG * 0.01)
    assert s.magnet_vec == (-40.47, 129.11, -98.99)


def test_camera_marker_constants():
    c = CameraConfig()
    # reference img_2_cv.py:13-14
    assert (c.film_w, c.film_h, c.focal) == (36.0, 24.0, 35.0)
    assert (c.width, c.height) == (84, 84)
    m = MarkerConfig()
    # reference detector_setup.py:10-15, ppo_world_setup.py:97-103
    assert (m.cols, m.rows) == (9, 6)
    assert m.scale == 0.5 and m.sqr_size == 0.2046
    assert abs(m.square - 0.1023) < 1e-12


def test_ppo_hyperparameters():
    p = PPOConfig()
    # reference ppo.py:297-318
    assert p.lr == 5e-4 and p.gamma == 0.99 and p.gae_lambda == 0.99
    assert p.clip_eps == 0.2 and p.entropy_coef == 0.006
    assert p.k_epochs == 10 and p.action_std == 0.1 and not p.learn_std
    lp = PPOConfig.landing_variant()
    # reference ppo_trainer.py:28-38
    assert lp.lr == 2e-5 and lp.k_epochs == 5 and lp.minibatch_size == 1536
    assert lp.entropy_coef == 0.01 and lp.learn_std
    # round-5 CERTIFIED default: the reference's per-row randperm
    # (ppo_trainer.py:188-197). The round-4 frozen-composition fast path
    # (shuffle_block == minibatch) failed from-scratch certification on
    # the official benchmark (runs/r5/ablation/summary.json) and is no
    # longer the default.
    assert lp.shuffle_block == 1
    assert not lp.reshuffle_per_update and not lp.reshuffle_per_epoch


def test_landing_reward_thresholds():
    from autonomous_quadrotor_environment_tpu.landing import reward as lr

    # reference rl_reward_fuction.py:39-67
    assert lr.ERROR_P == 4.0 and lr.CONTROL_P == 0.1
    assert abs(lr.SOFT_VEL - math.sqrt(3) * 0.30) < 1e-12
    assert abs(lr.FLAT_ANG - math.sqrt(2) * 0.3491) < 1e-12
    assert lr.ON_TARGET_XY == 0.14 and lr.LANDED_Z == -4.95
    assert lr.ASTRAY_Z == 7.0 and lr.TIMEOUT_REWARD == -2.0
