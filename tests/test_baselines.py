"""Classical-controller baselines: the strongest correctness signal is
closed-loop behavior — the cascaded PID must fly the quad to a target, LQR
must kill a random initial velocity (the reference's 20-episode protocol,
lqr_quad.py / pid_vel_control.py, miniaturized)."""

import jax
import jax.numpy as jnp
import numpy as np

from autonomous_quadrotor_environment_tpu.baselines import (
    POSITION_GAINS,
    VELOCITY_GAINS,
    cascaded_pid_control,
    cascaded_pid_init,
    lqr_control,
    make_lqr_gains,
    vel_pid,
    vel_pid_init,
)
from autonomous_quadrotor_environment_tpu.config import EnvConfig, PhysicsConfig
from autonomous_quadrotor_environment_tpu.envs import hover
from autonomous_quadrotor_environment_tpu.missions import (
    gen_trajectory,
    mission_target,
    response_metrics,
    spiral_trajectory,
)

PHYS = PhysicsConfig()


def _indirect_cfg(n=2000):
    return EnvConfig(n_steps=n, direct_control=False, training=False)


def test_pid_tracks_position_target():
    cfg = _indirect_cfg(1500)
    traj = gen_trajectory(1500, 100, np.array([1.0, 1.0, 1.0]), dt=cfg.dt)
    x0 = jnp.zeros(13).at[6].set(1.0)
    env_state = hover.reset(jax.random.PRNGKey(0), cfg, det_state=x0)
    pid_state = cascaded_pid_init()

    def body(carry, i):
        env_s, pid_s = carry
        tgt = mission_target(traj, i)
        pid_s, action = cascaded_pid_control(
            pid_s,
            env_s.x[0:5:2],
            env_s.x[1:6:2],
            env_s.ang,
            env_s.ang_vel,
            tgt[0:5:2],
            tgt[1:6:2],
            jnp.zeros(()),
            POSITION_GAINS,
            cfg.physics,
            cfg.dt,
        )
        env_s, out = hover.step(env_s, action, cfg)
        return (env_s, pid_s), env_s.x

    (env_state, _), xs = jax.lax.scan(body, (env_state, pid_state), jnp.arange(1500))
    final_pos = np.asarray(xs[-1][0:5:2])
    np.testing.assert_allclose(final_pos, [1.0, 1.0, 1.0], atol=0.1)
    # and it should be near-stationary
    assert np.linalg.norm(np.asarray(xs[-1][1:6:2])) < 0.2


def test_pid_tracks_spiral():
    cfg = _indirect_cfg(1000)
    traj = spiral_trajectory(4000, 5000, 1.0, np.pi / 10, 0.3, np.zeros(3), dt=cfg.dt)
    x0 = jnp.zeros(13).at[6].set(1.0)
    env_state = hover.reset(jax.random.PRNGKey(0), cfg, det_state=x0)
    pid_state = cascaded_pid_init()

    def body(carry, i):
        env_s, pid_s = carry
        tgt = mission_target(traj, i)
        pid_s, action = cascaded_pid_control(
            pid_s, env_s.x[0:5:2], env_s.x[1:6:2], env_s.ang, env_s.ang_vel,
            tgt[0:5:2], tgt[1:6:2], jnp.zeros(()), POSITION_GAINS, cfg.physics, cfg.dt,
        )
        env_s, _ = hover.step(env_s, action, cfg)
        err = jnp.linalg.norm(env_s.x[0:5:2] - tgt[0:5:2])
        return (env_s, pid_s), err

    (_, _), errs = jax.lax.scan(body, (env_state, pid_state), jnp.arange(1000))
    # after transient, tracking error stays small
    assert float(jnp.max(errs[500:])) < 0.3, float(jnp.max(errs[500:]))


def test_lqr_regulates_velocity():
    gains = make_lqr_gains(PHYS, clipped=True)
    cfg = _indirect_cfg(500)
    key = jax.random.PRNGKey(3)
    # moderate random start (the reference uses env.reset() random starts)
    env_state = hover.reset(key, cfg)

    def body(carry, _):
        env_s, euler_ant = carry
        action, euler_ant = lqr_control(
            gains, env_s.x[1:6:2], env_s.ang, env_s.ang_vel, euler_ant,
            cfg.physics, cfg.dt,
        )
        env_s, _ = hover.step(env_s, action, cfg)
        return (env_s, euler_ant), env_s.x[1:6:2]

    (_, _), vels = jax.lax.scan(body, (env_state, jnp.zeros(3)), None, length=500)
    assert float(jnp.linalg.norm(vels[-1])) < 0.3, np.asarray(vels[-5:])


def test_lqr_gains_satisfy_care():
    """K = -R^-1 B^T P with P the CARE solution: check the Riccati residual
    through the closed loop being Hurwitz (all eigenvalues negative)."""
    gains = make_lqr_gains(PHYS, clipped=True)
    a = np.zeros((6, 6))
    a[0, 1] = a[2, 3] = a[4, 5] = 1.0
    b_t = np.zeros((6, 3))
    b_t[1, 0] = b_t[3, 1] = b_t[5, 2] = 1.0 / PHYS.mass
    acl = a + b_t @ np.asarray(gains.k_t)
    assert np.all(np.linalg.eigvals(acl).real < 0)
    b_att = np.zeros((6, 4))
    b_att[1, 1] = 1.0 / PHYS.j_xx
    b_att[3, 2] = 1.0 / PHYS.j_yy
    b_att[5, 3] = 1.0 / PHYS.j_zz
    acl = a + b_att @ np.asarray(gains.k_att)
    assert np.all(np.linalg.eigvals(acl).real < 0)


def test_vel_pid_outputs_velocity_error_layout():
    s = vel_pid_init()
    state = jnp.zeros(13).at[0].set(1.0)  # x=1
    target = jnp.zeros(14).at[0].set(2.0)  # xd=2
    s, err = vel_pid(s, state, target)
    assert err.shape == (14,)
    assert float(err[0]) == 0.0
    # P=3 on 1m error + D on first-step derivative jump
    assert float(err[1]) > 3.0
    assert float(err[3]) == 0.0 and float(err[5]) == 0.0


def test_mission_target_past_end_drifts():
    traj = spiral_trajectory(10, 20, 1.0, 0.5, 1.0, np.zeros(3))
    t19 = mission_target(traj, jnp.asarray(19))
    t25 = mission_target(traj, jnp.asarray(25))
    drift = np.asarray(t25[0:5:2]) - np.asarray(t19[0:5:2])
    expected = np.asarray(traj.velocities[-1]) * traj.dt * 6
    np.testing.assert_allclose(drift, expected, atol=1e-5)


def test_response_metrics_schema():
    y = np.zeros((13, 100))
    y[0, :] = 1.0  # x settled at 1 the whole time
    m = response_metrics(y, [1.0, 0.0, 0.0], control_effort=50.0, abs_error=10.0, env_max_steps=100)
    assert set(m) == {
        "CE", "EOT", "Over X", "Over Y", "Over Z", "Rise X", "Rise Y", "Rise Z",
        "Set X", "Set Y", "Set Z", "SS X", "SS Y", "SS Z",
    }
    assert m["CE"] == 0.5 and m["Rise X"] == 0.0 and m["SS X"] == 0.0
    assert m["Set X"] == 0.0  # never outside the 5% band


def test_reference_start_state_replication():
    """reference_start_states replays the reference's np.random stream
    (seed 1, robust draws + reset draws per episode) — pinned against the
    literal values behind the committed same-start logs."""
    from autonomous_quadrotor_environment_tpu.apps.classical_compare import (
        reference_start_states,
    )

    s = reference_start_states(20, seed=1)
    assert s.shape == (20, 13)
    np.testing.assert_allclose(
        s[0],
        [-2.22072611, -1.13302046, 0.36242853, 1.45995119, 1.12868973,
         0.74598758, 0.96867603, -0.2296427, 0.09233616, -0.02012803,
         1.06762182, -0.1839466, 3.82764078],
        atol=1e-6,
    )
    # Clip bounds of the reference reset distribution hold everywhere.
    assert np.abs(s[:, 0:5:2]).max() <= 2.5 + 1e-9
    assert np.abs(s[:, 1:6:2]).max() <= 5.0 + 1e-9
    assert s[:, 10:13].min() >= -15.0 - 1e-9 and s[:, 10:13].max() <= 7.5 + 1e-9


def test_classical_pid_legs_match_reference():
    """The PID same-start legs under the reference's own analyzer must
    reproduce the reference's committed results exactly: clipped 0%,
    unclipped 100% (computed from their pid_log_same_start*.npy)."""
    from autonomous_quadrotor_environment_tpu.apps.classical_compare import (
        analyze,
        reference_start_states,
        run_pid,
    )
    from autonomous_quadrotor_environment_tpu.baselines import (
        VELOCITY_GAINS,
        VELOCITY_GAINS_UNCLIPPED,
    )
    from autonomous_quadrotor_environment_tpu.config import EnvConfig

    starts = reference_start_states(20, seed=1)
    cfg_c = EnvConfig(n_steps=500, warmup=5, direct_control=False, clipped=True)
    cfg_u = EnvConfig(n_steps=500, warmup=5, direct_control=False, clipped=False)
    clipped = analyze(run_pid(cfg_c, starts, VELOCITY_GAINS), cfg_c)
    unclipped = analyze(run_pid(cfg_u, starts, VELOCITY_GAINS_UNCLIPPED), cfg_u)
    assert clipped["success_rate"] == 0.0
    assert unclipped["success_rate"] == 1.0
