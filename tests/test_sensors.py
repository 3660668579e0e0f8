"""Sensor-suite validation.

Strategy (SURVEY.md §4): with noise disabled (cfg.enabled=False) every sensor
must return the exact true quantity and TRIAD must recover the exact
attitude; with noise enabled the INS dead-reckoning error must stay bounded
over a short horizon (the reference uses the same Euler-integration INS,
quadrotor_env.py:700-724).
"""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from autonomous_quadrotor_environment_tpu.config import (
    EnvConfig,
    PhysicsConfig,
    SensorConfig,
)
from autonomous_quadrotor_environment_tpu.core.quaternion import (
    euler_quat,
    quat_rot_mat,
)
from autonomous_quadrotor_environment_tpu.envs import hover
from autonomous_quadrotor_environment_tpu.envs.sensors import (
    QuadReads,
    accel_int,
    gps_read,
    gyro_read,
    reads_from_env,
    sensor_fused,
    sensor_reset,
    triad_read,
)

PHYS = PhysicsConfig()
DT = 0.01


def make_reads(key):
    """Random but physically consistent QuadReads: the inertial acceleration
    follows from the body thrust (no drag), and accelerometer_read carries the
    reference's double-gravity model (quadrotor_env.py:371)."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    ang = jax.random.uniform(k1, (3,), jnp.float32, -0.5, 0.5)
    q = euler_quat(ang)
    rot = quat_rot_mat(q)
    g_vec = jnp.asarray([0.0, 0.0, -PHYS.gravity])
    f_in_z = jax.random.uniform(k2, (), jnp.float32, 5.0, 15.0)
    f_body = jnp.stack([jnp.zeros(()), jnp.zeros(()), f_in_z])
    accel = rot @ f_body / PHYS.mass + g_vec
    return QuadReads(
        pos=jax.random.normal(k3, (3,)),
        vel=jax.random.normal(k4, (3,)),
        quat=q,
        omega=jnp.asarray([0.1, -0.2, 0.3]),
        accel=accel,
        accelerometer_read=rot.T @ (accel + g_vec),
        mat_rot=rot,
        f_in_z=f_in_z,
    )


def test_noise_free_reads_are_exact():
    cfg = SensorConfig(enabled=False)
    key = jax.random.PRNGKey(0)
    reads = make_reads(key)
    s = sensor_reset(key, reads, cfg)

    pos, vel = gps_read(reads, key, cfg)
    np.testing.assert_allclose(pos, reads.pos, rtol=1e-6)
    np.testing.assert_allclose(vel, reads.vel, rtol=1e-6)

    _, w = gyro_read(s, reads, key, cfg, DT)
    np.testing.assert_allclose(w, reads.omega, rtol=1e-6)


def test_triad_recovers_attitude_noise_free_opt():
    """Opt-variant TRIAD is exact with exact observations."""
    cfg = SensorConfig(enabled=False)
    key = jax.random.PRNGKey(1)
    for i in range(5):
        reads = make_reads(jax.random.fold_in(key, i))
        s = sensor_reset(key, reads, cfg)
        _, q, r = triad_read(s, reads, key, cfg, PHYS, DT, primary=False)
        # Quaternion sign is not unique — compare rotated test vectors.
        v = np.array([0.3, -0.7, 0.5])
        np.testing.assert_allclose(
            np.asarray(r) @ v, np.asarray(reads.mat_rot) @ v, atol=1e-5
        )
        q_true = np.asarray(reads.quat)
        q_got = np.asarray(q)
        err = min(np.linalg.norm(q_got - q_true), np.linalg.norm(q_got + q_true))
        assert err < 1e-4, (i, err)


def test_triad_primary_converges_via_r_est():
    """Primary-variant TRIAD estimates gravity through the previous rotation
    estimate (reference quadrotor_env.py:657-658, self.R carry): starting
    from identity it must converge to the true attitude over repeated calls
    (at the fixed point gravity_body = 3*R^T g — direction exact despite the
    reference's double-gravity accelerometer quirk)."""
    cfg = SensorConfig(enabled=False)
    key = jax.random.PRNGKey(7)
    for i in range(3):
        reads = make_reads(jax.random.fold_in(key, i))
        s = sensor_reset(key, reads, cfg)
        for _ in range(15):
            s, q, r = triad_read(s, reads, key, cfg, PHYS, DT, primary=True)
        v = np.array([0.3, -0.7, 0.5])
        np.testing.assert_allclose(
            np.asarray(r).T @ v, np.asarray(reads.mat_rot) @ v, atol=1e-4
        )
        q_true = np.asarray(reads.quat)
        q_got = np.asarray(q)
        err = min(np.linalg.norm(q_got - q_true), np.linalg.norm(q_got + q_true))
        assert err < 1e-3, (i, err)


def test_triad_quaternion_matches_scipy_convention():
    """rot_mat_quat must agree with scipy's Rotation (the reference converts
    through scipy, quadrotor_env.py:695-696)."""
    cfg = SensorConfig(enabled=False)
    key = jax.random.PRNGKey(2)
    reads = make_reads(key)
    s = sensor_reset(key, reads, cfg)
    _, q, r = triad_read(s, reads, key, cfg, PHYS, DT, primary=False)
    q_scipy = Rotation.from_matrix(np.asarray(r).T).as_quat()  # xyzw... r is R.T here
    # opt variant returns r = (tb@ti.T).T; reference does from_matrix(R.T)
    # with R = tb@ti.T, i.e. from_matrix(r). Recompute accordingly:
    q_scipy = Rotation.from_matrix(np.asarray(r)).as_quat()
    q_ref = np.concatenate([[q_scipy[3]], q_scipy[:3]])
    err = min(np.linalg.norm(np.asarray(q) - q_ref), np.linalg.norm(np.asarray(q) + q_ref))
    assert err < 1e-5


def test_ins_dead_reckoning_noise_free_tracks_truth():
    """Noise-free INS on a real simulated trajectory must track the true
    position closely over 100 steps (Euler integration error only)."""
    cfg = EnvConfig()
    scfg = SensorConfig(enabled=False)
    key = jax.random.PRNGKey(3)
    state = hover.reset(key, cfg)
    reads0 = QuadReads(
        pos=state.x[0:5:2],
        vel=state.x[1:6:2],
        quat=state.x[6:10],
        omega=state.x[10:13],
        accel=jnp.zeros(3),
        accelerometer_read=jnp.zeros(3),
        mat_rot=quat_rot_mat(state.x[6:10]),
        f_in_z=jnp.zeros(()),
    )
    s = sensor_reset(key, reads0, scfg)
    action = jnp.full((4,), cfg.physics.hover_action_direct)

    def body(carry, k):
        env_s, sens_s = carry
        env_s2, _ = hover.step(env_s, action, cfg)
        # rebuild aux-equivalent reads from the stepped state
        from autonomous_quadrotor_environment_tpu.core.dynamics import physics_step
        from autonomous_quadrotor_environment_tpu.core.randomization import zeros_domain

        _, aux = physics_step(
            env_s.x, action, jnp.zeros(3), cfg.physics, zeros_domain(), dt=cfg.dt
        )
        reads = reads_from_env(env_s2.x, aux)
        sens_s2, out = sensor_fused(sens_s, reads, k, scfg, cfg.physics, cfg.dt)
        return (env_s2, sens_s2), (out.pos_accel, env_s2.x[0:5:2])

    keys = jax.random.split(jax.random.PRNGKey(4), 100)
    (_, _), (pos_est, pos_true) = jax.lax.scan(body, (state, s), keys)
    err = np.linalg.norm(np.asarray(pos_est) - np.asarray(pos_true), axis=-1)
    assert err[-1] < 0.5, err[-1]


def test_fused_shapes_and_noise_magnitude():
    cfg = SensorConfig()
    key = jax.random.PRNGKey(5)
    reads = make_reads(key)
    s = sensor_reset(key, reads, cfg)
    s2, out = sensor_fused(s, reads, key, cfg, PHYS, DT)
    assert out.states_sens.shape == (14,)
    # GPS noise should be at the configured scale across many draws.
    keys = jax.random.split(key, 512)
    pos = jax.vmap(lambda k: gps_read(reads, k, cfg)[0])(keys)
    std = np.std(np.asarray(pos) - np.asarray(reads.pos), axis=0)
    np.testing.assert_allclose(std, cfg.gps_std_p, rtol=0.2)
    # Biases advanced the expected number of times in one fused read:
    # accel x1, grav x2, gyro x2, magnet x2.
    np.testing.assert_allclose(s2.a_b_accel, s.a_b_d * DT, rtol=1e-5)
    np.testing.assert_allclose(s2.a_b_grav, 2 * s.a_b_d * DT, rtol=1e-5)
    np.testing.assert_allclose(s2.g_b, 2 * s.g_b_d * DT, rtol=1e-5)
    np.testing.assert_allclose(s2.m_b, 2 * s.m_b_d * DT, rtol=1e-5)


def test_sensor_vmaps():
    cfg = SensorConfig()
    keys = jax.random.split(jax.random.PRNGKey(6), 8)
    reads = jax.vmap(make_reads)(keys)
    s = jax.vmap(lambda k, r: sensor_reset(k, r, cfg))(keys, reads)
    s2, out = jax.vmap(lambda s, r, k: sensor_fused(s, r, k, cfg, PHYS, DT))(s, reads, keys)
    assert out.states_sens.shape == (8, 14)
