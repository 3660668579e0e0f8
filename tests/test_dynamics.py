"""Dynamics + RK4 integrator validation.

The critical migration risk (SURVEY.md §7 "hard parts") is replacing scipy's
adaptive RK45 (reference quadrotor_env.py:483) with fixed-step RK4. These
tests integrate the *same* ODE with scipy in float64 and with our RK4, and
require trajectory agreement over hundreds of steps.
"""

import jax
import jax.numpy as jnp
import numpy as np
from scipy import integrate

from autonomous_quadrotor_environment_tpu.config import PhysicsConfig
from autonomous_quadrotor_environment_tpu.core import (
    allocation_matrix,
    drone_eq,
    f2F,
    f2w,
    physics_step,
    rotor_gyro_speed,
    zeros_domain,
)

PHYS = PhysicsConfig()
DOM = zeros_domain(jnp.float32)
RNG = np.random.default_rng(1)


def random_state():
    x = np.zeros(13)
    x[0:5:2] = RNG.normal(0, 1, 3)
    x[1:6:2] = RNG.normal(0, 1, 3)
    q = RNG.normal(0, 1, 4)
    x[6:10] = q / np.linalg.norm(q)
    x[10:13] = RNG.normal(0, 1, 3)
    return x


def scipy_trajectory(x0, action, n_steps, dt=0.01):
    """Integrate our drone_eq with scipy RK45 (float64) as the oracle."""
    with jax.enable_x64():
        motor = f2F(jnp.asarray(action, jnp.float64), PHYS, DOM)
        omega_r = rotor_gyro_speed(motor.w, PHYS, DOM)
        wind = jnp.zeros(3, jnp.float64)

        rhs = jax.jit(
            lambda x: drone_eq(x, motor.thrust, motor.moment, omega_r, wind, PHYS, DOM)
        )

        def f(t, x):
            return np.asarray(rhs(jnp.asarray(x)))

        xs = [x0]
        x = x0
        for _ in range(n_steps):
            sol = integrate.solve_ivp(f, (0, dt), x, rtol=1e-10, atol=1e-12)
            x = sol.y[:, -1]
            x[6:10] /= np.linalg.norm(x[6:10])
            xs.append(x)
        return np.array(xs)


def rk4_trajectory(x0, action, n_steps, dt=0.01, substeps=1, dtype=jnp.float64):
    with jax.enable_x64():
        x = jnp.asarray(x0, dtype)
        a = jnp.asarray(action, dtype)
        wind = jnp.zeros(3, dtype)
        dom = zeros_domain(dtype)

        @jax.jit
        def roll(x):
            def body(x, _):
                x, _aux = physics_step(x, a, wind, PHYS, dom, dt=dt, substeps=substeps)
                return x, x

            _, xs = jax.lax.scan(body, x, None, length=n_steps)
            return xs

        xs = roll(x)
        return np.concatenate([np.asarray(x)[None], np.asarray(xs)], axis=0)


def test_hover_equilibrium():
    """Neutral direct action (2/T2WR - 1 = 0) exactly cancels gravity."""
    x0 = np.zeros(13)
    x0[6] = 1.0
    action = np.full(4, PHYS.hover_action_direct)
    traj = rk4_trajectory(x0, action, 50)
    np.testing.assert_allclose(traj[-1][:6], 0.0, atol=1e-9)
    np.testing.assert_allclose(traj[-1][10:], 0.0, atol=1e-9)


def test_rk4_matches_scipy_100_steps():
    """1 second of flight with an asymmetric action: RK4 vs RK45 oracle."""
    x0 = random_state()
    action = np.array([0.05, -0.02, 0.03, 0.01])
    ref = scipy_trajectory(x0, action, 100)
    ours = rk4_trajectory(x0, action, 100, substeps=1)
    np.testing.assert_allclose(ours[-1], ref[-1], rtol=1e-5, atol=1e-6)


def test_rk4_float32_close_to_oracle():
    """float32 single-substep RK4 (the TPU production path) stays within
    reward-relevant tolerance of the float64 adaptive oracle."""
    x0 = random_state()
    action = np.array([0.02, 0.0, -0.01, 0.03])
    ref = scipy_trajectory(x0, action, 100)
    ours = rk4_trajectory(x0, action, 100, dtype=jnp.float32)
    np.testing.assert_allclose(ours[-1], ref[-1], rtol=2e-3, atol=2e-3)


def test_f2w_f2F_roundtrip():
    """Allocation consistency: f2F(a) then f2w(F, M) recovers the same motor
    speeds and (unclipped interior) thrust/moments (reference f2w:197-245,
    f2F:247-272)."""
    with jax.enable_x64():
        a = jnp.asarray([0.1, -0.2, 0.05, 0.15], jnp.float64)
        direct = f2F(a, PHYS, DOM)
        indirect = f2w(direct.thrust, direct.moment, PHYS, DOM)
        np.testing.assert_allclose(np.asarray(indirect.w), np.asarray(direct.w), rtol=1e-9)
        np.testing.assert_allclose(float(indirect.thrust), float(direct.thrust), rtol=1e-9)
        np.testing.assert_allclose(
            np.asarray(indirect.moment), np.asarray(direct.moment), rtol=1e-9, atol=1e-12
        )


def test_f2w_clipping_saturates():
    """Requesting more thrust than 4 motors can give saturates at
    T2WR*M*G per the reference clip (quadrotor_env.py:219)."""
    with jax.enable_x64():
        out = f2w(jnp.asarray(100.0, jnp.float64), jnp.zeros(3, jnp.float64), PHYS, DOM)
        np.testing.assert_allclose(
            float(out.thrust), PHYS.t2wr * PHYS.mass * PHYS.gravity, rtol=1e-9
        )
        np.testing.assert_allclose(np.asarray(out.step_effort), 1.0, atol=1e-9)


def test_allocation_matrix_invertible():
    m = allocation_matrix(PHYS)
    assert np.linalg.cond(m) < 1e12


def test_arm_drag_closed_form():
    """Closed-form sum(x_k^3) equals the reference's 10-point linspace sum."""
    d_xx = np.linspace(0, PHYS.d_arm, 10)
    assert abs(PHYS.arm_drag_sum - np.sum(d_xx**3)) < 1e-12


def test_drag_opposes_motion():
    """Drag force decelerates a falling quad; drag moment opposes spin."""
    x0 = np.zeros(13)
    x0[6] = 1.0
    x0[5] = -5.0  # falling
    x0[12] = 3.0  # yawing
    with jax.enable_x64():
        dx = np.asarray(
            drone_eq(
                jnp.asarray(x0),
                jnp.asarray(0.0),
                jnp.zeros(3),
                jnp.asarray(0.0),
                jnp.zeros(3),
                PHYS,
                DOM,
            )
        )
    assert dx[5] > -PHYS.gravity  # drag reduces downward accel
    assert dx[12] < 0  # yaw drag decelerates


def test_vmap_physics_step():
    """The step vmaps across a batch of envs with per-env actions."""
    B = 32
    xs = jnp.asarray(np.stack([random_state() for _ in range(B)]), jnp.float32)
    acts = jnp.asarray(RNG.uniform(-0.2, 0.2, (B, 4)), jnp.float32)
    wind = jnp.zeros((B, 3), jnp.float32)
    dom = jax.tree.map(lambda l: jnp.broadcast_to(l, (B,) + l.shape), zeros_domain(jnp.float32))
    step = jax.vmap(
        lambda x, a, w, d: physics_step(x, a, w, PHYS, d, dt=0.01)[0]
    )
    out = step(xs, acts, wind, dom)
    assert out.shape == (B, 13)
    assert np.all(np.isfinite(np.asarray(out)))


def test_aux_at_state_matches_physics_step_aux():
    """aux_at_state(x_new, a) must equal the aux physics_step computes at the
    integrated state x_new from the same action — the cheap (1 RHS eval)
    reconstruction sensor consumers use (landing/env.py, missions_eval.py)."""
    from autonomous_quadrotor_environment_tpu.core import aux_at_state

    x = jnp.asarray(random_state(), jnp.float32)
    a = jnp.asarray(RNG.uniform(-0.5, 0.5, 4), jnp.float32)
    wind = jnp.zeros(3, jnp.float32)
    x_new, aux = jax.jit(
        lambda x, a: physics_step(x, a, wind, PHYS, DOM, dt=0.01, compute_accel_aux=True)
    )(x, a)
    aux2 = jax.jit(lambda x, a: aux_at_state(x, a, PHYS, DOM))(x_new, a)
    np.testing.assert_allclose(aux2.accel, aux.accel, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        aux2.accelerometer_read, aux.accelerometer_read, rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(aux2.mat_rot, aux.mat_rot, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(aux2.v_q, aux.v_q, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(aux2.f_in_z, aux.f_in_z, rtol=1e-6)
