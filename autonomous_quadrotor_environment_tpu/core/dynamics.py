"""Quaternion rigid-body quadrotor dynamics, pure and batched.

TPU-first re-design of the reference's `quad.drone_eq` / `f2w` / `f2F`
(reference: environment/quadrotor_env.py:197-406). Differences in *how*,
not *what*:

  * The ODE right-hand side is a pure function of ``(x, controls, params)``;
    no object state, so it `vmap`s over thousands of quadrotors and `scan`s
    over time inside one compiled program.
  * ``scipy.integrate.solve_ivp`` (adaptive RK45, reference :483) is replaced
    by fixed-step RK4 with a configurable substep count — static shapes and
    loop bounds, which XLA requires; accuracy validated against the scipy
    trajectories in tests/test_dynamics.py.
  * The motor-allocation solve (reference :209-216) uses a precomputed
    analytic inverse — the 4x4 matrix is constant.
  * The 10-segment arm-drag discretization (reference :331-338) collapses to
    its closed form: the sum only depends on ``sum(x_k^3)``.

State layout (13,) — identical to the reference (quadrotor_env.py:399-400):
    [x, vx, y, vy, z, vz, q0, q1, q2, q3, wx, wy, wz]
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..config import PhysicsConfig
from .quaternion import deriv_quat, quat_normalize, quat_rot_mat
from .randomization import DomainParams


class MotorOutput(NamedTuple):
    """Resolved per-step motor quantities."""

    w: jnp.ndarray            # (4,) propeller angular velocities [rad/s]
    thrust: jnp.ndarray       # ()   total body-z thrust [N]
    moment: jnp.ndarray       # (3,) body moments [N*m]
    step_effort: jnp.ndarray  # (4,) normalized [-1,1] per-motor effort
    clipped_action: jnp.ndarray  # (4,) action after saturation


def allocation_matrix(phys: PhysicsConfig) -> np.ndarray:
    """Motor allocation matrix mapping u = w^2 to [F, Mx, My, Mz]
    (reference quadrotor_env.py:209-212)."""
    kf, km, d = phys.k_f, phys.k_m, phys.d_arm
    return np.array(
        [
            [kf, kf, kf, kf],
            [-d * kf, 0.0, d * kf, 0.0],
            [0.0, d * kf, 0.0, -d * kf],
            [-km, km, -km, km],
        ]
    )


def f2w(
    f: jnp.ndarray,
    m: jnp.ndarray,
    phys: PhysicsConfig,
    dom: DomainParams,
    clipped: bool = True,
    randomize: bool = False,
) -> MotorOutput:
    """Indirect control: body thrust+moments -> motor speeds, with saturation.

    Mirrors reference quadrotor_env.py:197-245. ``u = w^2`` solves the
    constant 4x4 allocation system (precomputed inverse instead of
    ``np.linalg.solve`` per step).
    """
    x_mat = jnp.asarray(allocation_matrix(phys), f.dtype)
    x_inv = jnp.asarray(np.linalg.inv(allocation_matrix(phys)), f.dtype)
    y = jnp.concatenate([jnp.reshape(f, (1,)), jnp.reshape(m, (3,))])
    u = x_inv @ y
    u_max = phys.max_motor_thrust / phys.k_f
    if clipped:
        u = jnp.clip(u, 0.0, u_max)
        w = jnp.sqrt(u)
    else:
        w = jnp.sign(u) * jnp.sqrt(jnp.abs(u))
    if randomize:
        u = u - u * dom.kf_degrade
    fm_new = x_mat @ u
    step_effort = u * phys.k_f / phys.max_motor_thrust * 2.0 - 1.0
    return MotorOutput(
        w=w,
        thrust=fm_new[0],
        moment=fm_new[1:4],
        step_effort=step_effort,
        clipped_action=fm_new,
    )


def f2F(
    action: jnp.ndarray,
    phys: PhysicsConfig,
    dom: DomainParams,
    randomize: bool = False,
) -> MotorOutput:
    """Direct control: normalized per-motor action [-1,1] -> thrust/moments.

    Mirrors reference quadrotor_env.py:247-272: per-motor thrust
    ``f_i = (a_i+1) * T2WR*M*G/8`` (max = T2WR*M*G/4 per motor).
    """
    a = jnp.clip(action, -1.0, 1.0)
    f = (a + 1.0) * phys.t2wr * phys.mass * phys.gravity / 8.0
    w = jnp.sqrt(f / phys.k_f)
    if randomize:
        f = f - dom.kf_degrade * f
    thrust = jnp.sum(f)
    moment = jnp.stack(
        [
            (f[2] - f[0]) * phys.d_arm,
            (f[1] - f[3]) * phys.d_arm,
            (-f[0] + f[1] - f[2] + f[3]) * phys.k_m / phys.k_f,
        ]
    )
    return MotorOutput(w=w, thrust=thrust, moment=moment, step_effort=a, clipped_action=a)


def rotor_gyro_speed(
    w: jnp.ndarray, phys: PhysicsConfig, dom: DomainParams, randomize: bool = False
) -> jnp.ndarray:
    """Net rotor angular momentum rate Omega_r (reference quadrotor_env.py:341-345)."""
    signs = jnp.asarray([-1.0, 1.0, -1.0, 1.0], w.dtype)
    if randomize:
        ir = phys.i_r * (1.0 + dom.ir_factor)
        return jnp.sum(signs * w * ir)
    return jnp.sum(signs * w) * phys.i_r


def drone_eq(
    x: jnp.ndarray,
    thrust: jnp.ndarray,
    moment: jnp.ndarray,
    omega_r: jnp.ndarray,
    wind: jnp.ndarray,
    phys: PhysicsConfig,
    dom: DomainParams,
    randomize: bool = False,
) -> jnp.ndarray:
    """Rigid-body ODE right-hand side (reference quadrotor_env.py:274-406).

    ``thrust``/``moment``/``omega_r`` are resolved motor outputs (constant
    over one env step — the reference recomputes them every RK45 f-eval from
    the same action, yielding identical values). ``wind`` is the inertial
    wind velocity for this step (constant per step in the reference too,
    since ``self.i`` does not change during solve_ivp).
    """
    dtype = x.dtype
    vel = x[1:6:2]
    q = quat_normalize(x[6:10])
    omega = x[10:13]

    rot = quat_rot_mat(q)  # body -> inertial

    # Aerodynamic drag on the body frame (reference :314-323).
    v_body = rot.T @ (vel + wind)
    area = jnp.asarray(phys.area, dtype)
    f_drag = -0.5 * phys.rho * phys.c_d * area * jnp.abs(v_body) * v_body

    # Arm rotational drag, closed form of the 10-segment sum (reference
    # :327-338): m_axis = -rho*C_D*t*(D/10) * w|w| * sum(x_k^3); z doubled.
    coef = phys.rho * phys.c_d * phys.beam_thickness * (phys.d_arm / 10.0) * phys.arm_drag_sum
    m_drag = -coef * jnp.abs(omega) * omega * jnp.asarray([1.0, 1.0, 2.0], dtype)

    # Gyroscopic moment from rotor momentum (reference :347-349).
    m_gyro = jnp.stack([-omega[0] * omega_r, omega[1] * omega_r, jnp.zeros((), dtype)])

    # Translational dynamics (reference :352-368).
    f_body = jnp.stack([jnp.zeros((), dtype), jnp.zeros((), dtype), thrust]) + f_drag
    f_inertial = rot @ f_body
    quad_m = phys.mass * (1.0 + dom.mass_factor) if randomize else phys.mass
    accel = f_inertial / quad_m - jnp.asarray([0.0, 0.0, phys.gravity], dtype)

    # Rotational dynamics (reference :373-388). The Coriolis term uses the
    # *unperturbed* J (reference :378) while the inverse uses the randomized
    # one (reference :381-384) — replicated deliberately.
    j_diag = jnp.asarray([phys.j_xx, phys.j_yy, phys.j_zz], dtype)
    m_in = moment + m_gyro + m_drag - jnp.cross(omega, j_diag * omega)
    inv_j = 1.0 / (j_diag * (1.0 + dom.j_factor)) if randomize else 1.0 / j_diag
    accel_ang = inv_j * m_in

    dq = deriv_quat(omega, q)

    return jnp.concatenate(
        [
            jnp.stack([vel[0], accel[0], vel[1], accel[1], vel[2], accel[2]]),
            dq,
            accel_ang,
        ]
    )


def rk4(deriv, x: jnp.ndarray, dt: float, substeps: int = 1) -> jnp.ndarray:
    """Classic fixed-step RK4 over ``substeps`` equal sub-intervals.

    Replaces the reference's adaptive ``solve_ivp`` (quadrotor_env.py:483);
    static step count keeps the whole env step a single fused XLA program.
    The substep loop is a Python loop — it unrolls at trace time (substeps
    is small and static).
    """
    h = dt / substeps
    for _ in range(substeps):
        k1 = deriv(x)
        k2 = deriv(x + 0.5 * h * k1)
        k3 = deriv(x + 0.5 * h * k2)
        k4 = deriv(x + h * k3)
        x = x + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
    return x


class StepAux(NamedTuple):
    """Per-step diagnostics mirroring the reference's instance attributes
    (`self.accel`, `self.accelerometer_read`, `self.mat_rot`, `self.V_q`,
    `self.f_in`, `self.w`, quadrotor_env.py:352-396), evaluated at the
    post-step state."""

    accel: jnp.ndarray              # (3,) inertial acceleration
    accelerometer_read: jnp.ndarray  # (3,) body-frame accelerometer model
    mat_rot: jnp.ndarray            # (3,3) body->inertial rotation
    v_q: jnp.ndarray                # (4,) quaternion derivative
    f_in_z: jnp.ndarray             # ()   commanded body-z thrust
    motor: MotorOutput


def aux_at_state(
    x: jnp.ndarray,
    action: jnp.ndarray,
    phys: PhysicsConfig,
    dom: DomainParams,
    *,
    wind: jnp.ndarray | None = None,
    direct_control: bool = True,
    clipped: bool = True,
    randomize: bool = False,
) -> StepAux:
    """Diagnostics at the CURRENT state under ``action`` — no integration.

    The reference's sensors read instance attributes (`self.accel`,
    `self.mat_rot`, `self.accelerometer_read`, quadrotor_env.py:352-396)
    that were computed at the END of the previous step, i.e. AT the state
    the caller currently holds, from the action that produced it. This
    helper reproduces exactly that with ONE RHS evaluation instead of a
    full re-integration (which would also be one dt ahead) — use it
    wherever sensor models need the post-step diagnostics of an already
    stepped state (landing/env.py, apps/missions_eval.py).
    """
    dtype = x.dtype
    action = jnp.asarray(action, dtype)
    if wind is None:
        wind = jnp.zeros(3, dtype)
    if direct_control:
        motor = f2F(action, phys, dom, randomize)
    else:
        motor = f2w(action[0], action[1:4], phys, dom, clipped, randomize)
    omega_r = rotor_gyro_speed(motor.w, phys, dom, randomize)
    dx = drone_eq(x, motor.thrust, motor.moment, omega_r, wind, phys, dom, randomize)
    accel = dx[1:6:2]
    q = quat_normalize(x[6:10])
    rot = quat_rot_mat(q)
    # Reference quadrotor_env.py:371 double-gravity quirk, replicated as-is
    # (see physics_step below / envs/sensors.py).
    grav = jnp.asarray([0.0, 0.0, -phys.gravity], dtype)
    accelerometer_read = rot.T @ (accel + grav)
    v_q = deriv_quat(x[10:13], q)
    return StepAux(
        accel=accel,
        accelerometer_read=accelerometer_read,
        mat_rot=rot,
        v_q=v_q,
        f_in_z=motor.thrust,
        motor=motor,
    )


def physics_step(
    x: jnp.ndarray,
    action: jnp.ndarray,
    wind: jnp.ndarray,
    phys: PhysicsConfig,
    dom: DomainParams,
    *,
    dt: float,
    substeps: int = 1,
    direct_control: bool = True,
    clipped: bool = True,
    randomize: bool = False,
    compute_accel_aux: bool = True,
) -> tuple[jnp.ndarray, StepAux]:
    """One environment physics step: resolve motors, integrate, renormalize.

    Mirrors reference quadrotor_env.py:458-498 (without reward/done — those
    live in envs/). Returns the new 13-state and post-step diagnostics.

    ``compute_accel_aux=False`` skips the extra post-step RHS evaluation
    that only the sensor models consume (accel / accelerometer_read come
    back as zeros) — a ~20% FLOP cut on the pure-control hot path, where
    the env step needs only v_q and the motor outputs.
    """
    dtype = x.dtype
    action = jnp.asarray(action, dtype)
    if direct_control:
        motor = f2F(action, phys, dom, randomize)
    else:
        motor = f2w(action[0], action[1:4], phys, dom, clipped, randomize)
    omega_r = rotor_gyro_speed(motor.w, phys, dom, randomize)

    def deriv(s):
        return drone_eq(s, motor.thrust, motor.moment, omega_r, wind, phys, dom, randomize)

    x_new = rk4(deriv, x, dt, substeps)
    # Renormalize the quaternion (the reference normalizes on read, :488-489).
    x_new = x_new.at[6:10].set(quat_normalize(x_new[6:10]))

    rot = quat_rot_mat(x_new[6:10])
    if compute_accel_aux:
        # Post-step diagnostics at the new state.
        dx = deriv(x_new)
        accel = dx[1:6:2]
        # Reference quadrotor_env.py:371 (formula replicated as-is, including
        # its double-gravity quirk: accel already contains -G, and -G is
        # added again before rotating into the body frame — the sensor
        # pipeline downstream compensates, see envs/sensors.py).
        grav = jnp.asarray([0.0, 0.0, -phys.gravity], dtype)
        accelerometer_read = rot.T @ (accel + grav)
    else:
        accel = jnp.zeros(3, dtype)
        accelerometer_read = jnp.zeros(3, dtype)
    v_q = deriv_quat(x_new[10:13], quat_normalize(x_new[6:10]))

    aux = StepAux(
        accel=accel,
        accelerometer_read=accelerometer_read,
        mat_rot=rot,
        v_q=v_q,
        f_in_z=motor.thrust,
        motor=motor,
    )
    return x_new, aux
