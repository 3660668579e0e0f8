"""Double-loop LQR baseline: translation outer loop + attitude inner loop.

Capability match for the reference's lqr_quad.py
(reference: environment/controller/lqr_quad.py:26-167): two continuous-time
algebraic Riccati solves on double-integrator models produce constant gains
K_t (translation: velocity regulation) and K_att (attitude). The CARE is
solved once on the host with scipy (tiny 6x6 — SURVEY.md §2 native table);
the per-step control law is pure JAX, batched and scannable.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np
from scipy.linalg import solve_continuous_are

from ..config import PhysicsConfig


class LQRGains(NamedTuple):
    k_t: jnp.ndarray    # (3, 6) translation gains
    k_att: jnp.ndarray  # (4, 6) attitude gains


def _double_integrator_abq(b_diag: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """A (6x6) and B for three decoupled double integrators
    (reference lqr_quad.py:67-80, 92-105)."""
    a = np.zeros((6, 6))
    a[0, 1] = a[2, 3] = a[4, 5] = 1.0
    return a, b_diag


def make_lqr_gains(phys: PhysicsConfig | None = None, clipped: bool = True) -> LQRGains:
    """Solve the two CAREs with the reference's Q/R weights
    (reference lqr_quad.py:26-62) and return K = -R^-1 B^T P."""
    phys = phys or PhysicsConfig()

    if clipped:
        q_att = np.diag([5.0, 1.0, 5.0, 1.0, 0.05, 0.01]) * 50.0
        r_att = np.eye(4) * 40.0
        q_t = np.diag([1e-08, 1.0, 1e-08, 1.0, 1e-08, 0.8]) * 10.0
        r_t = np.eye(3) * 10.0
    else:
        q_att = np.diag([5.0, 0.3, 5.0, 0.3, 2.0, 0.3]) * 160.0
        r_att = np.eye(4) * 40.0
        q_t = np.diag([1e-08, 1.0, 1e-08, 1.0, 1e-08, 0.5]) * 60.0
        r_t = np.eye(3) * 5.0

    b_att = np.zeros((6, 4))
    b_att[1, 1] = 1.0 / phys.j_xx
    b_att[3, 2] = 1.0 / phys.j_yy
    b_att[5, 3] = 1.0 / phys.j_zz
    a_att, b_att = _double_integrator_abq(b_att)
    p_att = solve_continuous_are(a_att, b_att, q_att, r_att)
    k_att = -np.linalg.inv(r_att) @ b_att.T @ p_att

    b_t = np.zeros((6, 3))
    b_t[1, 0] = b_t[3, 1] = b_t[5, 2] = 1.0 / phys.mass
    a_t, b_t = _double_integrator_abq(b_t)
    p_t = solve_continuous_are(a_t, b_t, q_t, r_t)
    k_t = -np.linalg.inv(r_t) @ b_t.T @ p_t

    return LQRGains(k_t=jnp.asarray(k_t, jnp.float32), k_att=jnp.asarray(k_att, jnp.float32))


def lqr_control(
    gains: LQRGains,
    vel: jnp.ndarray,        # (3,) inertial velocity
    ang: jnp.ndarray,        # (3,) Euler angles
    ang_vel: jnp.ndarray,    # (3,) Euler rates
    euler_t_ant: jnp.ndarray,  # (3,) previous desired attitude
    phys: PhysicsConfig,
    dt: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One LQR step -> (action [U1, Mx, My, Mz], new euler_t_ant).

    Mirrors the reference control loop (lqr_quad.py:131-160): the outer loop
    regulates velocity to zero (position entries zeroed, :133), converts the
    virtual force to a desired roll/pitch + collective thrust, and the inner
    loop tracks that attitude. The first action row is overwritten by U1
    (:158) — the attitude solve's thrust channel is discarded, replicated.
    """
    state_t = jnp.stack(
        [jnp.zeros((), vel.dtype), vel[0], jnp.zeros((), vel.dtype), vel[1],
         jnp.zeros((), vel.dtype), vel[2]]
    )
    f = gains.k_t @ state_t

    g = phys.gravity
    theta_t = jnp.arctan2(f[0], f[2] + g)
    phi_t = jnp.arctan2(-f[1] * jnp.cos(theta_t), f[2] + g)
    euler_t = jnp.stack([phi_t, theta_t, jnp.zeros((), vel.dtype)])
    u1 = phys.mass * (f[2] + g) / (jnp.cos(theta_t) * jnp.cos(phi_t))

    euler_err = ang - euler_t
    state_att = jnp.stack(
        [euler_err[0], ang_vel[0], euler_err[1], ang_vel[1], euler_err[2], ang_vel[2]]
    )
    action = gains.k_att @ state_att
    action = action.at[0].set(u1)
    return action, euler_t
