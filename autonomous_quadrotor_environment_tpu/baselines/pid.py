"""Cascaded PID controllers (position and velocity regulation).

Capability match for the reference's two PID scripts
(reference: environment/controller/PID_control.py:24-106 — position
tracking with true-derivative PID — and pid_vel_control.py:18-127 —
velocity regulation with derivative-on-measurement). Re-designed as pure
functions over explicit state pytrees so a whole batch of controlled
quadrotors runs under `vmap`/`scan` on-device next to the env.

Structure (reference PID_control.py:46-93):
  lower loop: position/velocity errors -> desired (thrust U1, roll, pitch)
  upper loop: attitude errors -> body moments via the inverse Euler-rate
              inertia matrix
Action = [U1, Mx, My, Mz] consumed by the env in indirect-control mode.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from flax import struct

from ..config import PhysicsConfig


class PIDGains(NamedTuple):
    """Per-axis gains (reference PID_control.py:24-27 /
    pid_vel_control.py:18-27)."""

    pos: tuple = (6.0, 0.0, 3.0)      # x & y (P, I, D)
    pos_z: tuple = (6.0, 0.0, 3.0)
    ang: tuple = (22.0, 0.0, 12.0)    # roll & pitch
    ang_psi: tuple = (1.0, 0.0, 0.1)
    deriv_on_measurement: bool = False


POSITION_GAINS = PIDGains()
VELOCITY_GAINS = PIDGains(
    pos=(1.0, -0.0, 0.0),
    pos_z=(0.4, -0.0, 0.0),
    ang=(20.0, 0.0, 20.0),
    ang_psi=(5.0, 0.0, 5.0),
    deriv_on_measurement=True,
)
VELOCITY_GAINS_UNCLIPPED = PIDGains(
    pos=(2.0, -0.0, 0.0),
    pos_z=(1.0, -0.0, 0.0),
    ang=(180.0, 0.0, 50.0),
    ang_psi=(40.0, 0.0, 20.0),
    deriv_on_measurement=True,
)


@struct.dataclass
class PIDState:
    """One scalar PID loop's carry (reference `pid` class
    PID_control.py:205-216): integral accumulator + previous measurement
    for derivative-on-measurement mode (pid_vel_control.py:113-127)."""

    ix: jnp.ndarray     # () integral of error
    x_old: jnp.ndarray  # () previous measurement


def pid_init(dtype=jnp.float32) -> PIDState:
    return PIDState(ix=jnp.zeros((), dtype), x_old=jnp.zeros((), dtype))


def pid_step(
    s: PIDState,
    x: jnp.ndarray,
    dx: jnp.ndarray,
    x_d: jnp.ndarray,
    dx_d: jnp.ndarray,
    gains: tuple,
    dt: float,
    deriv_on_measurement: bool = False,
) -> tuple[PIDState, jnp.ndarray]:
    """u = P(x_d - x) + D(dx_d - dx) - I*integral (reference sign convention,
    PID_control.py:213-215). In derivative-on-measurement mode `dx` is
    recomputed as (x - x_old)/dt (pid_vel_control.py:121-122)."""
    p, i, d = gains
    if deriv_on_measurement:
        dx = (x - s.x_old) / dt
    ix = s.ix + (x_d - x) * dt
    u = p * (x_d - x) + d * (dx_d - dx) - i * ix
    return PIDState(ix=ix, x_old=x), u


@struct.dataclass
class CascadedPIDState:
    """All six loops + previous desired attitude (for its finite-difference
    rate, reference PID_control.py:100-104)."""

    x: PIDState
    y: PIDState
    z: PIDState
    phi: PIDState
    theta: PIDState
    psi: PIDState
    ang_d_ant: jnp.ndarray  # (3,)


def cascaded_pid_init(dtype=jnp.float32) -> CascadedPIDState:
    return CascadedPIDState(
        x=pid_init(dtype),
        y=pid_init(dtype),
        z=pid_init(dtype),
        phi=pid_init(dtype),
        theta=pid_init(dtype),
        psi=pid_init(dtype),
        ang_d_ant=jnp.zeros(3, dtype),
    )


def _euler_rate_inertia(ang: jnp.ndarray, phys: PhysicsConfig) -> jnp.ndarray:
    """The M matrix mapping moments to Euler-rate accelerations
    (reference PID_control.py:72-90)."""
    phi, theta = ang[0], ang[1]
    sp, cp = jnp.sin(phi), jnp.cos(phi)
    ct, tt = jnp.cos(theta), jnp.tan(theta)
    z = jnp.zeros_like(phi)
    return jnp.stack(
        [
            jnp.stack([1.0 / phys.j_xx + z, tt * sp / phys.j_yy, tt * cp / phys.j_zz]),
            jnp.stack([z, cp / phys.j_yy, -sp / phys.j_zz]),
            jnp.stack([z, sp / ct / phys.j_yy, cp / ct / phys.j_zz]),
        ]
    )


def cascaded_pid_control(
    s: CascadedPIDState,
    pos: jnp.ndarray,      # (3,) current position (or velocity in vel mode)
    vel: jnp.ndarray,      # (3,) its derivative (ignored in deriv-on-meas.)
    ang: jnp.ndarray,      # (3,) Euler angles
    ang_vel: jnp.ndarray,  # (3,) Euler rates
    xd: jnp.ndarray,       # (3,) position (or velocity) target
    dxd: jnp.ndarray,      # (3,) target derivative
    psi_d: jnp.ndarray,    # ()  desired yaw
    gains: PIDGains,
    phys: PhysicsConfig,
    dt: float,
) -> tuple[CascadedPIDState, jnp.ndarray]:
    """One control step -> action [U1, Mx, My, Mz]
    (reference PID_control.py:95-106 / pid_vel_control.py:99-110).

    The position variant uses atan (reference :57-59); the velocity variant
    uses atan2 with the cos inside the numerator (:60-62) — both preserved
    via `gains.deriv_on_measurement` selecting the variant, since they come
    as a pair in the reference scripts.
    """
    dom = gains.deriv_on_measurement
    sx, u1 = pid_step(s.x, pos[0], vel[0], xd[0], dxd[0], gains.pos, dt, dom)
    sy, u2 = pid_step(s.y, pos[1], vel[1], xd[1], dxd[1], gains.pos, dt, dom)
    sz, u3 = pid_step(s.z, pos[2], vel[2], xd[2], dxd[2], gains.pos_z, dt, dom)

    g = phys.gravity
    if dom:
        theta_d = jnp.arctan2(u1, u3 + g)
        phi_d = jnp.arctan2(-u2 * jnp.cos(theta_d), u3 + g)
    else:
        theta_d = jnp.arctan(u1 / (u3 + g))
        phi_d = jnp.arctan(-u2 / (u3 + g) * jnp.cos(theta_d))
    big_u1 = phys.mass * (u3 + g) / (jnp.cos(theta_d) * jnp.cos(phi_d))

    ang_d = jnp.stack([phi_d, theta_d, psi_d])
    v_ang_d = (ang_d - s.ang_d_ant) / dt

    # In the velocity variant the reference's `pid` class recomputes the
    # derivative from the measurement in EVERY loop, attitude included
    # (pid_vel_control.py:121-122 overrides the passed dx); the position
    # variant's pid class uses the passed rate (PID_control.py:213-215).
    sphi, u5 = pid_step(s.phi, ang[0], ang_vel[0], ang_d[0], v_ang_d[0], gains.ang, dt, dom)
    sth, u6 = pid_step(s.theta, ang[1], ang_vel[1], ang_d[1], v_ang_d[1], gains.ang, dt, dom)
    sps, u7 = pid_step(s.psi, ang[2], ang_vel[2], ang_d[2], v_ang_d[2], gains.ang_psi, dt, dom)

    m = _euler_rate_inertia(ang, phys)
    moments = jnp.linalg.solve(m, jnp.stack([u5, u6, u7]))

    new_state = CascadedPIDState(
        x=sx, y=sy, z=sz, phi=sphi, theta=sth, psi=sps, ang_d_ant=ang_d
    )
    action = jnp.concatenate([big_u1[None], moments])
    return new_state, action
