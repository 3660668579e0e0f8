"""Outer velocity-error PID for mission tracking with the RL controller.

Capability match for the reference's vel_pid
(reference: environment/controller/velocity_pid.py:3-35): converts the
position error against a mission trajectory into a velocity-error
pseudo-state that is added to the RL controller's input offset.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

P_GAINS = (3.0, 3.0, 3.0)
I_GAINS = (0.0, 0.0, 0.0)
D_GAINS = (0.05, 0.05, 0.05)


@struct.dataclass
class VelPIDState:
    cumm_error: jnp.ndarray   # (3,)
    prev_pos_d: jnp.ndarray   # (3,) previous target position
    prev_pos: jnp.ndarray     # (3,) previous measured position


def vel_pid_init(dtype=jnp.float32) -> VelPIDState:
    z = jnp.zeros(3, dtype)
    return VelPIDState(cumm_error=z, prev_pos_d=z, prev_pos=z)


def vel_pid(
    s: VelPIDState,
    state: jnp.ndarray,    # (13+,) env state, position at [0:5:2]
    target: jnp.ndarray,   # (14,) mission target, position at [0:5:2]
    dt: float = 0.01,
) -> tuple[VelPIDState, jnp.ndarray]:
    """Returns (new_state, 14-dim state_error with velocity slots filled)
    (reference velocity_pid.py:16-35)."""
    position_d = target[0:5:2]
    position = state[0:5:2]
    err = position_d - position
    cumm = s.cumm_error + err * dt
    derivative = (err - (s.prev_pos_d - s.prev_pos)) / dt
    p = jnp.asarray(P_GAINS, err.dtype) * err
    i = jnp.asarray(I_GAINS, err.dtype) * cumm
    d = jnp.asarray(D_GAINS, err.dtype) * derivative
    err_vel = p + i + d
    z = jnp.zeros((), err.dtype)
    state_error = jnp.stack(
        [z, err_vel[0], z, err_vel[1], z, err_vel[2]]
    )
    state_error = jnp.concatenate([state_error, jnp.zeros(8, err.dtype)])
    return (
        VelPIDState(cumm_error=cumm, prev_pos_d=position_d, prev_pos=position),
        state_error,
    )
