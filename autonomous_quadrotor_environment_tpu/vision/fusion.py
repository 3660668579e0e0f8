"""Complementary-filter fusion of vision pose into the INS dead-reckoning.

Capability match for the reference's fusion block
(reference: computer_vision/quadrotor_cv.py:90-99): every vision fix blends

    position_t0   <- 0.8 * position_t0   + 0.2 * vision_position
    quaternion_t0 <- 0.8 * quaternion_t0 + 0.2 * vision_quaternion
    velocity_t0   <- 0.9 * velocity_t0   + 0.1 * vision_velocity
                     (only when the vision-velocity variance over the last
                      window is < 0.1 and >50 samples accumulated)

The reference's deque(maxlen=100) variance gate becomes a fixed ring buffer
carried in a pytree (static shapes under jit).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..envs.sensors import SensorState

WINDOW = 100
MIN_SAMPLES = 50
POS_ALPHA = 0.8
QUAT_ALPHA = 0.8
VEL_ALPHA = 0.9
VAR_GATE = 0.1


@struct.dataclass
class VisionFusionState:
    prev_pos: jnp.ndarray    # (3,) last vision position fix
    prev_valid: jnp.ndarray  # ()  bool
    prev_step: jnp.ndarray   # ()  int32 env step of the last fix
    vel_ring: jnp.ndarray    # (WINDOW, 3) vision-velocity history
    count: jnp.ndarray       # ()  int32 fixes accumulated


def vision_fusion_init(dtype=jnp.float32) -> VisionFusionState:
    return VisionFusionState(
        prev_pos=jnp.zeros(3, dtype),
        prev_valid=jnp.zeros((), bool),
        prev_step=jnp.zeros((), jnp.int32),
        vel_ring=jnp.zeros((WINDOW, 3), dtype),
        count=jnp.zeros((), jnp.int32),
    )


def vision_fuse(
    fstate: VisionFusionState,
    sens: SensorState,
    vision_pos: jnp.ndarray,   # (3,) env-frame position from PnP
    vision_quat: jnp.ndarray,  # (4,) attitude from PnP
    ok: jnp.ndarray,           # ()  detection success flag
    step_i: jnp.ndarray,       # ()  int32 current env step
    dt: float,
) -> tuple[VisionFusionState, SensorState]:
    """One fusion update; a no-op (identity state) when ``ok`` is False."""
    dtype = vision_pos.dtype
    dstep = jnp.maximum(step_i - fstate.prev_step, 1).astype(dtype)
    vel = (vision_pos - fstate.prev_pos) / (dt * dstep)
    have_vel = jnp.logical_and(ok, fstate.prev_valid)

    slot = jnp.mod(fstate.count, WINDOW)
    ring = jnp.where(
        have_vel, fstate.vel_ring.at[slot].set(vel), fstate.vel_ring
    )
    count = jnp.where(have_vel, fstate.count + 1, fstate.count)

    n_valid = jnp.minimum(count, WINDOW).astype(dtype)
    denom = jnp.maximum(n_valid, 1.0)
    mask = (jnp.arange(WINDOW) < jnp.minimum(count, WINDOW))[:, None]
    mean = jnp.sum(ring * mask, axis=0) / denom
    var = jnp.sum(((ring - mean) ** 2) * mask, axis=0) / denom
    gate = jnp.logical_and(
        have_vel, jnp.logical_and(jnp.mean(var) < VAR_GATE, count > MIN_SAMPLES)
    )

    pos = jnp.where(ok, sens.pos_ins * POS_ALPHA + vision_pos * (1 - POS_ALPHA), sens.pos_ins)
    quat = jnp.where(
        ok, sens.quat_ins * QUAT_ALPHA + vision_quat * (1 - QUAT_ALPHA), sens.quat_ins
    )
    vel_ins = jnp.where(gate, sens.vel_ins * VEL_ALPHA + vel * (1 - VEL_ALPHA), sens.vel_ins)

    new_f = VisionFusionState(
        prev_pos=jnp.where(ok, vision_pos, fstate.prev_pos),
        prev_valid=jnp.logical_or(ok, fstate.prev_valid),
        prev_step=jnp.where(ok, step_i, fstate.prev_step),
        vel_ring=ring,
        count=count,
    )
    return new_f, sens.replace(pos_ins=pos, quat_ins=quat, vel_ins=vel_ins)
