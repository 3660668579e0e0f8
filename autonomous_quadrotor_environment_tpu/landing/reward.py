"""Visual-landing reward: dense shaping + discrete terminal taxonomy.

Exact port of the reference's `visual_reward`
(reference: visual_landing/rl_reward_fuction.py:3-102) as a pure, batched
function. Constants preserved verbatim:

  shaping  = -4 * (2*error_xy + error_z)                      (:59)
  step     = shaping delta - 0.1*|control|                    (:68-72)
  terminal (checked in this order, :75-96):
    landed (z <= -4.95):
      soft (|v| < |(.3,.3,.3)|) & flat (|rp| < |(.349,.349)| and
      |w| < |(1,1)|) & on-target (exy < 0.14)  ->  +5, solved
      soft & flat                              ->  +1
      soft, not flat                           ->   0
      hard                                     ->  -1
    astray (exy > ez*5/7 + 0.2 or ez > 7)      ->  -5
    timeout (step > total)                     ->  -2   (overrides landed)
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

ERROR_P = 4.0
CONTROL_P = 0.1
SOFT_VEL = math.sqrt(3.0) * 0.30       # |(.3,.3,.3)|
FLAT_ANG = math.sqrt(2.0) * 0.3491     # |(.3491,.3491)|
FLAT_RATE = math.sqrt(2.0) * 1.0
ON_TARGET_XY = 0.14
LANDED_Z = -4.95
ASTRAY_Z = 7.0
TIMEOUT_REWARD = -2.0
MARKER_Z_SHIFT = 5.0                   # world -> env frame (reference :50)


class VisualRewardOut(NamedTuple):
    reward: jnp.ndarray
    shaping: jnp.ndarray
    done: jnp.ndarray
    solved: jnp.ndarray


def visual_reward(
    total_steps: int,
    marker_position: jnp.ndarray,  # (3,) WORLD frame (z ~ 0.001)
    quad_position: jnp.ndarray,    # (3,) env frame
    quad_vel: jnp.ndarray,         # (3,)
    control: jnp.ndarray,          # (3,) the CNN's raw action
    last_shaping: jnp.ndarray,     # ()
    has_shaping: jnp.ndarray,      # () bool — reference's `if last_shaping:`
    step: jnp.ndarray,             # () int internal physics frame
    ang: jnp.ndarray,              # (3,) Euler angles
    v_ang: jnp.ndarray,            # (3,) body rates
) -> VisualRewardOut:
    dtype = quad_position.dtype
    marker_env = marker_position - jnp.asarray([0.0, 0.0, MARKER_Z_SHIFT], dtype)

    error_xy = jnp.linalg.norm(marker_env[0:2] - quad_position[0:2])
    error_z = jnp.abs(marker_env[2] - quad_position[2])
    vel = jnp.linalg.norm(quad_vel)
    control_effort = jnp.linalg.norm(control)

    shaping = -ERROR_P * (error_xy * 2.0 + error_z)

    soft = vel < SOFT_VEL
    landed = quad_position[2] <= LANDED_Z
    on_target = error_xy < ON_TARGET_XY
    flat = jnp.logical_and(
        jnp.linalg.norm(ang[0:2]) < FLAT_ANG, jnp.linalg.norm(v_ang) < FLAT_RATE
    )
    astray = jnp.logical_or(error_xy > error_z / 7.0 * 5.0 + 0.2, error_z > ASTRAY_Z)
    timeout = step > total_steps

    base = jnp.where(has_shaping, shaping - last_shaping, jnp.zeros((), dtype))
    reward = base - CONTROL_P * control_effort

    landed_reward = jnp.where(
        soft,
        jnp.where(
            flat,
            jnp.where(on_target, jnp.asarray(5.0, dtype), jnp.asarray(1.0, dtype)),
            jnp.asarray(0.0, dtype),
        ),
        jnp.asarray(-1.0, dtype),
    )
    solved = jnp.logical_and(jnp.logical_and(landed, soft), jnp.logical_and(flat, on_target))

    reward = jnp.where(landed, landed_reward, jnp.where(astray, jnp.asarray(-5.0, dtype), reward))
    # reference :93-95: the timeout branch runs last and overrides
    reward = jnp.where(timeout, jnp.asarray(TIMEOUT_REWARD, dtype), reward)

    done = jnp.logical_or(jnp.logical_or(landed, astray), timeout)
    return VisualRewardOut(reward=reward, shaping=shaping, done=done, solved=solved)
