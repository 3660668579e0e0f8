"""Shaped hover/position reward with cascading steady-state bonuses.

Pure-function re-design of the reference's `reward_function`
(reference: environment/quadrotor_env.py:511-573 for the primary training
variant; environment/quadrotor_env_opt.py:423-480 for the visual-landing
variant). One parameterized function covers both — the constants live in
``RewardConfig`` (see config.py), which tests pin against the reference's
values.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

from ..config import BB_ANG, BB_VEL, RewardConfig


class RewardOut(NamedTuple):
    reward: jnp.ndarray
    shaping: jnp.ndarray   # new prev_shaping carry
    solved: jnp.ndarray    # bool
    done: jnp.ndarray      # updated done flag


def hover_reward(
    cfg: RewardConfig,
    *,
    vel: jnp.ndarray,          # (3,) inertial velocity
    ang: jnp.ndarray,          # (3,) Euler angles [phi, theta, psi]
    ang_vel: jnp.ndarray,      # (3,) body rates
    action: jnp.ndarray,       # (4,) the step's action (clipped in direct mode)
    zero_control: jnp.ndarray,  # (4,) neutral action
    prev_shaping: jnp.ndarray,  # ()  previous shaping value
    has_prev: jnp.ndarray,     # ()  bool: prev_shaping is valid
    step_i: jnp.ndarray,       # ()  int step counter (post-increment)
    max_steps: int,
    bb_done: jnp.ndarray,      # ()  bool: bounding box breached
    training: bool,
) -> RewardOut:
    """Compute (reward, shaping, solved, done) for one step.

    Semantics preserved exactly from the reference:
      * potential-based shaping difference, zero on the first step
      * cascading bonuses at the first (smallest) satisfied threshold, with a
        nested attitude gate
      * absolute control penalty ``-p_c * |a - a0|^2`` always applied
      * terminal taxonomy: solved bonus (primary adds, opt replaces),
        timeout keeps the shaped reward, bounding-box breach penalizes
    """
    dtype = vel.dtype
    psi = ang[2]

    coefs = cfg.shaping_coefs
    shaping = -(
        coefs[0] * jnp.linalg.norm(vel / BB_VEL)
        + coefs[1] * jnp.abs(psi / 4.0)
        + coefs[2] * jnp.linalg.norm(ang[0:2] / BB_ANG)
    )

    # Cascading steady-state bonuses (reference quadrotor_env.py:534-542):
    # break at the first satisfied (smallest) threshold.
    r_norm = jnp.sqrt(jnp.sum(vel**2) + psi**2)
    ang_gate_vec = ang if cfg.cascade_ang_all3 else ang[0:2]
    ang_norm = jnp.linalg.norm(ang_gate_vec)
    n_gate = math.sqrt(3.0) if cfg.cascade_ang_all3 else math.sqrt(2.0)
    taken = jnp.zeros((), bool)
    bonus = jnp.zeros((), dtype)
    for tr_i, trp_i in zip(cfg.tr, cfg.tr_p):
        hit = jnp.logical_and(~taken, r_norm < 2.0 * tr_i)
        inner = ang_norm < n_gate * tr_i * cfg.cascade_ang_factor
        bonus = bonus + jnp.where(hit, trp_i * (1.0 + inner.astype(dtype)), 0.0)
        taken = jnp.logical_or(taken, hit)
    shaping = shaping + bonus

    reward = jnp.where(has_prev, shaping - prev_shaping, jnp.zeros((), dtype))
    abs_control = -jnp.sum((action - zero_control) ** 2) * cfg.p_c
    reward = reward + abs_control

    # Terminal taxonomy (reference quadrotor_env.py:556-573).
    target = 9.0 * cfg.tr[0] ** 2
    current = jnp.sum(vel**2) + jnp.sum(ang**2) + jnp.sum(ang_vel**2)
    solved = current < target
    timeout = step_i >= max_steps

    solved_r = (
        jnp.full((), cfg.solved_reward, dtype)
        if cfg.terminal_replaces
        else reward + cfg.solved_reward
    )
    broken_r = (
        jnp.full((), cfg.broken_reward, dtype)
        if cfg.terminal_replaces
        else reward + cfg.broken_reward
    )
    reward = jnp.where(
        solved, solved_r, jnp.where(timeout, reward, jnp.where(bb_done, broken_r, reward))
    )

    done = jnp.logical_or(bb_done, timeout)
    if training:
        done = jnp.logical_or(done, solved)
    return RewardOut(reward=reward, shaping=shaping, solved=solved, done=done)
