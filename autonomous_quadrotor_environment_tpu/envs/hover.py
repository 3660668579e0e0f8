"""Batched hover/position-stabilization environment.

TPU-first re-design of the reference's `quad` class
(reference: environment/quadrotor_env.py:111-577 and the opt variant
quadrotor_env_opt.py). The env is a pair of pure functions

    reset(key, cfg[, det_state])            -> EnvState
    step(state, action, cfg)                -> (EnvState, StepOut)

with every piece of mutable reference state (step counter, shaping carry,
action history window, per-episode domain randomization, RNG) carried in an
explicit ``EnvState`` pytree. `vmap` gives thousands of independent
quadrotors per chip; `lax.scan` rolls them through time inside one XLA
program; auto-reset keeps the batch dense.

State layout (13,): [x, vx, y, vy, z, vz, q0, q1, q2, q3, wx, wy, wz]
Observation: quat_state (14,) = [state[0:10], quat_dot(4)] plus the (T*15,)
history window that the controllers consume.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..config import BB_POS, BB_VEL, EnvConfig
from ..core.dynamics import physics_step
from ..core.quaternion import euler_quat, quat_euler, quat_normalize
from ..core.randomization import DomainParams, sample_domain, wind_update
from .featurizer import init_hist, push_hist
from .rewards import hover_reward


@struct.dataclass
class EnvState:
    """Everything the reference kept on `self`, as a vmappable pytree."""

    x: jnp.ndarray            # (13,) physics state
    i: jnp.ndarray            # ()   int32 step counter (includes warmup)
    prev_shaping: jnp.ndarray  # ()
    has_shaping: jnp.ndarray  # ()   bool
    prev_ang: jnp.ndarray     # (3,) for Euler-rate estimate (PID/LQR baselines)
    ang: jnp.ndarray          # (3,) current Euler angles
    ang_vel: jnp.ndarray      # (3,) Euler-rate estimate
    done: jnp.ndarray         # ()   bool
    solved: jnp.ndarray       # ()   bool
    abs_sum: jnp.ndarray      # ()   cumulative control effort
    hist: jnp.ndarray         # (T*15,) featurizer window
    last_action: jnp.ndarray  # (4,) previous clipped action
    vel_target: jnp.ndarray   # (3,) per-episode velocity target (zeros = hover)
    dom: DomainParams
    key: jax.Array


class StepOut(NamedTuple):
    obs: jnp.ndarray         # (T*15,) network input
    quat_state: jnp.ndarray  # (14,)
    reward: jnp.ndarray
    done: jnp.ndarray
    solved: jnp.ndarray


def zero_control(cfg: EnvConfig, dtype=jnp.float32) -> jnp.ndarray:
    """Neutral action (reference quadrotor_env.py:163-167)."""
    p = cfg.physics
    if cfg.direct_control:
        return jnp.full((4,), p.hover_action_direct, dtype)
    return jnp.asarray([p.mass * p.gravity, 0.0, 0.0, 0.0], dtype)


def _bb_limits(cfg: EnvConfig, dtype) -> jnp.ndarray:
    """Bounding-box array over [|vel|(3), |euler|(3), |ang_vel|(3)]
    (reference quadrotor_env.py:139-145, opt :96-104)."""
    lim = jnp.asarray(
        [
            cfg.bb_vel,
            cfg.bb_vel,
            cfg.bb_vel,
            cfg.bb_ang_rp,
            cfg.bb_ang_rp,
            cfg.bb_ang_psi,
            cfg.bb_ang_vel,
            cfg.bb_ang_vel,
            cfg.bb_ang_vel,
        ],
        dtype,
    )
    return lim * cfg.bb_scale


def random_initial_state(key: jax.Array, dtype=jnp.float32) -> jnp.ndarray:
    """Reference reset distribution (quadrotor_env.py:440-445): uniform
    attitude in [-0.5, 0.5) rad, clipped normals for pos/vel/rates — the
    asymmetric angular-rate clip (-BB_VEL*1.5, +BB_POS*1.5) is the
    reference's, replicated deliberately."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    ang = jax.random.uniform(k1, (3,), dtype, -0.5, 0.5)
    q = euler_quat(ang)
    pos = jnp.clip(jax.random.normal(k2, (3,), dtype) * 2.0, -BB_POS / 2, BB_POS / 2)
    vel = jnp.clip(jax.random.normal(k3, (3,), dtype) * 2.0, -BB_VEL / 2, BB_VEL / 2)
    omega = jnp.clip(jax.random.normal(k4, (3,), dtype) * 2.0, -BB_VEL * 1.5, BB_POS * 1.5)
    x = jnp.zeros(13, dtype)
    x = x.at[0:5:2].set(pos)
    x = x.at[1:6:2].set(vel)
    x = x.at[6:10].set(q)
    x = x.at[10:13].set(omega)
    return x


def _raw_state(
    x: jnp.ndarray,
    key: jax.Array,
    dom: DomainParams,
    t: int,
    vel_target: jnp.ndarray | None = None,
) -> EnvState:
    dtype = x.dtype
    ang = quat_euler(quat_normalize(x[6:10]))
    if vel_target is None:
        vel_target = jnp.zeros(3, dtype)
    return EnvState(
        x=x,
        i=jnp.zeros((), jnp.int32),
        prev_shaping=jnp.zeros((), dtype),
        has_shaping=jnp.zeros((), bool),
        prev_ang=ang,
        ang=ang,
        ang_vel=jnp.zeros(3, dtype),
        done=jnp.zeros((), bool),
        solved=jnp.zeros((), bool),
        abs_sum=jnp.zeros((), dtype),
        hist=init_hist(t, dtype),
        last_action=jnp.zeros(4, dtype),
        vel_target=jnp.asarray(vel_target, dtype),
        dom=dom,
        key=key,
    )


def step(state: EnvState, action: jnp.ndarray, cfg: EnvConfig) -> tuple[EnvState, StepOut]:
    """One environment step (reference quadrotor_env.py:458-498)."""
    dtype = state.x.dtype
    phys = cfg.physics
    rand = cfg.randomization.enabled

    i = state.i + 1
    key, k_wind = jax.random.split(state.key)
    dom, wind = wind_update(state.dom, k_wind, i, cfg.randomization)

    x_new, aux = physics_step(
        state.x,
        action,
        wind.astype(dtype),
        phys,
        dom,
        dt=cfg.dt,
        substeps=cfg.rk_substeps,
        direct_control=cfg.direct_control,
        clipped=cfg.clipped,
        randomize=rand,
        # The env step itself needs only v_q + motor outputs; sensor users
        # re-derive the accelerometer aux from the pre-step state themselves
        # (envs/sensors.py consumers call physics_step directly).
        compute_accel_aux=False,
    )

    # Attitude bookkeeping (reference :488-494).
    ang = quat_euler(quat_normalize(x_new[6:10]))
    ang_vel = (ang - state.prev_ang) / cfg.dt

    # Bounding-box termination (reference :500-509).
    cond = jnp.concatenate([x_new[1:6:2], ang, x_new[10:13]])
    bb_done = jnp.any(jnp.abs(cond) >= _bb_limits(cfg, dtype))

    # The action the reward sees: clipped in direct mode, raw in indirect
    # (reference :470-479).
    reward_action = aux.motor.clipped_action if cfg.direct_control else jnp.asarray(action, dtype)

    # Velocity-tracking task: reward/solve act on the velocity ERROR; for
    # the hover task vel_target is zeros and this is the identity. The
    # bounding-box termination above stays on ABSOLUTE velocity (reference
    # done_condition semantics, quadrotor_env.py:500-509).
    vel_err = x_new[1:6:2] - state.vel_target

    rew = hover_reward(
        cfg.reward,
        vel=vel_err,
        ang=ang,
        ang_vel=x_new[10:13],
        action=reward_action,
        zero_control=zero_control(cfg, dtype),
        prev_shaping=state.prev_shaping,
        has_prev=state.has_shaping,
        step_i=i,
        max_steps=cfg.max_steps,
        bb_done=bb_done,
        training=cfg.training,
    )

    # Control-effort accumulation (reference :575-577; opt env logs Newtons).
    effort = aux.motor.step_effort
    if cfg.direct_control and cfg.effort_is_force:
        effort = (effort + 1.0) * phys.t2wr * phys.mass * phys.gravity / 8.0
    abs_sum = state.abs_sum + jnp.linalg.norm(effort)

    quat_state = jnp.concatenate([x_new[0:10], aux.v_q])
    # The history window records the *raw* policy action (the reference's
    # worker feeds dl_input the sampled action before clipping, ppo.py:240,250)
    # and observes state-minus-target in the velocity slots (the reference's
    # dl_input(state + ERROR) convention, vel_control_ppo.py:129-137; zeros
    # for the hover task).
    obs_state = quat_state.at[1:6:2].add(-state.vel_target)
    hist = push_hist(state.hist, obs_state, jnp.asarray(action, dtype)[:4])

    new_state = EnvState(
        x=x_new,
        i=i,
        prev_shaping=rew.shaping,
        has_shaping=jnp.ones((), bool),
        prev_ang=ang,
        ang=ang,
        ang_vel=ang_vel,
        done=rew.done,
        solved=rew.solved,
        abs_sum=abs_sum,
        hist=hist,
        last_action=reward_action,
        vel_target=state.vel_target,
        dom=dom,
        key=key,
    )
    out = StepOut(
        obs=hist,
        quat_state=quat_state,
        reward=rew.reward,
        done=rew.done,
        solved=rew.solved,
    )
    return new_state, out


def reset(
    key: jax.Array,
    cfg: EnvConfig,
    det_state: Optional[jnp.ndarray] = None,
    dtype=jnp.float32,
) -> EnvState:
    """Start a new episode and run the T warmup steps with the neutral action
    (reference quadrotor_env.py:408-454: reset applies `zero_control` for T
    steps before handing control to the agent)."""
    k_dom, k_init, k_state = jax.random.split(key, 3)
    dom = sample_domain(k_dom, cfg.randomization, dtype)
    if det_state is None:
        x0 = random_initial_state(k_init, dtype)
    else:
        x0 = jnp.asarray(det_state, dtype)
    # Velocity task only: the extra split is gated statically so the hover
    # task's reset RNG stream stays bit-identical to rounds 1-2 (fixtures,
    # classical same-start legs, and the landing benchmark depend on it).
    vel_target = None
    if cfg.has_vel_target:
        k_state, k_tgt = jax.random.split(k_state)
        vmax = jnp.asarray(cfg.vel_target_max, dtype)
        vel_target = jax.random.uniform(k_tgt, (3,), dtype, -1.0, 1.0) * vmax
    state = _raw_state(x0, k_state, dom, cfg.hist_t, vel_target)

    if cfg.warmup > 0:
        zc = zero_control(cfg, dtype)

        def body(s, _):
            s, _out = step(s, zc, cfg)
            return s, None

        state, _ = jax.lax.scan(body, state, None, length=cfg.warmup)
        # Warmup must not leave terminal flags set for the agent's episode.
        state = state.replace(done=jnp.zeros((), bool), solved=jnp.zeros((), bool))
    return state


def step_autoreset(
    state: EnvState, action: jnp.ndarray, cfg: EnvConfig
) -> tuple[EnvState, StepOut]:
    """Step; when the episode ends, immediately start a fresh one.

    The returned ``StepOut`` reports the *terminal* transition (reward/done
    of the finished episode) while the carried state is the new episode's —
    the standard batched-RL convention replacing the reference's
    while-True/reset worker loop (ppo.py:233-266).
    """
    stepped, out = step(state, action, cfg)
    key, k_reset = jax.random.split(stepped.key)
    fresh = reset(k_reset, cfg, dtype=state.x.dtype)
    new_state = jax.tree.map(
        lambda a, b: jnp.where(out.done, a, b), fresh, stepped.replace(key=key)
    )
    return new_state, out
