"""Hierarchical visual-landing environment.

Capability match for the reference's `quad_worker` training loop
(reference: visual_landing/rl_worker.py:69-497), re-designed as a pure
batched env: one `landing_step` = one CNN policy decision = an inner
`lax.scan` of TASK_INTERVAL_STEPS=10 physics frames (:402-416), each frame
running the sensor fusion (:404), the rolling featurizer fed with
sensor-state-minus-velocity-command (:406-407), and the FROZEN low-level
MLP controller (:408) before the physics step (:409). The camera frame is
rendered once per decision (the reference renders every frame but only the
latest image survives `image_roll`, :412-413 + :190-203 with conv_3D off —
same observation, 10x less render work).

Reward and geometry: `visual_reward` on the TRUE state (:417), random
marker N(0, 0.8) and cone-constrained start (:153-162), camera fixed nadir
at the quad's position (:127-128, :358-362), ground plane at env z = -5.

Deliberate divergence: the reference's very first task tick runs with a
zero velocity command and discards its reward (:370, :419-421 gate on
ppo_calls>=1); here `landing_reset` performs that warm-up decision interval
directly so every observation the policy sees already has a rendered image.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from ..config import CameraConfig, EnvConfig, LandingConfig, MarkerConfig, SensorConfig
from ..core.dynamics import aux_at_state
from ..core.randomization import zeros_domain
from ..envs import hover
from ..envs.featurizer import feat_size, push_hist
from ..envs.sensors import SensorState, reads_from_env, sensor_fused, sensor_reset
from ..render import make_camera, render_nadir
from .reward import visual_reward


class LandingConfigs(NamedTuple):
    """Static bundle for the landing task."""

    landing: LandingConfig
    env: EnvConfig
    sensor: SensorConfig
    camera: CameraConfig
    marker: MarkerConfig

    @staticmethod
    def default(training: bool = True) -> "LandingConfigs":
        return LandingConfigs(
            landing=LandingConfig(),
            env=EnvConfig.landing_variant(training=training),
            sensor=SensorConfig(),
            camera=CameraConfig(),
            marker=MarkerConfig(),
        )


@struct.dataclass
class LandingState:
    env: hover.EnvState          # inner physics env (opt variant config)
    sens: SensorState
    marker_world: jnp.ndarray    # (3,) marker in WORLD frame (z ~ 0.001)
    hist: jnp.ndarray            # (75,) low-level controller input window
    crtl_action: jnp.ndarray     # (4,) last low-level action
    vel_error: jnp.ndarray       # (3,) current velocity command
    last_shaping: jnp.ndarray    # ()
    has_shaping: jnp.ndarray     # () bool
    internal_frame: jnp.ndarray  # () int32 physics-frame counter
    done: jnp.ndarray            # () bool
    key: jax.Array


class LandingObs(NamedTuple):
    image: jnp.ndarray       # (84, 84, 3) in [0, 1]
    control_in: jnp.ndarray  # (75,) the low-level controller's current input


class LandingStepOut(NamedTuple):
    obs: LandingObs
    reward: jnp.ndarray
    done: jnp.ndarray
    solved: jnp.ndarray


def _inner_interval(
    state: LandingState,
    cfgs: LandingConfigs,
    ctrl_model: Any,
    ctrl_params: Any,
) -> LandingState:
    """TASK_INTERVAL_STEPS physics frames under the frozen controller
    (reference rl_worker.py:402-416)."""
    lcfg = cfgs.landing
    env_cfg = cfgs.env
    dtype = state.hist.dtype
    err14 = jnp.zeros(14, dtype)
    err14 = err14.at[1].set(state.vel_error[0])
    err14 = err14.at[3].set(state.vel_error[1])
    err14 = err14.at[5].set(state.vel_error[2])

    def frame(carry, _):
        env_s, sens_s, hist, crtl_action, key, i = carry
        key, k_sens = jax.random.split(key)
        # Sensor fusion uses the post-step diagnostics of the LAST physics
        # step: the reference reads the env's instance attributes
        # (quadrotor_env_opt.py:517-524), which were computed AT the state
        # env_s.x from the action that produced it — one RHS evaluation,
        # no re-integration (see core/dynamics.aux_at_state).
        aux = aux_at_state(
            env_s.x, crtl_action, env_cfg.physics, env_s.dom, direct_control=True
        )
        reads = reads_from_env(env_s.x, aux)
        sens_s, fused = sensor_fused(
            sens_s, reads, k_sens, cfgs.sensor, env_cfg.physics, env_cfg.dt
        )
        hist = push_hist(hist, fused.states_sens - err14, crtl_action)
        mean = ctrl_model.apply(ctrl_params, hist, method="actor_mean")
        env_s, _out = hover.step(env_s, mean, env_cfg)  # done flag ignored
        return (env_s, sens_s, hist, mean, key, i + 1), None

    (env_s, sens_s, hist, crtl_action, key, frames), _ = jax.lax.scan(
        frame,
        (state.env, state.sens, state.hist, state.crtl_action, state.key,
         state.internal_frame),
        None,
        length=lcfg.task_interval,
    )
    return state.replace(
        env=env_s, sens=sens_s, hist=hist, crtl_action=crtl_action, key=key,
        internal_frame=frames,
    )


def _observe(state: LandingState, cfgs: LandingConfigs) -> LandingObs:
    cam = make_camera(cfgs.camera)
    pos_env = state.env.x[0:5:2]
    marker_xy = state.marker_world[0:2]
    img = render_nadir(cam, pos_env, marker_xy, cfgs.marker, ground_z_env=cfgs.landing.ground_z)
    return LandingObs(image=img, control_in=state.hist)


def landing_reset(
    key: jax.Array,
    cfgs: LandingConfigs,
    ctrl_model: Any,
    ctrl_params: Any,
    dtype=jnp.float32,
) -> tuple[LandingState, LandingObs]:
    """Random marker + cone-constrained start (reference rl_worker.py:153-162)
    followed by the warm-up decision interval with a zero velocity command."""
    k_marker, k_z, k_xy, k_env, k_sens, k_state = jax.random.split(key, 6)
    marker_xy = jax.random.normal(k_marker, (2,), dtype) * cfgs.landing.marker_std
    marker_world = jnp.concatenate([marker_xy, jnp.asarray([0.001], dtype)])

    quad_z = -5.0 * jax.random.uniform(k_z, (), dtype) + 1.0
    spread = jnp.abs(-5.0 - quad_z) / 7.0 * 4.0
    quad_xy = marker_xy + (jax.random.uniform(k_xy, (2,), dtype) - 0.5) * spread
    x0 = jnp.zeros(13, dtype)
    x0 = x0.at[0].set(quad_xy[0]).at[2].set(quad_xy[1]).at[4].set(quad_z)
    x0 = x0.at[6].set(1.0)

    env_s = hover.reset(k_env, cfgs.env, det_state=x0, dtype=dtype)
    aux0 = aux_at_state(
        env_s.x, jnp.zeros(4, dtype), cfgs.env.physics, zeros_domain(dtype),
        direct_control=True,
    )
    sens_s = sensor_reset(k_sens, reads_from_env(env_s.x, aux0), cfgs.sensor, dtype)

    state = LandingState(
        env=env_s,
        sens=sens_s,
        marker_world=marker_world,
        hist=jnp.zeros(feat_size(5), dtype),
        crtl_action=jnp.zeros(4, dtype),
        vel_error=jnp.zeros(3, dtype),
        last_shaping=jnp.zeros((), dtype),
        has_shaping=jnp.zeros((), bool),
        internal_frame=jnp.zeros((), jnp.int32),
        done=jnp.zeros((), bool),
        key=k_state,
    )
    # Warm-up interval (reference ppo_calls=0 tick with vel_error = 0).
    state = _inner_interval(state, cfgs, ctrl_model, ctrl_params)
    rew = visual_reward(
        cfgs.landing.total_steps, state.marker_world, state.env.x[0:5:2],
        state.env.x[1:6:2], jnp.zeros(3, dtype), state.last_shaping,
        state.has_shaping, state.internal_frame, state.env.ang, state.env.x[10:13],
    )
    state = state.replace(last_shaping=rew.shaping, has_shaping=jnp.ones((), bool))
    return state, _observe(state, cfgs)


def landing_step(
    state: LandingState,
    visual_action: jnp.ndarray,  # (3,) CNN action in [-1, 1]
    cfgs: LandingConfigs,
    ctrl_model: Any,
    ctrl_params: Any,
) -> tuple[LandingState, LandingStepOut]:
    """One policy decision: velocity command -> 10 physics frames -> reward
    + fresh observation (reference rl_worker.py:368-424)."""
    lcfg = cfgs.landing
    dtype = state.hist.dtype
    vel_error = (
        jnp.asarray(visual_action, dtype) * jnp.asarray(lcfg.velocity_scale, dtype)
        + jnp.asarray(lcfg.velocity_d, dtype)
    )
    state = state.replace(vel_error=vel_error)
    state = _inner_interval(state, cfgs, ctrl_model, ctrl_params)

    rew = visual_reward(
        lcfg.total_steps,
        state.marker_world,
        state.env.x[0:5:2],
        state.env.x[1:6:2],
        jnp.asarray(visual_action, dtype),
        state.last_shaping,
        state.has_shaping,
        state.internal_frame,
        state.env.ang,
        state.env.x[10:13],
    )
    state = state.replace(
        last_shaping=rew.shaping, has_shaping=jnp.ones((), bool), done=rew.done
    )
    return state, LandingStepOut(
        obs=_observe(state, cfgs), reward=rew.reward, done=rew.done, solved=rew.solved
    )


def landing_step_autoreset(
    state: LandingState,
    visual_action: jnp.ndarray,
    cfgs: LandingConfigs,
    ctrl_model: Any,
    ctrl_params: Any,
) -> tuple[LandingState, LandingStepOut]:
    """Step; on episode end start a fresh episode (batched-RL convention —
    replaces the reference's reset-inside-task, rl_worker.py:493)."""
    stepped, out = landing_step(state, visual_action, cfgs, ctrl_model, ctrl_params)
    key, k_reset = jax.random.split(stepped.key)
    fresh, fresh_obs = landing_reset(k_reset, cfgs, ctrl_model, ctrl_params, state.hist.dtype)
    new_state = jax.tree.map(
        lambda a, b: jnp.where(out.done, a, b), fresh, stepped.replace(key=key)
    )
    obs = jax.tree.map(lambda a, b: jnp.where(out.done, a, b), fresh_obs, out.obs)
    return new_state, LandingStepOut(
        obs=obs, reward=out.reward, done=out.done, solved=out.solved
    )
