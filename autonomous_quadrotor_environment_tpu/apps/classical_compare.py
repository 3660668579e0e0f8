"""Classical-controller comparison: PID vs LQR vs RL, identical seeds.

Replaces the reference's same-start comparison protocol
(reference: lqr_quad.py:11-12,118-171, pid_vel_control.py:130-173,
ppo_quad_eval.py:33-66, analyzed by classical_controller_results/
results_analyzer.py:12-84): 20 episodes x 500 steps from identical random
starts, success = ||(vel, ang, ang_vel)|| < 0.05, plus per-controller
settling time, max overshoot, and control effort. All three controllers run
as batched scans on-device; the result table prints as JSON and saves the
per-step logs as .npz (the reference's .npy memory_array layout:
[vel(3), ang(3), ang_vel(3), cumulative-effort(1)] per step).
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..agents.networks import ActorCritic
from ..baselines import (
    VELOCITY_GAINS,
    cascaded_pid_control,
    cascaded_pid_init,
    lqr_control,
    make_lqr_gains,
)
from ..config import EnvConfig
from ..envs import hover
from ..utils import load_params

N_EPISODES = 20
MAX_STEPS = 500
SUCCESS_NORM = 0.05  # reference results_analyzer.py:23-27


def _log_step(env_s):
    """[vel(3), ang(3), ang_vel(3), cumulative effort(1)] — the env carries
    the control-effort accumulator (reference quad.abs_sum,
    quadrotor_env.py:575-577)."""
    return jnp.concatenate(
        [env_s.x[1:6:2], env_s.ang, env_s.ang_vel, env_s.abs_sum[None]]
    )


def run_pid(env_cfg: EnvConfig, keys) -> np.ndarray:
    """Velocity-regulation cascaded PID (reference pid_vel_control.py)."""

    def episode(key):
        env_s = hover.reset(key, env_cfg)
        pid_s = cascaded_pid_init()

        def body(carry, _):
            env_s, pid_s = carry
            pid_s, action = cascaded_pid_control(
                pid_s, env_s.x[1:6:2], jnp.zeros(3), env_s.ang, env_s.ang_vel,
                jnp.zeros(3), jnp.zeros(3), jnp.zeros(()), VELOCITY_GAINS,
                env_cfg.physics, env_cfg.dt,
            )
            env_s, _ = hover.step(env_s, action, env_cfg)
            return (env_s, pid_s), _log_step(env_s)

        (_, _), log = jax.lax.scan(body, (env_s, pid_s), None, length=MAX_STEPS)
        return log

    return np.asarray(jax.jit(jax.vmap(episode))(keys))


def run_lqr(env_cfg: EnvConfig, keys) -> np.ndarray:
    gains = make_lqr_gains(env_cfg.physics, clipped=env_cfg.clipped)

    def episode(key):
        env_s = hover.reset(key, env_cfg)

        def body(carry, _):
            env_s, euler_ant = carry
            action, euler_ant = lqr_control(
                gains, env_s.x[1:6:2], env_s.ang, env_s.ang_vel, euler_ant,
                env_cfg.physics, env_cfg.dt,
            )
            env_s, _ = hover.step(env_s, action, env_cfg)
            return (env_s, euler_ant), _log_step(env_s)

        (_, _), log = jax.lax.scan(body, (env_s, jnp.zeros(3)), None, length=MAX_STEPS)
        return log

    return np.asarray(jax.jit(jax.vmap(episode))(keys))


def run_rl(env_cfg_direct: EnvConfig, keys, model, params) -> np.ndarray:
    """The trained PPO controller (reference ppo_quad_eval.py:44-62)."""

    def episode(key):
        env_s = hover.reset(key, env_cfg_direct)

        def body(carry, _):
            env_s = carry
            action = model.apply(params, env_s.hist, method="actor_mean")
            env_s, _ = hover.step(env_s, action, env_cfg_direct)
            return env_s, _log_step(env_s)

        env_s, log = jax.lax.scan(body, env_s, None, length=MAX_STEPS)
        return log

    return np.asarray(jax.jit(jax.vmap(episode))(keys))


def analyze(log: np.ndarray, dt: float = 0.01) -> dict:
    """Success/settling/overshoot/effort table (reference
    results_analyzer.py:12-84): state norm over [vel, ang, ang_vel]."""
    norm = np.linalg.norm(log[:, :, 0:9], axis=-1)  # (E, T)
    success = norm[:, -1] < SUCCESS_NORM
    outside = norm > SUCCESS_NORM
    # settling: last time outside the band
    settling = np.array(
        [0.0 if not o.any() else (np.max(np.nonzero(o)[0]) + 1) * dt for o in outside]
    )
    overshoot = norm.max(axis=1)
    effort = log[:, -1, 9]  # final cumulative control effort per episode
    return {
        "success_rate": float(success.mean()),
        "settling_time_mean_s": float(settling[success].mean()) if success.any() else None,
        "overshoot_mean": float(overshoot.mean()),
        "effort_mean": float(effort.mean()),
    }


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--policy", type=str, default=None, help="RL checkpoint (.msgpack)")
    p.add_argument("--policy-size", type=int, default=128)
    p.add_argument("--clipped", action="store_true", default=True)
    p.add_argument("--out", type=str, default="runs/classical")
    return p


def main(argv=None) -> dict:
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()
    args = build_parser().parse_args(argv)
    keys = jax.random.split(jax.random.PRNGKey(args.seed), N_EPISODES)
    env_ind = EnvConfig(n_steps=MAX_STEPS, direct_control=False, training=True,
                        clipped=args.clipped)
    env_dir = EnvConfig(n_steps=MAX_STEPS, direct_control=True, training=True)

    os.makedirs(args.out, exist_ok=True)
    results = {}
    pid_log = run_pid(env_ind, keys)
    results["pid"] = analyze(pid_log)
    lqr_log = run_lqr(env_ind, keys)
    results["lqr"] = analyze(lqr_log)
    np.savez(f"{args.out}/pid_log_same_start.npz", pid_log)
    np.savez(f"{args.out}/lqr_log_same_start.npz", lqr_log)

    if args.policy:
        model = ActorCritic(hidden=args.policy_size)
        template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 75)))
        params = load_params(args.policy, template)
        rl_log = run_rl(env_dir, keys, model, params)
        results["rl"] = analyze(rl_log)
        np.savez(f"{args.out}/rl_log_same_start.npz", rl_log)

    print(json.dumps(results, indent=2))
    return results


if __name__ == "__main__":
    main()
