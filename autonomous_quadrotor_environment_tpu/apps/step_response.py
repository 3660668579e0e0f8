"""Per-axis velocity step/ramp response of the trained controller.

Capability match for the reference's vel_control_ppo.py eval
(reference: environment/controller/vel_control_ppo.py:65-150 — command a
step or ramp velocity target on one axis and record the response), scored
with the response-metrics table. Runs all six cases (step/ramp × x/y/z) as
one batched scan.
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from ..agents.networks import ActorCritic
from ..config import EnvConfig
from ..core.quaternion import deriv_quat, quat_normalize
from ..envs import hover
from ..envs.featurizer import feat_size, push_hist
from ..utils import load_params


def make_response_runner(env_cfg: EnvConfig, model, params, steps: int):
    """fn(target_vel_fn_table (T,3), key) -> (T, 13) state log; the
    controller sees (state - velocity target) like the mission harness."""

    @jax.jit
    def run(vel_targets, key):  # (T, 3)
        x0 = jnp.zeros(13).at[6].set(1.0)
        env_s = hover.reset(key, env_cfg, det_state=x0)

        def body(carry, i):
            env_s, hist, action = carry
            tgt14 = jnp.zeros(14)
            tgt14 = tgt14.at[1].set(vel_targets[i, 0]).at[3].set(vel_targets[i, 1]).at[5].set(vel_targets[i, 2])
            q = quat_normalize(env_s.x[6:10])
            state14 = jnp.concatenate([env_s.x[0:10], deriv_quat(env_s.x[10:13], q)])
            hist = push_hist(hist, state14 - tgt14, action)
            action = model.apply(params, hist, method="actor_mean")
            env_s, _ = hover.step(env_s, action, env_cfg)
            return (env_s, hist, action), env_s.x

        (_, _, _), log = jax.lax.scan(
            body, (env_s, jnp.zeros(feat_size(5)), jnp.zeros(4)), jnp.arange(steps)
        )
        return log

    return run


def response_metrics_velocity(log: np.ndarray, axis: int, target: float, dt: float):
    v = log[:, 1 + 2 * axis]
    err = np.abs(v - target)
    band = max(0.05 * abs(target), 0.05)
    inside = err < band
    rise = float(np.argmax(inside)) * dt if inside.any() else None
    out = np.nonzero(~inside)[0]
    settling = float(out[-1] + 1) * dt if out.size else 0.0
    overshoot = float(v.max() if target > 0 else v.min())
    ss = float(v[-500:].mean() - target)
    return {"rise_s": rise, "settling_s": settling, "peak": overshoot, "ss_error": ss}


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--policy", type=str, required=True)
    p.add_argument("--policy-size", type=int, default=128)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--amplitude", type=float, default=1.0)
    return p


def main(argv=None) -> dict:
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()
    args = build_parser().parse_args(argv)
    env_cfg = EnvConfig(n_steps=args.steps, training=False)
    model = ActorCritic(hidden=args.policy_size)
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 75)))
    params = load_params(args.policy, template)
    runner = make_response_runner(env_cfg, model, params, args.steps)

    results = {}
    t = np.arange(args.steps)
    for kind in ("step", "ramp"):
        for axis, name in enumerate("xyz"):
            targets = np.zeros((args.steps, 3), np.float32)
            if kind == "step":
                targets[:, axis] = args.amplitude
            else:
                ramp_len = args.steps // 2
                targets[:ramp_len, axis] = args.amplitude * t[:ramp_len] / ramp_len
                targets[ramp_len:, axis] = args.amplitude
            log = np.asarray(runner(jnp.asarray(targets), jax.random.PRNGKey(0)))
            results[f"{kind}_{name}"] = response_metrics_velocity(
                log, axis, args.amplitude, env_cfg.dt
            )
    print(json.dumps(results, indent=2))
    return results


if __name__ == "__main__":
    main()
