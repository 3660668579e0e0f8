"""Robust-control cross-evaluation: {nominal, robust} x {calm, windy}.

Capability match for evaluating the reference's `robust_control` training
mode (reference: environment/quadrotor_env.py:84-109) — per-episode
mass/KF/J/IR perturbations plus 5 m/s interpolated wind gusts. Reports,
per policy x environment cell, the strict stillness solve rate, the
station-keeping solve rate (survive the full episode AND hold post-settle
RMS velocity < 0.5 m/s — the defensible criterion under persistent gusts,
see agents/ppo.make_eval_fn), survival, and RMS velocity.

    python -m autonomous_quadrotor_environment_tpu.apps.robust_eval \
        --nominal fixtures/nn_solved_128_0.msgpack \
        --robust runs/ctrl_robust/nn_final_128_0.msgpack
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp

from ..agents import make_eval_fn
from ..agents.networks import ActorCritic
from ..config import EnvConfig, RandomizationConfig
from ..utils import load_params


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--nominal", type=str, required=True)
    p.add_argument("--robust", type=str, default=None)
    p.add_argument("--size", type=int, default=128)
    p.add_argument(
        "--robust-size", type=int, default=None,
        help="hidden width of the robust policy when it differs from "
        "--size (the reference sweeps N in {16..256}; a wider robust net "
        "keeps the same 75-dim observation space)",
    )
    p.add_argument("--episodes", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    return p


def main(argv=None) -> dict:
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()
    args = build_parser().parse_args(argv)
    model = ActorCritic(hidden=args.size)
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 75)))
    policies = {"nominal": (model, load_params(args.nominal, template))}
    if args.robust:
        rsize = args.robust_size or args.size
        if rsize == args.size:
            model_r, tmpl_r = model, template
        else:
            model_r = ActorCritic(hidden=rsize)
            tmpl_r = model_r.init(jax.random.PRNGKey(0), jnp.zeros((1, 75)))
        policies["robust"] = (model_r, load_params(args.robust, tmpl_r))

    envs = {
        "calm": EnvConfig(n_steps=1000),
        "windy": EnvConfig(
            n_steps=1000, randomization=RandomizationConfig(enabled=True)
        ),
    }
    key = jax.random.PRNGKey(args.seed)
    table = {}
    for env_name, cfg in envs.items():
        for pol_name, (pol_model, params) in policies.items():
            eval_fn = jax.jit(make_eval_fn(pol_model, cfg, episodes=args.episodes))
            out = {k: float(v) for k, v in eval_fn(params, key).items()}
            table[f"{pol_name}/{env_name}"] = out
    print(json.dumps(table, indent=2))
    return table


if __name__ == "__main__":
    main()
