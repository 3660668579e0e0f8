"""100-episode visual-landing benchmark + oracle baseline.

Replaces the reference's `vldg_eval.py` -> rl_eval_worker 100-episode
benchmark (reference: visual_landing/rl_eval_worker.py:43,350-354 — the
93.5% README number) and the math_trajectory oracle printout (:157-160).

Example:
    python -m autonomous_quadrotor_environment_tpu.apps.eval_landing \
        --controller runs/ctrl/solved/nn_solved_128_0.msgpack \
        --policy runs/landing/PPO_landing_0.msgpack --episodes 100
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp

from ..landing import LandingActorCritic, make_landing_eval_fn
from ..landing.env import LandingConfigs
from ..landing.oracle import oracle_landing_eval
from ..utils import load_params
from .train_landing import load_controller


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--controller", type=str, required=True)
    p.add_argument("--controller-size", type=int, default=128)
    p.add_argument("--policy", type=str, default=None,
                   help="landing CNN checkpoint; omit to run only the oracle")
    p.add_argument("--episodes", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--oracle", action="store_true", help="also run the PI oracle")
    p.add_argument("--conv-dtype", type=str, default="float32",
                   choices=("float32", "bfloat16"),
                   help="CNN compute dtype (params stay f32; bf16 is the "
                        "mixed-precision trainer's inference path)")
    return p


def main(argv=None) -> dict:
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()
    args = build_parser().parse_args(argv)
    ctrl_model, ctrl_params = load_controller(args.controller, args.controller_size)
    cfgs = LandingConfigs.default(training=False)
    key = jax.random.PRNGKey(args.seed)
    results = {}

    if args.policy:
        from ..landing.networks import detect_s2d

        # Checkpoint layout is self-describing (plain 8x8x3 first conv vs
        # the space-to-depth 2x2x48 layout) — build the matching model.
        model = LandingActorCritic(
            dtype=jnp.dtype(args.conv_dtype), conv_s2d=detect_s2d(args.policy)
        )
        template = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 84, 84, 3)), jnp.zeros((1, 75)),
            jnp.zeros((1, 3)),
        )
        params = load_params(args.policy, template)
        eval_fn = jax.jit(
            make_landing_eval_fn(model, cfgs, ctrl_model, ctrl_params, args.episodes)
        )
        results.update({k: float(v) for k, v in eval_fn(params, key).items()})

    if args.oracle or not args.policy:
        oracle = jax.jit(
            lambda k: oracle_landing_eval(ctrl_model, ctrl_params, cfgs, args.episodes, k)
        )(jax.random.fold_in(key, 1))
        results.update({k: float(v) for k, v in oracle.items()})

    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
