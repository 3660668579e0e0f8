"""Train the visual-landing CNN policy over a frozen state controller.

Replaces the reference's `trainer_vldg.sh N` + `vldg_training.py [-c]`
mother/child orchestration (reference: vldg_training.py:19-127,
visual_landing/rl_worker.py:267-342): the N child processes + file-IPC
become a vmap'd env batch (optionally shard_mapped over --dp devices), and
the parameter "broadcast" is the replicated train state.

Example:
    python -m autonomous_quadrotor_environment_tpu.apps.train_landing \
        --controller runs/ctrl/solved/nn_solved_128_0.msgpack \
        --updates 500 --num-envs 64 --out runs/landing
"""

from __future__ import annotations

import argparse
import time

import jax

from ..agents.networks import ActorCritic
from ..config import PPOConfig
from ..landing import landing_ppo_init, make_landing_eval_fn, make_landing_train_step
from ..landing.env import LandingConfigs
from ..utils import JSONLLogger, load_params, save_params


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--controller", type=str, required=True,
                   help="frozen state-controller checkpoint (.msgpack)")
    p.add_argument("--controller-size", type=int, default=128)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--updates", type=int, default=500)
    p.add_argument("--num-envs", type=int, default=64)
    p.add_argument("--rollout-steps", type=int, default=24,
                   help="policy decisions per env per update")
    p.add_argument("--eval-every", type=int, default=10)
    p.add_argument("--eval-episodes", type=int, default=20)
    p.add_argument(
        "--inner", type=int, default=1,
        help="scan N train steps into one jitted program between host "
        "round-trips (landing.make_landing_train_loop; docs/PERF.md round "
        "3d). Clamped to gcd(--inner, --eval-every); semantics identical "
        "to --inner 1.",
    )
    p.add_argument("--dp", type=int, default=0, help="data-parallel devices (0 = single)")
    # Defaults are the round-5 CERTIFIED configuration (f32 rollout
    # images + bf16 conv + the reference's per-row shuffle): a full
    # from-scratch run under it scores 99%/98% on the official
    # 100-episode benchmark with no late collapse
    # (runs/r5/ablation/summary.json). The round-4 fast modes (uint8
    # images, shuffle_block == minibatch) stay reachable via these flags,
    # but every uint8 training arm fell short of certification at 8000
    # updates (best 89%/94%) — see docs/PERF.md round 5 before using them
    # for training that must converge.
    p.add_argument(
        "--image-dtype", type=str, default="f32",
        choices=("uint8", "bf16", "f32"),
        help="rollout image storage dtype. uint8 quarters the update's "
        "dominant HBM stream but is run-to-run UNSTABLE over long "
        "training (docs/PERF.md round 5); f32 is the certified default",
    )
    p.add_argument(
        "--conv-dtype", type=str, default="bf16", choices=("bf16", "f32"),
        help="conv/dense compute dtype (params and loss math stay f32)",
    )
    p.add_argument(
        "--shuffle-block", type=int, default=-1,
        help="minibatch shuffle granularity in rows; -1 = "
        "PPOConfig.landing_variant() default (1 = the reference's exact "
        "per-row randperm, ppo_trainer.py:188-197 — the certified "
        "config); 1536 (= minibatch) is the round-4 frozen-composition "
        "fast path, which FAILED from-scratch certification",
    )
    p.add_argument(
        "--conv-s2d", action=argparse.BooleanOptionalAction, default=True,
        help="space-to-depth first conv (isomorphic weights, 48 input "
        "channels vs 3 against the MXU 128-lane padding; ~12-14%% faster "
        "step — runs/r5/landing_conv_probe.json). Default ON: a full "
        "from-scratch run under the shipped defaults + s2d certifies "
        "97%%/98%% on the official benchmark (runs/r5/ablation/"
        "summary.json, arm s2d_cert_s0; the layout is a fixed kernel "
        "permutation, so training is the plain run up to fp reordering). "
        "Checkpoints store whichever layout trained them; --resume and the "
        "eval/fixture loaders auto-detect and convert "
        "(landing.networks.params_to_s2d / params_from_s2d)",
    )
    p.add_argument(
        "--reshuffle-epoch", action="store_true",
        help="the reference's EXACT shuffle semantics at amortized cost: "
        "one full-batch row randperm per epoch, minibatches = contiguous "
        "chunks of it (PPOConfig.reshuffle_per_epoch)",
    )
    p.add_argument(
        "--reshuffle-update", action="store_true",
        help="re-randomize minibatch composition once per update (single "
        "full-batch row gather before the K epochs; see "
        "PPOConfig.reshuffle_per_update) — fresh composition per update "
        "while keeping block == minibatch contiguous slices in the epochs",
    )
    p.add_argument("--out", type=str, default="runs/landing")
    p.add_argument("--resume", type=str, default=None,
                   help="landing checkpoint to continue from (the reference "
                        "trainers always try-load their last checkpoint, "
                        "ppo_trainer.py:69-77)")
    return p


def load_controller(path: str, size: int):
    model = ActorCritic(hidden=size)
    template = model.init(jax.random.PRNGKey(0), jax.numpy.zeros((1, 75)))
    return model, load_params(path, template)


def main(argv=None) -> dict:
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()
    args = build_parser().parse_args(argv)
    ctrl_model, ctrl_params = load_controller(args.controller, args.controller_size)
    cfgs = LandingConfigs.default(training=True)
    ppo_cfg = PPOConfig.landing_variant()
    import dataclasses

    if args.shuffle_block >= 0:
        ppo_cfg = dataclasses.replace(ppo_cfg, shuffle_block=args.shuffle_block)
    if args.reshuffle_update:
        ppo_cfg = dataclasses.replace(ppo_cfg, reshuffle_per_update=True)
    if args.reshuffle_epoch:
        ppo_cfg = dataclasses.replace(ppo_cfg, reshuffle_per_epoch=True)
    import jax.numpy as jnp

    conv_dtype = {"bf16": jnp.bfloat16, "f32": jnp.float32}[args.conv_dtype]
    image_dtype = {"uint8": jnp.uint8, "bf16": jnp.bfloat16, "f32": None}[
        args.image_dtype
    ]

    import math as _math

    inner = max(args.inner, 1)
    if inner > 1:
        inner = max(_math.gcd(inner, args.eval_every), 1)
    train_loop = None
    if args.dp > 0:
        from ..parallel import (
            landing_ppo_init_sharded,
            make_dp_mesh,
            make_landing_parallel_train_loop,
            make_landing_parallel_train_step,
        )

        mesh = make_dp_mesh(args.dp)
        model, tx, state = landing_ppo_init_sharded(
            jax.random.PRNGKey(args.seed), cfgs, ppo_cfg, args.num_envs,
            ctrl_model, ctrl_params, mesh, conv_dtype=conv_dtype,
            conv_s2d=args.conv_s2d,
        )
        train_step = make_landing_parallel_train_step(
            model, tx, cfgs, ppo_cfg, ctrl_model, ctrl_params, args.rollout_steps,
            mesh, image_dtype=image_dtype,
        )
        if inner > 1:
            train_loop = make_landing_parallel_train_loop(
                model, tx, cfgs, ppo_cfg, ctrl_model, ctrl_params,
                args.rollout_steps, mesh, inner, image_dtype=image_dtype,
            )
    else:
        model, tx, state = landing_ppo_init(
            jax.random.PRNGKey(args.seed), cfgs, ppo_cfg, args.num_envs,
            ctrl_model, ctrl_params, conv_dtype=conv_dtype,
            conv_s2d=args.conv_s2d,
        )
        train_step = jax.jit(
            make_landing_train_step(
                model, tx, cfgs, ppo_cfg, ctrl_model, ctrl_params,
                args.rollout_steps, image_dtype=image_dtype,
            )
        )
        if inner > 1:
            from ..landing import make_landing_train_loop

            train_loop = jax.jit(
                make_landing_train_loop(
                    model, tx, cfgs, ppo_cfg, ctrl_model, ctrl_params,
                    args.rollout_steps, inner, image_dtype=image_dtype,
                )
            )
    if args.resume:
        from ..landing.networks import detect_s2d, params_from_s2d, params_to_s2d

        ckpt_s2d = detect_s2d(args.resume)
        if ckpt_s2d == args.conv_s2d:
            params = load_params(args.resume, state.params)
        elif args.conv_s2d:  # plain checkpoint -> s2d model (exact permutation)
            params = params_to_s2d(
                load_params(args.resume, params_from_s2d(state.params))
            )
        else:  # s2d checkpoint -> plain model
            params = params_from_s2d(
                load_params(args.resume, params_to_s2d(state.params))
            )
        state = state.replace(params=params, opt_state=tx.init(params))
        print(f"resumed from {args.resume}"
              + (" (converted layout)" if ckpt_s2d != args.conv_s2d else ""))
    eval_fn = jax.jit(
        make_landing_eval_fn(model, cfgs, ctrl_model, ctrl_params, args.eval_episodes)
    )
    jsonl = JSONLLogger(f"{args.out}/train_landing_{args.seed}.jsonl")
    t0 = time.time()
    last_eval = {}
    # Best-eval checkpoint (the reference saves the solved network the
    # moment it solves, controller/ppo.py:428-429; PPO can degrade after
    # peaking, so keep the best (solved, reward) params alongside the
    # rolling final-state checkpoint).
    best = (-1.0, float("-inf"))
    i = 0  # updates completed
    while i < args.updates:
        if train_loop is not None and args.updates - i >= inner:
            state, stacked = train_loop(state)
            metrics = jax.tree.map(lambda x: x[-1], stacked)
            i += inner
        else:
            state, metrics = train_step(state)
            i += 1
        if i % args.eval_every == 0:
            last_eval = {
                k: float(v)
                for k, v in eval_fn(state.params, jax.random.fold_in(jax.random.PRNGKey(args.seed), i)).items()
            }
            jsonl.log(update=i, **last_eval, **{k: float(v) for k, v in metrics.items()})
            print(
                f"update {i:5d}  eval_reward {last_eval['eval_reward']:8.2f}  "
                f"solved {last_eval['eval_solved']:6.1%}  "
                f"decisions/s {i * args.num_envs * args.rollout_steps / (time.time() - t0):7.0f}"
            )
            save_params(f"{args.out}/PPO_landing_{args.seed}.msgpack", state.params)
            score = (last_eval["eval_solved"], last_eval["eval_reward"])
            if score > best:
                best = score
                save_params(
                    f"{args.out}/PPO_landing_best_{args.seed}.msgpack", state.params
                )
    save_params(f"{args.out}/PPO_landing_{args.seed}.msgpack", state.params)
    return {"final_eval": last_eval, "best_eval_solved": best[0], "wall_s": time.time() - t0}


if __name__ == "__main__":
    main()
