"""Train the state-feedback PPO hover/position controller.

Replaces the reference's `python3 ppo.py -s SEED -N SIZE` training loop
(reference: environment/controller/ppo.py:27-430): same task, hyperparameter
surface, periodic deterministic evaluation, CSV log schema, and
untrained/solved checkpoint layout — but the rollout+update is one jitted
program over a vmap'd env batch (optionally shard_mapped over a device
mesh with --dp).

Example:
    python -m autonomous_quadrotor_environment_tpu.apps.train_control \
        --seed 0 --size 128 --updates 2000 --num-envs 1024 --out runs/ctrl
"""

from __future__ import annotations

import argparse
import math
import time
from datetime import datetime

import jax

from ..agents import make_eval_fn, make_train_loop, make_train_step, ppo_init
from ..config import EnvConfig, PPOConfig, TrainConfig
from ..utils import CSVLogger, JSONLLogger, TRAIN_LOG_HEADER, save_params


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--size", type=int, default=128, help="hidden width N")
    p.add_argument("--updates", type=int, default=2000)
    p.add_argument("--num-envs", type=int, default=1024)
    p.add_argument("--rollout-steps", type=int, default=128)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--k-epochs", type=int, default=10)
    p.add_argument("--eval-every", type=int, default=5)
    p.add_argument("--eval-episodes", type=int, default=40)
    p.add_argument("--robust", action="store_true", help="domain randomization + wind")
    p.add_argument(
        "--severity-sample", action="store_true",
        help="per-episode severity s~U[0,1] scaling all perturbations (each "
        "batch spans calm..windy, preventing calm forgetting; "
        "RandomizationConfig.severity_sample). Stage severity = upper bound.",
    )
    p.add_argument(
        "--task", type=str, default="hover", choices=("hover", "velocity"),
        help="hover = position/attitude stabilization (reference ppo.py); "
        "velocity = per-episode random velocity-target tracking (the "
        "reference's dedicated velocity controllers, "
        "results/seeds/velocity_training/)",
    )
    p.add_argument(
        "--vel-target-max", type=float, default=1.0,
        help="velocity task: per-axis target range U[-max, max] [m/s]",
    )
    p.add_argument(
        "--curriculum", type=str, default=None, metavar="S1,S2,...",
        help="calm->windy robust curriculum: comma list of severities in "
        "[0,1]; each stage trains for updates//len(stages) updates (the "
        "remainder extends the final stage) and scales the randomization "
        "magnitudes (RandomizationConfig.scaled). "
        "E.g. --robust --curriculum 0,0.33,0.66,1.0",
    )
    p.add_argument(
        "--inner", type=int, default=1,
        help="scan N train steps into one jitted program between host "
        "round-trips (agents.make_train_loop; docs/PERF.md round 3d). "
        "Clamped to gcd(--inner, --eval-every, per-stage updates) so chunks "
        "never straddle an eval point or a curriculum stage boundary. "
        "TRAINING semantics are identical to --inner 1 (bitwise, "
        "tests/test_ppo.py), but per-update LOGGING is chunk-granular: each "
        "CSV/JSONL row carries the chunk-final update's loss/metrics "
        "(episodes are summed over the chunk), and eval-gated decisions "
        "(--polish, solved stop) fire only at chunk boundaries.",
    )
    p.add_argument("--dp", type=int, default=0, help="data-parallel devices (0 = single)")
    p.add_argument("--out", type=str, default="runs/control")
    p.add_argument("--solved-threshold", type=float, default=0.95)
    p.add_argument(
        "--resume-from", type=str, default=None, metavar="CKPT",
        help="warm-start params from a .msgpack checkpoint (e.g. a "
        "seed-study solve) instead of a fresh init",
    )
    p.add_argument(
        "--polish", action="store_true",
        help="acceptance gate for matching the reference's committed RL "
        "same-start log (classical_controller_results/rl_log_same_start.npy "
        "= 100%%): at each eval also fly the 20 reference-seeded classical "
        "start states and stop only when that leg is 20/20 AND the eval "
        "solved rate holds 100%% AND an independent-key eval confirms >=95%%. "
        "Combine with --resume-from and a few hundred --updates.",
    )
    return p


def main(argv=None) -> dict:
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()
    args = build_parser().parse_args(argv)
    from ..config import RandomizationConfig

    vel_max = (
        (args.vel_target_max,) * 3 if args.task == "velocity" else (0.0, 0.0, 0.0)
    )

    def stage_env_cfg(severity: float) -> EnvConfig:
        return EnvConfig(
            n_steps=1000,
            randomization=RandomizationConfig(
                enabled=args.robust, severity_sample=args.severity_sample
            ).scaled(severity),
            vel_target_max=vel_max,
        )

    # Calm->windy curriculum (VERDICT r1 item 3): equal update slices per
    # severity stage; each stage recompiles once (static configs) and
    # re-resets the env batch while keeping params/optimizer state.
    if args.curriculum and args.robust:
        severities = [float(s) for s in args.curriculum.split(",")]
    else:
        severities = [1.0 if args.robust else 0.0]
    per_stage = max(args.updates // len(severities), 1)
    # In-jit multi-update chunking: clamp so a chunk never straddles an
    # eval point or a stage boundary (behavior stays identical to inner=1).
    inner = max(args.inner, 1)
    if inner > 1:
        inner = max(math.gcd(math.gcd(inner, args.eval_every), per_stage), 1)

    env_cfg = stage_env_cfg(severities[-1])  # full-severity (final) config
    ppo_cfg = PPOConfig(lr=args.lr, k_epochs=args.k_epochs)
    train_cfg = TrainConfig(
        num_envs=args.num_envs,
        rollout_steps=args.rollout_steps,
        network_size=args.size,
        updates=args.updates,
        eval_every=args.eval_every,
        eval_episodes=args.eval_episodes,
        seed=args.seed,
    )

    key = jax.random.PRNGKey(args.seed)
    mesh = None
    if args.dp > 0:
        from ..parallel import make_dp_mesh

        mesh = make_dp_mesh(args.dp)

    def build(cfg: EnvConfig, stage_key, carry_state=None):
        """(Re)build train_step/train_loop/eval_fn for a stage; keep
        params/opt from the carried state when present (env batch is
        re-reset under the new randomization config). Both the single step
        and the `inner`-chunk loop are lazy jits — only what the main loop
        actually calls gets compiled."""
        loop = None
        if mesh is not None:
            from ..parallel import (
                make_parallel_train_loop,
                make_parallel_train_step,
                ppo_init_sharded,
            )

            model, tx, state = ppo_init_sharded(stage_key, cfg, ppo_cfg, train_cfg, mesh)
            step = make_parallel_train_step(model, tx, cfg, ppo_cfg, train_cfg, mesh)
            if inner > 1:
                loop = make_parallel_train_loop(
                    model, tx, cfg, ppo_cfg, train_cfg, mesh, inner
                )
        else:
            model, tx, state = ppo_init(stage_key, cfg, ppo_cfg, train_cfg)
            step = jax.jit(make_train_step(model, tx, cfg, ppo_cfg, train_cfg))
            if inner > 1:
                loop = jax.jit(
                    make_train_loop(model, tx, cfg, ppo_cfg, train_cfg, inner)
                )
        if carry_state is not None:
            state = state.replace(
                params=carry_state.params,
                opt_state=carry_state.opt_state,
                update_i=carry_state.update_i,
            )
        # Evaluation always runs at FULL severity so curves are comparable
        # across stages (calm-stage policies just score worse early).
        eval_fn = jax.jit(make_eval_fn(model, env_cfg, episodes=args.eval_episodes))
        return model, state, step, loop, eval_fn

    stage_i = 0
    model, state, train_step, train_loop, eval_fn = build(
        stage_env_cfg(severities[0]), key
    )
    if args.resume_from:
        from ..utils import load_params

        state = state.replace(params=load_params(args.resume_from, state.params))
        print(f"resumed params from {args.resume_from}")

    # --polish: the 20 reference-seeded classical start states, flown with
    # the deterministic actor and scored by the reference analyzer's
    # success criterion (classical_compare.py; reference
    # results_analyzer.py:23-27). Built once; checked at every eval.
    polish_runner = None
    if args.polish:
        import numpy as _np

        from .classical_compare import analyze, make_rl_runner, reference_start_states

        polish_cfg = EnvConfig(
            n_steps=500, warmup=5, direct_control=True, training=False
        )
        polish_starts = jax.numpy.asarray(
            reference_start_states(), jax.numpy.float32
        )
        _rl_runner = make_rl_runner(polish_cfg, model)

        def polish_runner(params) -> float:
            log = _np.asarray(_rl_runner(params, polish_starts))
            return analyze(log, polish_cfg)["success_rate"]

    tag = f"{args.size}_{args.seed}"
    csv_log = CSVLogger(f"{args.out}/log_{tag}.csv", TRAIN_LOG_HEADER)
    jsonl = JSONLLogger(f"{args.out}/train_{tag}.jsonl")
    t0 = time.time()
    total_steps = 0
    total_eps_dev = None  # device-side accumulator: no per-update host sync
    last_eval = {}

    i = 0  # updates completed
    while i < args.updates:
        # i//per_stage = the stage of update i+1, so each stage trains for
        # exactly per_stage updates (any remainder from updates % stages
        # extends the final stage). `inner` divides per_stage, so a chunk
        # never straddles a stage boundary.
        next_stage = min(i // per_stage, len(severities) - 1)
        if next_stage != stage_i:
            stage_i = next_stage
            sev = severities[stage_i]
            print(f"== curriculum stage {stage_i}: severity {sev:.2f} ==")
            model, state, train_step, train_loop, eval_fn = build(
                stage_env_cfg(sev), jax.random.fold_in(key, 1000 + stage_i), state
            )
        if train_loop is not None and args.updates - i >= inner:
            # One device program for `inner` updates; logging reads the
            # final update's stacked metrics row (all device-side slices).
            state, stacked = train_loop(state)
            metrics = jax.tree.map(lambda x: x[-1], stacked)
            chunk_eps = jax.numpy.sum(stacked["episodes"])
            chunk = inner
        else:
            state, metrics = train_step(state)
            chunk_eps = metrics["episodes"]
            chunk = 1
        i += chunk
        total_steps += chunk * train_cfg.num_envs * train_cfg.rollout_steps
        total_eps_dev = (
            chunk_eps if total_eps_dev is None else total_eps_dev + chunk_eps
        )
        if i % args.eval_every == 0:
            total_eps = int(total_eps_dev)
            last_eval = {k: float(v) for k, v in eval_fn(state.params, jax.random.fold_in(key, i)).items()}
            hours = (time.time() - t0) / 3600.0
            now = datetime.now()
            csv_log.append({
                "LR": args.lr, "Max timesteps": env_cfg.n_steps,
                "Update timesteps": train_cfg.num_envs * train_cfg.rollout_steps,
                "K epochs": args.k_epochs, "Eval episodes": args.eval_episodes,
                "Std": ppo_cfg.action_std, "Date": now.strftime("%d/%m/%Y"),
                "Time": now.strftime("%H:%M:%S"), "Training Count": i,
                "T hours": round(hours, 4),
                "Reward avg": last_eval["eval_reward"],
                "Solved avg": last_eval["eval_solved"],
                "Time avg": last_eval["eval_length"],
                "Total Episodes": total_eps, "Total Timesteps": total_steps,
                "ETF": round(hours / i * (args.updates - i), 4),
            })
            jsonl.log(update=i, **last_eval, **{k: float(v) for k, v in metrics.items()})
            print(
                f"update {i:5d}  reward {last_eval['eval_reward']:8.2f}  "
                f"solved {last_eval['eval_solved']:6.1%}  len {last_eval['eval_length']:6.1f}  "
                f"steps/s {total_steps / (time.time() - t0):9.0f}"
            )
            save_params(f"{args.out}/untrained_networks/nn_{tag}.msgpack", state.params)
            # Robust runs gate on the station-keeping criterion (strict
            # stillness is unreachable under persistent 5 m/s gusts; see
            # make_eval_fn) — and only once the curriculum is at full
            # severity, so early calm stages can't end the run.
            solved_metric = (
                last_eval["eval_station_keeping"] if args.robust else last_eval["eval_solved"]
            )
            at_final_stage = stage_i == len(severities) - 1
            if args.polish:
                # Polish acceptance: 20/20 on the reference's same-start
                # classical leg AND 100% eval AND an independent-key
                # confirmation >= 95% (guards against a lucky eval batch).
                classical = polish_runner(state.params)
                print(f"  polish: classical leg {classical:.0%}")
                if classical >= 1.0 and last_eval["eval_solved"] >= 1.0:
                    confirm = float(
                        eval_fn(
                            state.params, jax.random.fold_in(key, 10**6 + i)
                        )["eval_solved"]
                    )
                    print(f"  polish: independent confirm {confirm:.1%}")
                    if confirm >= 0.95:
                        save_params(
                            f"{args.out}/solved/nn_solved_{tag}.msgpack", state.params
                        )
                        print("########## Polished: classical 20/20 + eval 100% ##########")
                        break
            elif at_final_stage and solved_metric >= args.solved_threshold:
                save_params(f"{args.out}/solved/nn_solved_{tag}.msgpack", state.params)
                print("########## Solved! ##########")
                break

    save_params(f"{args.out}/nn_final_{tag}.msgpack", state.params)
    return {"final_eval": last_eval, "total_steps": total_steps, "wall_s": time.time() - t0}


if __name__ == "__main__":
    main()
