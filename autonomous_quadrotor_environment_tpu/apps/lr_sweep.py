"""Learning-rate sweep: the reference's LR ablation, reproduced.

Capability match for the reference's lr_test experiment
(reference: environment/controller/training_log/lr_test/csv_reader_lr.py:
18-74 — 12 runs = LRs {1e-3, 5e-4, 1e-5} x 4 seeds, mean +/- sigma eval-
reward curves and a final summary table). Each run is the standard
train_control loop without early stop so curves are comparable.

    python -m autonomous_quadrotor_environment_tpu.apps.lr_sweep \
        --updates 1000 --out runs/lr_sweep
"""

from __future__ import annotations

import argparse
import json
import os

from . import train_control
from ..analysis.training_logs import _read_log

LRS = (1e-3, 5e-4, 1e-5)  # reference csv_reader_lr.py:21


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--lrs", type=str, default=",".join(str(lr) for lr in LRS))
    p.add_argument("--seeds", type=int, default=4, help="seeds per LR")
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--updates", type=int, default=1000)
    p.add_argument("--num-envs", type=int, default=1024)
    p.add_argument("--rollout-steps", type=int, default=128)
    p.add_argument("--eval-every", type=int, default=5)
    p.add_argument("--out", type=str, default="runs/lr_sweep")
    p.add_argument(
        "--stacked", action="store_true",
        help="train the entire LR x seed grid as ONE compiled program "
        "(apps/stacked.py: per-cell learning rates ride the optimizer "
        "state via optax.inject_hyperparams). Same per-cell PRNG streams, "
        "CSV schema, and no-early-stop full curves as the serial path",
    )
    return p


def _curves(out_dir: str, size: int, lr: float, seeds: int):
    import numpy as np

    rows_per_seed = []
    for s in seeds_range(lr, seeds):
        path = f"{out_dir}/lr_{lr:g}/log_{size}_{s}.csv"
        rows = _read_log(path)
        rows_per_seed.append([float(r["Reward avg"]) for r in rows])
    n = min(len(r) for r in rows_per_seed)
    arr = np.asarray([r[:n] for r in rows_per_seed])
    return arr.mean(axis=0), arr.std(axis=0)


def seeds_range(lr: float, seeds: int) -> range:
    return range(seeds)


def plot_sweep(out_dir: str, size: int, lrs, seeds: int, eval_every: int) -> dict:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    fig, ax = plt.subplots(figsize=(7, 5))
    summary = {}
    for lr in lrs:
        mean, std = _curves(out_dir, size, lr, seeds)
        x = np.arange(len(mean)) * eval_every
        ax.plot(x, mean, label=f"LR: {lr:g}")
        ax.fill_between(x, mean - std, mean + std, alpha=0.4)
        summary[f"{lr:g}"] = {
            "final_reward_mean": float(mean[-1]),
            "final_reward_std": float(std[-1]),
            "best_reward_mean": float(mean.max()),
        }
    ax.set_xlabel("training update")
    ax.set_ylabel("eval reward")
    ax.grid(True, alpha=0.3)
    ax.legend()
    fig.tight_layout()
    fig.savefig(f"{out_dir}/lr_sweep.png", dpi=150)
    plt.close(fig)
    return summary


def _incomplete_cells(args, lrs) -> list[tuple[float, int]]:
    """Resumable: a run whose CSV already holds the full curve is skipped,
    so a killed/stalled sweep restarts where it left off. Partial curves
    restart clean — including the JSONL (JSONLLogger appends, so a stale
    tail would read as one concatenated curve) and the in-progress
    checkpoint."""
    rows_done = args.updates // args.eval_every  # full run => this many rows
    todo = []
    for lr in lrs:
        for s in seeds_range(lr, args.seeds):
            csv_path = f"{args.out}/lr_{lr:g}/log_{args.size}_{s}.csv"
            if os.path.exists(csv_path):
                with open(csv_path) as f:
                    if sum(1 for _ in f) - 1 >= rows_done:
                        print(f"===== lr {lr:g} seed {s} (done, skipping) =====")
                        continue
                os.remove(csv_path)
                for stale in (
                    f"{args.out}/lr_{lr:g}/train_{args.size}_{s}.jsonl",
                    f"{args.out}/lr_{lr:g}/untrained_networks/nn_{args.size}_{s}.msgpack",
                ):
                    if os.path.exists(stale):
                        os.remove(stale)
            todo.append((lr, s))
    return todo


def main(argv=None) -> dict:
    args = build_parser().parse_args(argv)
    lrs = [float(x) for x in args.lrs.split(",")]
    os.makedirs(args.out, exist_ok=True)
    todo = _incomplete_cells(args, lrs)
    if args.stacked and todo:
        from ..config import EnvConfig, PPOConfig, TrainConfig
        from .stacked import StackedCell, run_stacked_study

        print(f"===== stacked LR sweep: {len(todo)} cells in one program =====")
        for lr, _s in todo:
            os.makedirs(f"{args.out}/lr_{lr:g}/untrained_networks", exist_ok=True)
        cells = [
            StackedCell(
                seed=s, lr=lr,
                csv_path=f"{args.out}/lr_{lr:g}/log_{args.size}_{s}.csv",
                jsonl_path=f"{args.out}/lr_{lr:g}/train_{args.size}_{s}.jsonl",
                ckpt_path=f"{args.out}/lr_{lr:g}/untrained_networks/nn_{args.size}_{s}.msgpack",
            )
            for lr, s in todo
        ]
        run_stacked_study(
            cells, EnvConfig(n_steps=1000), PPOConfig(),
            TrainConfig(
                num_envs=args.num_envs, rollout_steps=args.rollout_steps,
                network_size=args.size, updates=args.updates,
                eval_every=args.eval_every,
            ),
            updates=args.updates, eval_every=args.eval_every,
            eval_episodes=40,
            solved_threshold=1.1,  # never early-stop: full curves
        )
    else:
        for lr, s in todo:
            print(f"===== lr {lr:g} seed {s} =====")
            train_control.main([
                "--seed", str(s), "--size", str(args.size), "--lr", str(lr),
                "--updates", str(args.updates), "--num-envs", str(args.num_envs),
                "--rollout-steps", str(args.rollout_steps),
                "--eval-every", str(args.eval_every),
                "--solved-threshold", "1.1",  # never early-stop: full curves
                "--out", f"{args.out}/lr_{lr:g}",
            ])
    summary = plot_sweep(args.out, args.size, lrs, args.seeds, args.eval_every)
    with open(f"{args.out}/summary.json", "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))
    return summary


if __name__ == "__main__":
    main()
