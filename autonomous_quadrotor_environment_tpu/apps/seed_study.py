"""Multi-seed controller-training robustness study.

Capability match for the reference's 30-seed velocity-training study
(reference: environment/controller/results/seeds/velocity_training/ — 30
committed seed checkpoints — analyzed by logger_analyzer.py:45-97:
episodes-until-solution and total-flight-hours-until-solution with
1-sigma spreads). Each seed runs the standard train_control loop with
early stop at the solved threshold; the per-seed CSV logs then yield the
same aggregate statistics and distribution figure.

    python -m autonomous_quadrotor_environment_tpu.apps.seed_study \
        --seeds 30 --out runs/seed_study
"""

from __future__ import annotations

import argparse
import json
import os

from . import train_control
from ..analysis.training_logs import episodes_to_solve, flight_hours_to_solve


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--seeds", type=int, default=30)
    p.add_argument("--start-seed", type=int, default=0)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--updates", type=int, default=2000)
    p.add_argument("--num-envs", type=int, default=1024)
    p.add_argument("--rollout-steps", type=int, default=128)
    p.add_argument("--eval-every", type=int, default=10)
    p.add_argument("--out", type=str, default="runs/seed_study")
    p.add_argument(
        "--task", type=str, default="hover", choices=("hover", "velocity"),
        help="velocity = the reference's actual 30-seed task family "
        "(results/seeds/velocity_training/, logger_analyzer.py:51-97)",
    )
    p.add_argument("--vel-target-max", type=float, default=1.0)
    p.add_argument("--reward-threshold", type=float, default=None,
                   help="episodes_to_solve eval-reward gate; default uses "
                   "the solved-fraction stop in train_control")
    return p


def aggregate(out_dir: str, size: int, seeds: list[int], dt: float = 0.01) -> dict:
    """Episodes/flight-hours-to-solve across seeds (reference
    logger_analyzer.py:91-97 prints mean +/- 1 sigma of both)."""
    import numpy as np

    eps, hours, unsolved = [], [], []
    for s in seeds:
        path = f"{out_dir}/log_{size}_{s}.csv"
        if not os.path.exists(path):
            unsolved.append(s)
            continue
        e = episodes_to_solve(path, solved_threshold=0.95)
        h = flight_hours_to_solve(path, dt=dt, solved_threshold=0.95)
        if e is None:
            unsolved.append(s)
        else:
            eps.append(e)
            hours.append(h)
    summary = {
        "seeds": len(seeds),
        "solved_seeds": len(eps),
        "unsolved_seeds": unsolved,
        "episodes_to_solve_mean": float(np.mean(eps)) if eps else None,
        "episodes_to_solve_std": float(np.std(eps)) if eps else None,
        "flight_hours_mean": float(np.mean(hours)) if hours else None,
        "flight_hours_std": float(np.std(hours)) if hours else None,
        "episodes_to_solve": eps,
        "flight_hours": hours,
    }
    return summary


def plot_distribution(summary: dict, out_path: str) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    eps = summary["episodes_to_solve"]
    if not eps:
        return
    fig, axs = plt.subplots(1, 2, figsize=(9, 3.5))
    axs[0].hist(eps, bins=10, color="tab:blue", alpha=0.8)
    axs[0].set_xlabel("episodes until solved")
    axs[0].set_ylabel("seeds")
    axs[0].grid(True, alpha=0.3)
    axs[1].hist(summary["flight_hours"], bins=10, color="tab:orange", alpha=0.8)
    axs[1].set_xlabel("simulated flight hours until solved")
    axs[1].grid(True, alpha=0.3)
    fig.suptitle(
        f"{summary['solved_seeds']}/{summary['seeds']} seeds solved; "
        f"episodes {summary['episodes_to_solve_mean']:.0f}"
        f"±{summary['episodes_to_solve_std']:.0f}, "
        f"flight {summary['flight_hours_mean']:.2f}"
        f"±{summary['flight_hours_std']:.2f} h"
    )
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)


def main(argv=None) -> dict:
    args = build_parser().parse_args(argv)
    os.makedirs(args.out, exist_ok=True)
    seeds = list(range(args.start_seed, args.start_seed + args.seeds))
    for s in seeds:
        print(f"===== seed {s} =====")
        # Resumable (CLAUDE.md tunnel rules): a seed whose CSV already shows
        # a solved/full run is skipped so a killed study restarts cleanly.
        csv_path = f"{args.out}/log_{args.size}_{s}.csv"
        if os.path.exists(csv_path):
            if episodes_to_solve(csv_path, solved_threshold=0.95) is not None:
                print(f"(seed {s} already solved, skipping)")
                continue
            os.remove(csv_path)
            stale = f"{args.out}/train_{args.size}_{s}.jsonl"
            if os.path.exists(stale):
                os.remove(stale)
        train_control.main([
            "--seed", str(s), "--size", str(args.size),
            "--updates", str(args.updates), "--num-envs", str(args.num_envs),
            "--rollout-steps", str(args.rollout_steps),
            "--task", args.task, "--vel-target-max", str(args.vel_target_max),
            "--eval-every", str(args.eval_every), "--out", args.out,
        ])
    summary = aggregate(args.out, args.size, seeds)
    with open(f"{args.out}/summary.json", "w") as f:
        json.dump(summary, f, indent=2)
    plot_distribution(summary, f"{args.out}/seed_study.png")
    print(json.dumps({k: v for k, v in summary.items()
                      if not isinstance(v, list)}, indent=2))
    return summary


if __name__ == "__main__":
    main()
