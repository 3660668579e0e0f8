"""Network-size sweep: the reference's headline experiment, one command.

Capability match for the reference's 5-sizes x 4-seeds training-log grid
(reference: environment/controller/training_log/log_{016..256}_{8000..
32000}_*.csv — 20 cluster runs — analyzed into mean±std reward bands by
training_log/csv_reader.py:17-69). Each size trains its seeds either
serially (train_control per seed) or STACKED — all seeds of a size as one
compiled program (`--stacked`, apps/stacked.py) — then the band figure and
per-size aggregates are written.

    python -m autonomous_quadrotor_environment_tpu.apps.size_sweep \
        --stacked --out runs/sweep
"""

from __future__ import annotations

import argparse
import json
import os

from ..analysis.training_logs import episodes_to_solve


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--sizes", type=str, default="16,32,64,128,256")
    p.add_argument("--seeds", type=int, default=4, help="seeds per size")
    p.add_argument("--updates", type=int, default=2500)
    p.add_argument("--num-envs", type=int, default=256)
    p.add_argument("--rollout-steps", type=int, default=32)
    p.add_argument("--eval-every", type=int, default=50)
    p.add_argument("--eval-episodes", type=int, default=40)
    p.add_argument("--solved-threshold", type=float, default=0.95)
    p.add_argument("--out", type=str, default="runs/sweep")
    p.add_argument(
        "--stacked", action="store_true",
        help="train each size's seeds simultaneously as one compiled "
        "program (apps/stacked.py)",
    )
    p.add_argument(
        "--figure", type=str, default="docs/size_sweep_reward.png",
        help="band-figure output path (reference csv_reader.py figure)",
    )
    return p


def run_done(csv_path: str, updates: int, solved_threshold: float) -> bool:
    """A run is complete if it solved or exhausted the update budget."""
    if not os.path.exists(csv_path):
        return False
    if episodes_to_solve(csv_path, solved_threshold=solved_threshold) is not None:
        return True
    import csv as _csv

    with open(csv_path) as f:
        rows = list(_csv.DictReader(f))
    return bool(rows) and int(float(rows[-1]["Training Count"])) >= updates


def sweep_size(args, size: int, todo: list[int]) -> None:
    for seed in todo:
        for stale in (f"{args.out}/log_{size}_{seed}.csv",
                      f"{args.out}/train_{size}_{seed}.jsonl"):
            if os.path.exists(stale):
                os.remove(stale)
    if args.stacked:
        from ..config import EnvConfig, PPOConfig, TrainConfig
        from .stacked import StackedCell, run_stacked_study

        os.makedirs(f"{args.out}/solved", exist_ok=True)
        cells = [
            StackedCell(
                seed=s,
                csv_path=f"{args.out}/log_{size}_{s}.csv",
                jsonl_path=f"{args.out}/train_{size}_{s}.jsonl",
                ckpt_path=f"{args.out}/nn_final_{size}_{s}.msgpack",
                # save-at-solve snapshot (serial train_control layout)
                solved_ckpt_path=f"{args.out}/solved/nn_solved_{size}_{s}.msgpack",
            )
            for s in todo
        ]
        run_stacked_study(
            cells, EnvConfig(n_steps=1000), PPOConfig(),
            TrainConfig(
                num_envs=args.num_envs, rollout_steps=args.rollout_steps,
                network_size=size, updates=args.updates,
                eval_every=args.eval_every, eval_episodes=args.eval_episodes,
            ),
            updates=args.updates, eval_every=args.eval_every,
            eval_episodes=args.eval_episodes,
            solved_threshold=args.solved_threshold,
        )
    else:
        from . import train_control

        for seed in todo:
            train_control.main([
                "--seed", str(seed), "--size", str(size),
                "--updates", str(args.updates),
                "--num-envs", str(args.num_envs),
                "--rollout-steps", str(args.rollout_steps),
                "--eval-every", str(args.eval_every),
                "--eval-episodes", str(args.eval_episodes),
                "--inner", str(args.eval_every), "--out", args.out,
            ])


def main(argv=None) -> dict:
    args = build_parser().parse_args(argv)
    sizes = [int(x) for x in args.sizes.split(",")]
    seeds = list(range(args.seeds))
    os.makedirs(args.out, exist_ok=True)
    for size in sizes:
        todo = [
            s for s in seeds
            if not run_done(f"{args.out}/log_{size}_{s}.csv", args.updates,
                            args.solved_threshold)
        ]
        if not todo:
            print(f"(size {size}: all seeds complete, skipping)")
            continue
        print(f"===== size {size} seeds {todo}"
              f"{' (stacked)' if args.stacked else ''} =====")
        sweep_size(args, size, todo)
    from ..analysis.plots import sweep_band_figure

    summary = sweep_band_figure(args.out, sizes, seeds, args.figure)
    with open(f"{args.out}/summary.json", "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))
    return summary


if __name__ == "__main__":
    main()
