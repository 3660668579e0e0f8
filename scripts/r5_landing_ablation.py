"""Round-5 landing ablation ladder: which product-config ingredient breaks
from-scratch training?

Context (runs/r5/landing_retrain): the round-4 42k-dec/s product config
(uint8 images + bf16 conv + shuffle_block == minibatch 1536) climbed to
~65% in-training solved by update ~5700 and then COLLAPSED to ~5% by
update 8000 — while both committed from-scratch runs under the round-1
config (f32 images, block 128) reached 100% on the official benchmark
(fixtures/landing_policy.msgpack, runs/landing_s3 @ 09457e8). VERDICT r4
missing #1 / weak #2 anticipated exactly this: the 160-update quality gate
was too thin for an 8000-update training reality.

Ladder (seed-controlled, one config per stage, all at 8000 updates,
128 envs x 24 decisions, --inner 10, eval every 100):

  blk128_s0  uint8 + bf16, shuffle_block=128, seed 0
             -> isolates the frozen-minibatch semantics (same dtypes as
                the collapsed run, only the shuffle differs)
  prod_s1    full product config, seed 1
             -> seed control: does the collapse replicate?
  reshuf_s0  product config + --reshuffle-update, seed 0
             -> candidate fix: fresh minibatch composition once per
                update (single row gather), contiguous slices in epochs

Any run whose BEST in-training eval reaches >=90% gets the official
100-episode eval-mode benchmark (reference protocol:
rl_eval_worker.py:43,350-354) on eval seeds 0 and 7, f32 conv, using the
best-eval checkpoint (reference saves at solve, controller/ppo.py:428-429).

Resumable: a stage with a summary entry in OUT/summary.json is skipped.
Run:  python -u scripts/r5_landing_ablation.py > /tmp/r5_abl.log 2>&1
"""

from __future__ import annotations

import json
import os
import time

OUT = "runs/r5/ablation"
CTRL = "autonomous_quadrotor_environment_tpu/fixtures/nn_solved_128_0.msgpack"
UPDATES = 8000

# Round-5 mid-ladder postmortem (first frozen-std pass, archived at
# runs/r5/ablation/blk128_s0_frozenstd + runs/r5/landing_retrain): BOTH the
# product config and the block-128 control degraded after peaking — and
# both showed entropy frozen at exactly -2.625 for every update. Root
# cause found and fixed (landing/networks.py): log_std was created with
# the bf16 COMPUTE dtype, so every lr=2e-5 Adam update rounded to zero —
# the learned std has been silently frozen in every bf16 run since round
# 3, while the healthy f32 fixture runs adapt it (-2.62 -> -2.18). The
# ladder now leads with the product config under the fix; the diagnosis
# stages below it only run if that still fails.
STAGES = [
    ("prod_s0", ["--seed", "0"]),
    ("reshuf_s0", ["--reshuffle-update", "--seed", "0"]),
    # The reference's EXACT shuffle semantics (per-epoch randperm as one
    # amortized gather, PPOConfig.reshuffle_per_epoch) — the ship
    # candidate after blk128 proved per-epoch remixing is what converges.
    ("exact_s0", ["--reshuffle-epoch", "--seed", "0"]),
    ("blk128_s0", ["--shuffle-block", "128", "--seed", "0"]),
    # f32 per-row control: the original fixture's exact dtypes — decides
    # whether the remaining few benchmark points vs the old 100%/98% are
    # a uint8/bf16 quality cost or run noise.
    ("f32_s0", ["--image-dtype", "f32", "--conv-dtype", "f32",
                "--shuffle-block", "1", "--seed", "0"]),
    # f32_s0 certified 99/98 (the shipped-fixture class) while every
    # uint8+bf16 arm fell short regardless of shuffle semantics (frozen
    # 74/81, blk128 89/94, exact best 55, perupd best 80) — the
    # destabilizer is the reduced-precision stack, not the shuffle.
    # Factorial isolation at the certified per-row shuffle:
    ("bf16conv_s0", ["--image-dtype", "f32", "--conv-dtype", "bf16",
                     "--shuffle-block", "1", "--seed", "0"]),
    ("u8img_s0", ["--image-dtype", "uint8", "--conv-dtype", "f32",
                  "--shuffle-block", "1", "--seed", "0"]),
    # Both factorial arms certified 99/98 — but they ALSO moved to the
    # per-row shuffle, so the uint8+bf16 combination was never tested
    # with it. The missing cell (and the fastest possible certified
    # default if it passes):
    ("u8bf16perrow_s0", ["--image-dtype", "uint8", "--conv-dtype", "bf16",
                         "--shuffle-block", "1", "--seed", "0"]),
    # Space-to-depth under the certified defaults (f32 img + bf16 conv +
    # per-row): isomorphic weights, +~12-14%% step speed
    # (runs/r5/landing_conv_probe.json); certified end-to-end here so the
    # fast layout can ship as more than a flag.
    ("s2d_cert_s0", ["--conv-s2d", "--seed", "0"]),
]

# If one of these full-speed candidate configs reaches this on the
# official benchmark (both eval seeds), it becomes the product default and
# the remaining diagnosis stages are skipped (reference bar: 93.5%;
# shipped fixture bar: 100%/98%).
CERTIFY_SOLVED = 0.93
CANDIDATES = ()  # factorial arms: both must run; no early break


def load_summary() -> dict:
    path = os.path.join(OUT, "summary.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}


def save_summary(s: dict) -> None:
    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, "summary.json")
    with open(path + ".tmp", "w") as f:
        json.dump(s, f, indent=1)
    os.replace(path + ".tmp", path)


def official_benchmark(policy_path: str, s2d: bool = False) -> dict:
    """100-episode eval-mode benchmark on eval seeds 0 and 7, f32 conv."""
    import jax
    import jax.numpy as jnp

    from autonomous_quadrotor_environment_tpu.apps.train_landing import load_controller
    from autonomous_quadrotor_environment_tpu.landing import (
        LandingActorCritic,
        make_landing_eval_fn,
    )
    from autonomous_quadrotor_environment_tpu.landing.env import LandingConfigs
    from autonomous_quadrotor_environment_tpu.utils import load_params

    ctrl_model, ctrl_params = load_controller(CTRL, 128)
    cfgs = LandingConfigs.default(training=False)
    model = LandingActorCritic(conv_s2d=s2d)
    template = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 84, 84, 3)), jnp.zeros((1, 75)),
        jnp.zeros((1, 3)),
    )
    params = load_params(policy_path, template)
    eval_fn = jax.jit(make_landing_eval_fn(model, cfgs, ctrl_model, ctrl_params, 100))
    out = {}
    for seed in (0, 7):
        res = {k: float(v) for k, v in eval_fn(params, jax.random.PRNGKey(seed)).items()}
        out[f"seed{seed}"] = res
        print(f"  benchmark seed {seed}: {res}", flush=True)
    return out


def main() -> None:
    from autonomous_quadrotor_environment_tpu.apps.train_landing import main as train_main

    summary = load_summary()
    for name, extra in STAGES:
        if name in summary:
            print(f"== {name}: already done, skipping", flush=True)
            continue
        print(f"== {name}: training {UPDATES} updates", flush=True)
        seed = extra[extra.index("--seed") + 1]
        out_dir = f"{OUT}/{name}"
        argv = [
            "--controller", CTRL, "--updates", str(UPDATES),
            "--num-envs", "128", "--rollout-steps", "24",
            "--inner", "10", "--eval-every", "100",
            "--out", out_dir,
        ] + extra
        t0 = time.time()
        res = train_main(argv)
        entry = {
            "final_eval": res["final_eval"],
            "best_eval_solved": res["best_eval_solved"],
            "train_wall_s": round(time.time() - t0, 1),
            "argv": argv,
        }
        if res["best_eval_solved"] >= 0.9:
            best_path = f"{out_dir}/PPO_landing_best_{seed}.msgpack"
            print(f"== {name}: best {res['best_eval_solved']:.0%} -> official benchmark", flush=True)
            entry["official_benchmark"] = official_benchmark(
                best_path, s2d="--conv-s2d" in extra
            )
        summary[name] = entry
        save_summary(summary)
        print(f"== {name}: done {json.dumps(entry)[:400]}", flush=True)
        bm = entry.get("official_benchmark")
        if name in CANDIDATES and bm and all(
            bm[s]["eval_solved"] >= CERTIFY_SOLVED for s in ("seed0", "seed7")
        ):
            print(
                f"== candidate {name} certified on the official benchmark; "
                "skipping remaining diagnosis stages", flush=True,
            )
            break
    print("ablation ladder complete", flush=True)


if __name__ == "__main__":
    main()
