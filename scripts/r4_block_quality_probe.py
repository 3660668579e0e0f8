"""Round-4 gate: does shuffle_block=1536 (fixed-minibatch fast path) learn?

The block grid (runs/r4/landing_block_probe.json) found a 1.66x cliff at
shuffle_block = minibatch = 1536: with mb // block == 1 the per-minibatch
image gather degenerates into a contiguous slice (landing/ppo.py:276-299),
eliminating the ~42 ms gather stream entirely (76 ms vs 126 ms/update).
The cost is optimization semantics: n=3072 time-major rows split into TWO
FIXED minibatches (first/last 12 decision-steps of all 128 envs) whose
composition never changes — only their order is permuted per epoch.

Gate (same methodology as scripts/r3_u8_probe.py / runs/r3/landing_opt.json):
same-seed (PRNGKey 7) 160-update learning curves at the bench shape
(128 x 24, bf16 conv compute), rewards every 10 updates. Candidates:
  * cand_u8_1536  — uint8 images + block 1536 (the proposed bench default)
  * cand_bf16_1536 — bf16 images + block 1536 (isolates the block effect)
compared against learn_bf16img_ref (block 768, runs/r3/landing_u8.json)
over the common first 8 points, plus each curve's own trend. PASS = max
|d reward| < 0.5 on the common points (the u8 gate's threshold) AND the
candidate's last-4-point mean is not more than 0.05 below the ref's.

Writes runs/r4/landing_block_quality.json. Reference being replaced:
/root/reference/visual_landing/ppo_trainer.py:150-204 (minibatch loader).

ROUND-5 POSTSCRIPT — this gate's conclusion did NOT survive a full
training run. ADVICE r4 called the 0.5 max-drift threshold weak (~3x the
whole reward range) and VERDICT r4 called 160 updates thin against an
8000-update reality; both were right: from-scratch training under
block == minibatch peaks at ~90% in-training / 74-81% on the official
benchmark and collapses late (runs/r5/ablation/prod_s0), vs the per-row
configs' 100%. Short-horizon same-seed curve gates measure "does it still
learn AT THE START", not "does it converge"; convergence-affecting
semantics changes need a full run to the official benchmark (which is how
round 5 re-decided this default — see runs/r5/ablation/summary.json).
"""

import dataclasses
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(REPO)
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from autonomous_quadrotor_environment_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from autonomous_quadrotor_environment_tpu.apps.train_landing import load_controller
from autonomous_quadrotor_environment_tpu.config import PPOConfig
from autonomous_quadrotor_environment_tpu.landing.env import LandingConfigs
from autonomous_quadrotor_environment_tpu.landing.ppo import (
    landing_ppo_init,
    make_landing_train_step,
)

FIXTURE_CTRL = (
    "autonomous_quadrotor_environment_tpu/fixtures/nn_solved_128_0.msgpack"
)
OUT = "runs/r4/landing_block_quality.json"
N_UPDATES = 160


def main():
    print("devices:", jax.devices(), flush=True)
    B, T = 128, 24
    ctrl_model, ctrl_params = load_controller(FIXTURE_CTRL, 128)
    cfgs = LandingConfigs.default(training=True)
    res = {}
    os.makedirs("runs/r4", exist_ok=True)

    def flush():
        with open(OUT, "w") as f:
            json.dump(res, f, indent=2)

    def curve(img, block):
        cfg = dataclasses.replace(
            PPOConfig.landing_variant(), shuffle_block=block
        )
        model, tx, state = landing_ppo_init(
            jax.random.PRNGKey(7), cfgs, cfg, B, ctrl_model, ctrl_params,
            conv_dtype=jnp.bfloat16,
        )
        step = jax.jit(make_landing_train_step(
            model, tx, cfgs, cfg, ctrl_model, ctrl_params, T, image_dtype=img,
        ))
        rewards = []
        for i in range(N_UPDATES):
            state, m = step(state)
            if (i + 1) % 10 == 0:
                rewards.append(round(float(m["reward_per_decision"]), 4))
        return rewards

    for name, img, block in (
        ("cand_u8_1536", jnp.uint8, 1536),
        ("cand_bf16_1536", jnp.bfloat16, 1536),
    ):
        res[name] = curve(img, block)
        print(json.dumps({name: res[name]}), flush=True)
        flush()

    # Timing rider: B=256 at block 1536 — n=6144 rows -> 4 minibatches of
    # one block each, so the contiguous-slice fast path still applies while
    # the epoch permutation has 4 blocks to shuffle (vs 2 at B=128).
    import time

    from autonomous_quadrotor_environment_tpu.landing.ppo import (
        make_landing_train_loop,
    )

    B2, inner, n_outer = 256, 3, 2
    cfg = dataclasses.replace(PPOConfig.landing_variant(), shuffle_block=1536)
    model, tx, state = landing_ppo_init(
        jax.random.PRNGKey(0), cfgs, cfg, B2, ctrl_model, ctrl_params,
        conv_dtype=jnp.bfloat16,
    )
    loop = jax.jit(make_landing_train_loop(
        model, tx, cfgs, cfg, ctrl_model, ctrl_params, T, inner,
        image_dtype=jnp.uint8,
    ))
    state, m = loop(state)
    float(m["loss"][-1])
    t0 = time.time()
    for _ in range(n_outer):
        state, m = loop(state)
    float(m["loss"][-1])
    dt = (time.time() - t0) / (n_outer * inner)
    res["timing_u8_1536_B256"] = {
        "ms_per_update": round(dt * 1e3, 1),
        "decisions_per_s": round(B2 * T / dt, 0),
    }
    flush()

    if os.path.exists("runs/r3/landing_u8.json"):
        with open("runs/r3/landing_u8.json") as f:
            prev = json.load(f)
        ref = prev.get("learn_bf16img_ref")
        res["ref_bf16_768"] = ref
        for name in ("cand_u8_1536", "cand_bf16_1536"):
            common = min(len(ref), len(res[name]))
            drift = max(
                abs(a - b) for a, b in zip(res[name][:common], ref[:common])
            )
            # Tail over the COMMON window (updates 50-80) — the candidate
            # curves run 2x longer, so their own tails aren't comparable.
            tail_gap = (sum(ref[common - 4:common]) / 4) - (
                sum(res[name][common - 4:common]) / 4
            )
            res[f"{name}_gate"] = {
                "max_drift_first8": round(drift, 4),
                "tail4_mean_gap_vs_ref": round(tail_gap, 4),
                "extended_tail4_mean": round(sum(res[name][-4:]) / 4, 4),
                "pass": bool(drift < 0.5 and tail_gap < 0.05),
            }
        flush()
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
