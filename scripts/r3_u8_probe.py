"""Round-3e probe: uint8 rollout-image storage for the landing trainer.

The landing update's dominant HBM stream is the per-epoch minibatch gather
of the (T*B, 84, 84, 3) image tensor (docs/profile/landing: ~42 ms f32 of
the 112 ms update; bf16 storage halved it). Pixels live in [0,1], so a
round-to-255 uint8 grid has quantization error comparable to bf16's 8-bit
mantissa while moving 1 byte/pixel — half of bf16, a quarter of f32.

Stages (one TPU process, results flushed incrementally):
  1. timing: bf16-stored vs u8-stored images at the bench shape 128x24
     (both with bf16 conv compute + shuffle_block 768);
  2. quality gate: 80-update same-seed learning curves, u8 vs the shipped
     bf16 (compare against runs/r3/landing_opt.json learn_f32/learn_bf16img).
Writes runs/r3/landing_u8.json.
"""

import dataclasses
import json
import os
import time

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
OUT = "runs/r3/landing_u8.json"


def main():
    print("devices:", jax.devices(), flush=True)
    B, T = 128, 24
    ctrl_model, ctrl_params = load_controller(FIXTURE_CTRL, 128)
    cfgs = LandingConfigs.default(training=True)
    cfg = dataclasses.replace(PPOConfig.landing_variant(), shuffle_block=768)
    res = {}
    os.makedirs("runs/r3", exist_ok=True)

    def flush():
        with open(OUT, "w") as f:
            json.dump(res, f, indent=2)

    for name, img in [("bf16img", jnp.bfloat16), ("u8img", jnp.uint8)]:
        model, tx, state = landing_ppo_init(
            jax.random.PRNGKey(0), cfgs, cfg, B, ctrl_model, ctrl_params,
            conv_dtype=jnp.bfloat16,
        )
        step = jax.jit(make_landing_train_step(
            model, tx, cfgs, cfg, ctrl_model, ctrl_params, T, image_dtype=img,
        ))
        state, m = step(state)
        float(m["loss"])
        t0 = time.time()
        for _ in range(5):
            state, m = step(state)
        loss = float(m["loss"])  # value fence after the chain
        dt = (time.time() - t0) / 5
        res[name] = {
            "ms_per_update": round(dt * 1e3, 1),
            "decisions_per_s": round(B * T / dt, 0),
            "loss_after_6": loss,
        }
        print(json.dumps({name: res[name]}), flush=True)
        flush()

    # Quality gate: 80-update same-seed learning curves (seed 7 matches
    # runs/r3/landing_opt.json's learn_f32 / learn_bf16img rows).
    def short_train(img):
        model, tx, state = landing_ppo_init(
            jax.random.PRNGKey(7), cfgs, cfg, B, ctrl_model, ctrl_params,
            conv_dtype=jnp.bfloat16,
        )
        step = jax.jit(make_landing_train_step(
            model, tx, cfgs, ctrl_model=ctrl_model, ctrl_params=ctrl_params,
            ppo_cfg=cfg, rollout_steps=T, image_dtype=img,
        ))
        rewards = []
        for i in range(80):
            state, m = step(state)
            if (i + 1) % 10 == 0:
                rewards.append(round(float(m["reward_per_decision"]), 4))
        return rewards

    res["learn_u8img"] = short_train(jnp.uint8)
    print(json.dumps({"learn_u8img": res["learn_u8img"]}), flush=True)
    flush()
    if os.path.exists("runs/r3/landing_opt.json"):
        with open("runs/r3/landing_opt.json") as f:
            prev = json.load(f)
        res["learn_f32_ref"] = prev.get("learn_f32")
        res["learn_bf16img_ref"] = prev.get("learn_bf16img")
        flush()
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
