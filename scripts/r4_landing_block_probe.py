"""Round-4 probe: landing update shuffle-block x image-dtype grid.

VERDICT r3 next #5: the landing profile (runs/r3/landing_profile.json)
charges ~42 ms of the 133 ms f32 update to the per-epoch minibatch image
gather at ~31 GB/s effective — far under HBM peak, i.e. the gather's chunk
size matters as much as its byte count. This measures the full grid:
shuffle_block in {128 (bench default), 384, 768, 1536 (= minibatch, one
chunk)} x image storage in {bf16 (shipped), uint8} at the bench shape
(128 envs x 24 decisions, bf16 conv compute, scanned loop of 3, amortized
fence). Timing only; uint8 QUALITY is gated separately by
scripts/r3_u8_probe.py. Writes runs/r4/landing_block_probe.json.
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
    make_landing_train_loop,
)

FIXTURE_CTRL = (
    "autonomous_quadrotor_environment_tpu/fixtures/nn_solved_128_0.msgpack"
)
OUT = "runs/r4/landing_block_probe.json"


def main():
    print("devices:", jax.devices(), flush=True)
    B, T, inner = 128, 24, 3
    ctrl_model, ctrl_params = load_controller(FIXTURE_CTRL, 128)
    cfgs = LandingConfigs.default(training=True)
    res = {}
    os.makedirs("runs/r4", exist_ok=True)

    def flush():
        with open(OUT, "w") as f:
            json.dump(res, f, indent=2)

    for img_name, img in (("bf16", jnp.bfloat16), ("u8", jnp.uint8)):
        for block in (128, 384, 768, 1536):
            cfg = dataclasses.replace(
                PPOConfig.landing_variant(), shuffle_block=block
            )
            model, tx, state = landing_ppo_init(
                jax.random.PRNGKey(0), cfgs, cfg, B, ctrl_model, ctrl_params,
                conv_dtype=jnp.bfloat16,
            )
            loop = jax.jit(
                make_landing_train_loop(
                    model, tx, cfgs, cfg, ctrl_model, ctrl_params, T, inner,
                    image_dtype=img,
                )
            )
            state, m = loop(state)
            float(m["loss"][-1])
            t0 = time.time()
            n_outer = 2
            for _ in range(n_outer):
                state, m = loop(state)
            float(m["loss"][-1])
            dt = (time.time() - t0) / (n_outer * inner)
            key = f"{img_name}_block{block}"
            res[key] = {
                "ms_per_update": round(dt * 1e3, 1),
                "decisions_per_s": round(B * T / dt, 0),
            }
            print(json.dumps({key: res[key]}), flush=True)
            flush()
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
