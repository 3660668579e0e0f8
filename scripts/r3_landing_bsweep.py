"""Round-3e probe: landing-trainer batch-size scaling (timing only).

The landing bench shape (128 envs x 24 decisions) matches the trained
config; the state trainer's equivalent sweep (runs/r3/bf16_probe.json)
found its update at the linear asymptote by 8192 envs. This measures where
the landing step (render + sensors + hierarchical control + K=5 CNN update)
sits on that curve: decisions/s at B in {64, 128, 256, 512}, bf16 conv
compute + bf16-stored images, scanned loop of 3 updates, amortized fence.
Timing only — training quality at other batch sizes is NOT claimed (the
shipped fixture was trained at 128). Writes runs/r3/landing_bsweep.json.
"""

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
OUT = "runs/r3/landing_bsweep.json"


def main():
    print("devices:", jax.devices(), flush=True)
    T = 24
    ctrl_model, ctrl_params = load_controller(FIXTURE_CTRL, 128)
    cfgs = LandingConfigs.default(training=True)
    res = {}
    os.makedirs("runs/r3", exist_ok=True)

    for B in (64, 128, 256, 512):
        # Keep the K-epoch structure constant: minibatch = half the batch,
        # like the bench/train config (1536 of 3072 at B=128).
        cfg = PPOConfig.landing_variant()
        import dataclasses

        cfg = dataclasses.replace(
            cfg, minibatch_size=B * T // 2, shuffle_block=min(768, B * T // 4)
        )
        model, tx, state = landing_ppo_init(
            jax.random.PRNGKey(0), cfgs, cfg, B, ctrl_model, ctrl_params,
            conv_dtype=jnp.bfloat16,
        )
        loop = jax.jit(
            make_landing_train_loop(
                model, tx, cfgs, cfg, ctrl_model, ctrl_params, T, 3,
                image_dtype=jnp.bfloat16,
            )
        )
        state, m = loop(state)
        float(m["loss"][-1])  # compile + warm
        t0 = time.perf_counter()
        n_outer = 2
        for _ in range(n_outer):
            state, m = loop(state)
        float(m["loss"][-1])
        dt = time.perf_counter() - t0
        ms = dt / (n_outer * 3) * 1e3
        res[f"B{B}"] = {
            "ms_per_update": round(ms, 1),
            "decisions_per_s": round(B * T / (ms / 1e3)),
            "loss_finite": bool(jnp.isfinite(m["loss"][-1])),
        }
        print(f"B={B}: {res[f'B{B}']}", flush=True)
        with open(OUT, "w") as f:
            json.dump(res, f, indent=2)
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
