"""Round-5 landing conv-MXU probe (VERDICT r4 next #2).

The round-4 committed landing profile predates bf16 conv + the gather
kill, and the "conv-bound at ~50% ceiling" claim was an inference. This
script (a) re-traces the CURRENT product-config step with jax.profiler
(committed under docs/profile/landing_r5/), and (b) measures the two
conv levers on the full train step:

  - space-to-depth first conv (ConvTrunk.space_to_depth: isomorphic
    weights, 48 input channels instead of 3 against the MXU's 128-lane
    contraction padding; pinned in tests/test_landing.py)
  - batch 256 vs 128 (the round-4 B=256 rider measured 42.5k — decide
    the bench shape with data)

Grid: {plain, s2d} x {B=128, B=256} at the product config (uint8 images,
bf16 conv, shuffle_block = minibatch), scanned loop of 3, amortized
fence. Writes runs/r5/landing_conv_probe.json.
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
OUT = "runs/r5/landing_conv_probe.json"
TRACE_DIR = "docs/profile/landing_r5"


def build_loop(cfgs, ctrl_model, ctrl_params, B, T, inner, s2d, exact=False,
               block=None, conv_dtype=jnp.bfloat16, image_dtype=jnp.uint8):
    import dataclasses

    ppo_cfg = PPOConfig.landing_variant()
    if exact:
        ppo_cfg = dataclasses.replace(ppo_cfg, reshuffle_per_epoch=True)
    if block is not None:
        ppo_cfg = dataclasses.replace(ppo_cfg, shuffle_block=block)
    model, tx, state = landing_ppo_init(
        jax.random.PRNGKey(0), cfgs, ppo_cfg, B, ctrl_model, ctrl_params,
        conv_dtype=conv_dtype, conv_s2d=s2d,
    )
    loop = jax.jit(
        make_landing_train_loop(
            model, tx, cfgs, ppo_cfg, ctrl_model, ctrl_params, T, inner,
            image_dtype=image_dtype,
        )
    )
    return loop, state


def time_loop(loop, state, B, T, inner, n_outer=2):
    state, m = loop(state)
    float(m["loss"][-1])  # compile + warm
    t0 = time.time()
    for _ in range(n_outer):
        state, m = loop(state)
    float(m["loss"][-1])
    dt = (time.time() - t0) / (n_outer * inner)
    return {
        "ms_per_update": round(dt * 1e3, 1),
        "decisions_per_s": round(B * T / dt, 0),
    }, state


def main():
    print("devices:", jax.devices(), flush=True)
    T, inner = 24, 3
    ctrl_model, ctrl_params = load_controller(FIXTURE_CTRL, 128)
    cfgs = LandingConfigs.default(training=True)
    os.makedirs("runs/r5", exist_ok=True)
    res = {}

    def flush():
        with open(OUT, "w") as f:
            json.dump(res, f, indent=2)

    # (s2d, exact-reshuffle, batch) grid. "exact" = reshuffle_per_epoch:
    # the reference's per-epoch randperm as one amortized gather — the
    # quality-certified candidate from the round-5 ablation ladder; its
    # cost over the frozen-composition fast path is the number to know.
    grid = [
        # key, s2d, exact, B, extra-kwargs
        ("plain_B128", False, False, 128, {}),
        ("plain_B256", False, False, 256, {}),
        ("s2d_B128", True, False, 128, {}),
        ("s2d_B256", True, False, 256, {}),
        ("exact_B128", False, True, 128, {}),
        ("exact_B256", False, True, 256, {}),
        ("exact_s2d_B128", True, True, 128, {}),
        ("exact_s2d_B256", True, True, 256, {}),
        # quality-ladder finalists, eval-free clean timing:
        ("f32_perrow_B128", False, False, 128,
         dict(block=1, conv_dtype=jnp.float32, image_dtype=None)),
        ("u8_blk128_B128", False, False, 128, dict(block=128)),
        ("f32img_bf16conv_perrow_B128", False, False, 128,
         dict(block=1, conv_dtype=jnp.bfloat16, image_dtype=None)),
        ("f32_perrow_s2d_B128", True, False, 128,
         dict(block=1, conv_dtype=jnp.float32, image_dtype=None)),
        # f32 images + bf16 conv under the reference-exact amortized
        # shuffle — the default candidate if the bf16conv factorial arm
        # certifies (exact-1536 is distributionally identical to per-row,
        # tests/test_landing instrumentation + landing/ppo.py).
        ("f32img_bf16conv_exact_B128", False, True, 128,
         dict(conv_dtype=jnp.bfloat16, image_dtype=None)),
        ("f32img_bf16conv_exact_s2d_B128", True, True, 128,
         dict(conv_dtype=jnp.bfloat16, image_dtype=None)),
    ]
    for key, s2d, exact, B, extra in grid:
        loop, state = build_loop(
            cfgs, ctrl_model, ctrl_params, B, T, inner, s2d, exact=exact, **extra
        )
        res[key], state = time_loop(loop, state, B, T, inner)
        print(json.dumps({key: res[key]}), flush=True)
        flush()
        # Fresh profiler trace of the PRODUCT config (plain, B=128).
        if key == "plain_B128":
            os.makedirs(TRACE_DIR, exist_ok=True)
            with jax.profiler.trace(TRACE_DIR):
                state, m = loop(state)
                float(m["loss"][-1])
            print(f"trace written to {TRACE_DIR}", flush=True)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
