"""End-to-end PPO training throughput benchmark.

Measures env-steps/second of the fused rollout+update train step on the
default device (TPU under the driver; CPU elsewhere) and compares against
the reference's end-to-end CPU training throughput of ~300 env-steps/s
(BASELINE.md: 14.22M steps in 47,809 s with 2 multiprocessing workers,
training_log/log_128_32000….csv final row).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

import jax

# Persistent compilation cache: repeated bench runs (and the driver's) skip
# the 20s-to-minutes tunnel compile when the executable is unchanged.
os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINE_STEPS_PER_S = 300.0  # reference end-to-end (BASELINE.md)


def main() -> None:
    from autonomous_quadrotor_environment_tpu.agents import make_train_step, ppo_init
    from autonomous_quadrotor_environment_tpu.config import EnvConfig, PPOConfig, TrainConfig

    platform = jax.devices()[0].platform
    # Reference-equivalent training shape: 1000-step episodes, K=10 epochs,
    # N=128 network, ~5k steps per update scaled up to fill the chip.
    # Sweep (RESULTS.md): 2048x256 with 128k minibatches is the measured
    # optimum (~1.44M steps/s, 21s compile); full-batch updates compile ~9x
    # slower for less throughput.
    if platform == "tpu":
        num_envs, rollout_steps, minibatch = 2048, 256, 131072
    else:
        num_envs, rollout_steps, minibatch = 256, 64, 0

    env_cfg = EnvConfig(n_steps=1000)
    ppo_cfg = PPOConfig(k_epochs=10, minibatch_size=minibatch)
    train_cfg = TrainConfig(
        num_envs=num_envs, rollout_steps=rollout_steps, network_size=128
    )
    model, tx, state = ppo_init(jax.random.PRNGKey(0), env_cfg, ppo_cfg, train_cfg)
    train_step = jax.jit(make_train_step(model, tx, env_cfg, ppo_cfg, train_cfg))

    # Warmup/compile. NOTE: timing fences on a host VALUE fetch each
    # iteration — over the remote-TPU (axon) tunnel, block_until_ready can
    # return before remote execution finishes, so only fetched scalars are a
    # trustworthy fence.
    state, metrics = train_step(state)
    float(metrics["loss"])

    n_iters = 5 if platform == "tpu" else 3
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, metrics = train_step(state)
        float(metrics["loss"])
    dt = time.perf_counter() - t0

    steps = n_iters * num_envs * rollout_steps
    steps_per_s = steps / dt
    print(
        json.dumps(
            {
                "metric": "ppo_train_env_steps_per_s",
                "value": round(steps_per_s, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(steps_per_s / BASELINE_STEPS_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
