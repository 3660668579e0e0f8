"""Trace the fully fused train step (rollout kernel -> associative GAE ->
transposed update kernel) at the bench shape; commit the trace under
docs/profile/fused_full/ for the attribution table in docs/PERF.md."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from autonomous_quadrotor_environment_tpu.agents import make_train_step, ppo_init
from autonomous_quadrotor_environment_tpu.config import EnvConfig, PPOConfig, TrainConfig

T, B = 256, 8192
env_cfg = EnvConfig(n_steps=1000)
ppo_cfg = PPOConfig(k_epochs=10, minibatch_size=T * B // 4, fused_update=True,
                    shuffle_block=1024)
train_cfg = TrainConfig(num_envs=B, rollout_steps=T, network_size=128,
                        fused_rollout=True)
model, tx, state = ppo_init(jax.random.PRNGKey(0), env_cfg, ppo_cfg, train_cfg)
step = jax.jit(make_train_step(model, tx, env_cfg, ppo_cfg, train_cfg))
state, metrics = step(state)
float(metrics["loss"])
out = "docs/profile/fused_full"
os.makedirs(out, exist_ok=True)
with jax.profiler.trace(out):
    for _ in range(2):
        state, metrics = step(state)
    float(metrics["loss"])
print("trace written to", out)
t0 = time.perf_counter()
for _ in range(10):
    state, metrics = step(state)
float(metrics["loss"])
print("post-trace e2e:", round((time.perf_counter() - t0) / 10 * 1e3, 1), "ms/update")
