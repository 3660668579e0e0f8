"""Round-3 GAE probe: sequential reverse lax.scan vs associative_scan,
on the real chip at the bench shape (256, 8192), plus the end-to-end
bench-config train step. Flushes to runs/r3/gae_probe.json."""

import json
import os
import time

import jax
import jax.numpy as jnp

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from autonomous_quadrotor_environment_tpu.agents import make_train_step, ppo_init
from autonomous_quadrotor_environment_tpu.agents.gae import gae_advantages
from autonomous_quadrotor_environment_tpu.config import EnvConfig, PPOConfig, TrainConfig

RES = {}


def flush():
    os.makedirs("runs/r3", exist_ok=True)
    with open("runs/r3/gae_probe.json", "w") as f:
        json.dump(RES, f, indent=2)


T, B = 256, 8192
key = jax.random.PRNGKey(0)
kr, kv, kd = jax.random.split(key, 3)
rewards = jax.random.normal(kr, (T, B))
values = jax.random.normal(kv, (T, B))
dones = (jax.random.uniform(kd, (T, B)) < 0.01).astype(jnp.float32)
boot = jnp.zeros((B,))

gae_j = jax.jit(gae_advantages)
rets, advs = gae_j(rewards, values, dones, boot)
float(rets[0, 0])
N = 30
t0 = time.time()
for _ in range(N):
    rets, advs = gae_j(rewards, values, dones, boot)
loss = float(rets[0, 0]) + float(advs[0, 0])
dt = (time.time() - t0) / N
RES["gae_assoc_ms"] = round(dt * 1e3, 2)
print("assoc-scan GAE:", RES["gae_assoc_ms"], "ms (was 57.3 sequential)")
flush()

# end-to-end bench-config step
env_cfg = EnvConfig()
ppo_cfg = PPOConfig(k_epochs=10, minibatch_size=T * B // 4, fused_update=True)
train_cfg = TrainConfig(num_envs=B, rollout_steps=T, network_size=128)
model, tx, state = ppo_init(jax.random.PRNGKey(0), env_cfg, ppo_cfg, train_cfg)
step = jax.jit(make_train_step(model, tx, env_cfg, ppo_cfg, train_cfg))
state, m = step(state)
float(m["loss"])
N = 10
t0 = time.time()
for _ in range(N):
    state, m = step(state)
last = float(m["loss"])
dt = (time.time() - t0) / N
RES["e2e_ms_per_update"] = round(dt * 1e3, 1)
RES["e2e_env_steps_per_s"] = round(B * T / dt)
RES["e2e_loss"] = round(last, 4)
print("e2e:", RES["e2e_ms_per_update"], "ms/update,", RES["e2e_env_steps_per_s"], "steps/s")
flush()
