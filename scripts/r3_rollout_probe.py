"""Round-3 fused-rollout probe: attribute the 140.3 ms e2e step and tune
the kernel (ONE TPU process, incremental flush, CLAUDE.md tunnel rules).

Stages (each flushed to runs/r3/rollout_probe.json as it completes):
  gae           — associative-scan GAE at (256, 8192)
  parts         — pool build / noise / kernel / transposes / full wrapper
  sweep         — kernel (tile, t_chunk, pool) grid
  e2e           — full train step at the best config
  quality       — 1024x128 training run, eval solved trajectory
All timings amortized-fence (chain N, fetch last value).
"""

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
from autonomous_quadrotor_environment_tpu.agents.networks import ActorCritic
from autonomous_quadrotor_environment_tpu.agents.ppo import (
    make_eval_fn,
    rollout_batch_fused,
)
from autonomous_quadrotor_environment_tpu.config import EnvConfig, PPOConfig, TrainConfig
from autonomous_quadrotor_environment_tpu.envs import hover
from autonomous_quadrotor_environment_tpu.ops import rollout_fused as rf

OUT = "runs/r3/rollout_probe.json"
RES = {}
if os.path.exists(OUT):
    RES = json.load(open(OUT))


def flush():
    os.makedirs("runs/r3", exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(RES, f, indent=2)


def timeit(fn, n=20, fence=lambda out: None):
    out = fn()
    fence(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    fence(out)
    return (time.perf_counter() - t0) / n, out


T, B = 256, 8192
env_cfg = EnvConfig(n_steps=1000)

# ---- gae ------------------------------------------------------------------
if "gae" not in RES:
    k = jax.random.PRNGKey(0)
    kr, kv, kd = jax.random.split(k, 3)
    rewards = jax.random.normal(kr, (T, B))
    values = jax.random.normal(kv, (T, B))
    dones = (jax.random.uniform(kd, (T, B)) < 0.01).astype(jnp.float32)
    boot = jnp.zeros((B,))
    g = jax.jit(gae_advantages)
    dt, out = timeit(
        lambda: g(rewards, values, dones, boot),
        fence=lambda o: float(o[0][0, 0]),
    )
    RES["gae"] = {"assoc_ms": round(dt * 1e3, 2), "was_seq_ms": 57.3}
    print("gae:", RES["gae"], flush=True)
    flush()

# ---- shared setup ----------------------------------------------------------
model = ActorCritic(hidden=128, action_std=0.1)
params = model.init(jax.random.PRNGKey(2), jnp.zeros((1, 75)))
wT = rf.transpose_leaves(params)
keys = jax.random.split(jax.random.PRNGKey(0), B)
states = jax.jit(jax.vmap(lambda k: hover.reset(k, env_cfg)))(keys)
s0 = rf.pack_env_state(states)

# ---- parts -----------------------------------------------------------------
if "parts" not in RES:
    P = 4
    parts = {}

    @jax.jit
    def build_pool(key):
        pool_keys = jax.random.split(key, (P, B))
        pool_states = jax.vmap(jax.vmap(lambda k: hover.reset(k, env_cfg)))(pool_keys)
        return jax.vmap(rf.pack_env_state)(pool_states)

    dt, pool = timeit(lambda: build_pool(jax.random.PRNGKey(4)), n=10,
                      fence=lambda o: float(o[0, 0, 0]))
    parts["pool_build_ms"] = round(dt * 1e3, 2)

    noise_fn = jax.jit(lambda k: jax.random.normal(k, (T, 4, B)))
    dt, noise = timeit(lambda: noise_fn(jax.random.PRNGKey(3)), n=10,
                       fence=lambda o: float(o[0, 0, 0]))
    parts["noise_ms"] = round(dt * 1e3, 2)

    dt, _ = timeit(
        lambda: rf.fused_rollout(s0, noise, pool, wT, env_cfg, 0.1,
                                 tile=256, t_chunk=16),
        fence=lambda o: float(o[0][0, 0]),
    )
    parts["kernel_ms"] = round(dt * 1e3, 2)

    obs_t = jnp.zeros((T, 75, B))
    tr = jax.jit(lambda x: jnp.swapaxes(x, 1, 2))
    dt, _ = timeit(lambda: tr(obs_t), n=10, fence=lambda o: float(o[0, 0, 0]))
    parts["obs_transpose_ms"] = round(dt * 1e3, 2)

    roll_fn = jax.jit(
        lambda key: rollout_batch_fused(model, params, states, key, env_cfg, T)
    )
    dt, _ = timeit(
        lambda: roll_fn(jax.random.PRNGKey(7)),
        fence=lambda o: float(o[1].rewards[0, 0]),
    )
    parts["full_wrapper_ms"] = round(dt * 1e3, 2)
    RES["parts"] = parts
    print("parts:", parts, flush=True)
    flush()

# ---- sweep -----------------------------------------------------------------
if "sweep" not in RES:
    sweep = {}
    noise = jax.jit(lambda k: jax.random.normal(k, (T, 4, B)))(jax.random.PRNGKey(3))
    for P in (2, 4, 8):
        pool_keys = jax.random.split(jax.random.PRNGKey(4), (P, B))
        pool_states = jax.jit(
            jax.vmap(jax.vmap(lambda k: hover.reset(k, env_cfg)))
        )(pool_keys)
        pool = jax.vmap(rf.pack_env_state)(pool_states)
        for tile, tc in ((256, 8), (256, 16), (256, 32), (512, 16), (512, 32), (1024, 16)):
            if P != 4 and (tile, tc) != (256, 16):
                continue
            try:
                dt, _ = timeit(
                    lambda: rf.fused_rollout(
                        s0, noise, pool, wT, env_cfg, 0.1, tile=tile, t_chunk=tc
                    ),
                    fence=lambda o: float(o[0][0, 0]),
                )
                sweep[f"P{P}_tile{tile}_tc{tc}"] = round(dt * 1e3, 2)
            except Exception as e:  # noqa: BLE001 — record and continue
                sweep[f"P{P}_tile{tile}_tc{tc}"] = f"fail: {type(e).__name__}"
            print(f"P{P} tile{tile} tc{tc}:", sweep[f"P{P}_tile{tile}_tc{tc}"], flush=True)
            RES["sweep"] = sweep
            flush()

# ---- e2e -------------------------------------------------------------------
if "e2e" not in RES:
    ppo_cfg = PPOConfig(
        k_epochs=10, minibatch_size=T * B // 4, fused_update=True, shuffle_block=1024
    )
    train_cfg = TrainConfig(
        num_envs=B, rollout_steps=T, network_size=128, fused_rollout=True
    )
    m2, tx, st = ppo_init(jax.random.PRNGKey(0), env_cfg, ppo_cfg, train_cfg)
    step = jax.jit(make_train_step(m2, tx, env_cfg, ppo_cfg, train_cfg))
    st, met = step(st)
    float(met["loss"])
    N = 10
    t0 = time.perf_counter()
    for _ in range(N):
        st, met = step(st)
    float(met["loss"])
    dt = (time.perf_counter() - t0) / N
    RES["e2e"] = {
        "ms_per_update": round(dt * 1e3, 1),
        "env_steps_per_s": round(B * T / dt),
    }
    print("e2e:", RES["e2e"], flush=True)
    flush()

# ---- quality ---------------------------------------------------------------
if "quality" not in RES:
    q_env = EnvConfig(n_steps=1000)
    q_ppo = PPOConfig(fused_update=True)
    q_train = TrainConfig(num_envs=1024, rollout_steps=128, network_size=128,
                          fused_rollout=True)
    m3, tx3, st3 = ppo_init(jax.random.PRNGKey(0), q_env, q_ppo, q_train)
    stp = jax.jit(make_train_step(m3, tx3, q_env, q_ppo, q_train))
    ev = jax.jit(make_eval_fn(m3, EnvConfig(n_steps=1000, training=False), episodes=40))
    traj = []
    t0 = time.perf_counter()
    for i in range(1, 901):
        st3, met = stp(st3)
        if i % 100 == 0:
            e = ev(st3.params, jax.random.PRNGKey(123))
            traj.append({"update": i, "solved": round(float(e["eval_solved"]), 3),
                         "reward": round(float(e["eval_reward"]), 2)})
            print("quality:", traj[-1], flush=True)
    RES["quality"] = {
        "train_s": round(time.perf_counter() - t0, 1),
        "trajectory": traj,
        "final_solved": traj[-1]["solved"],
    }
    flush()

print(json.dumps(RES, indent=2))
