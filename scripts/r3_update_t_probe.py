"""Round-3 transposed-update probe: row-major vs transposed fused PPO
update at the bench shape, then the fully fused train step (ONE TPU
process, incremental flush).

Stages -> runs/r3/update_t_probe.json:
  update_alone — K=10 quarter-minibatch update: row-major kernel on
                 (n, 75) data vs transposed kernel on (T, 75, B), both
                 from the same logical batch; tile sweep for the t-kernel
  e2e          — fully fused train step (rollout kernel -> assoc GAE ->
                 transposed update) at 8192x256, plus 16384x256
  quality      — 1024x128 fully fused training, eval solved by update 400
"""

import dataclasses
import json
import os
import time

import jax
import jax.numpy as jnp

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from autonomous_quadrotor_environment_tpu.agents import make_train_step, ppo_init
from autonomous_quadrotor_environment_tpu.agents.networks import ActorCritic
from autonomous_quadrotor_environment_tpu.agents.ppo import (
    make_eval_fn,
    ppo_update,
    ppo_update_t,
    Rollout,
)
from autonomous_quadrotor_environment_tpu.config import EnvConfig, PPOConfig, TrainConfig
import optax

OUT = "runs/r3/update_t_probe.json"
RES = json.load(open(OUT)) if os.path.exists(OUT) else {}


def flush():
    os.makedirs("runs/r3", exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(RES, f, indent=2)


T, B = 256, 8192
N = T * B
model = ActorCritic(hidden=128, action_std=0.1)
params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 75)))
tx = optax.adam(5e-4)

if "update_alone" not in RES:
    res = {}
    k = jax.random.split(jax.random.PRNGKey(1), 6)
    obs_t = jax.random.normal(k[0], (T, 75, B)) * 0.3
    misc_like = {
        "act": jax.random.normal(k[1], (T, 4, B)) * 0.2,
        "old_lp": jax.random.normal(k[2], (T, 1, B)) * 0.1 - 4.0,
        "ret": jax.random.normal(k[3], (T, 1, B)),
        "adv": jax.random.normal(k[4], (T, 1, B)),
    }
    aux_t = jnp.concatenate(
        [misc_like["act"], misc_like["old_lp"], misc_like["ret"],
         misc_like["adv"], jnp.zeros((T, 1, B))], axis=1,
    )
    # Row-major copies of the same batch.
    to_r = lambda x: jnp.moveaxis(x, 1, 2).reshape(N, -1)
    obs = to_r(obs_t)
    actions = to_r(misc_like["act"])
    old_lp_rows = jnp.concatenate(
        [to_r(misc_like["old_lp"]), jnp.zeros((N, 3))], axis=1
    )  # ppo_update sums per-dim logprobs; put the sum in dim 0
    rets = to_r(misc_like["ret"])[:, 0]
    advs = to_r(misc_like["adv"])[:, 0]
    roll = Rollout(
        obs=obs.reshape(T, B, 75), actions=actions.reshape(T, B, 4),
        logprobs=old_lp_rows.reshape(T, B, 4),
        values=jnp.zeros((T, B)), rewards=jnp.zeros((T, B)),
        dones=jnp.zeros((T, B), bool), solved=jnp.zeros((T, B), bool),
    )

    for name, shuffle_block in (("t1024", 1024), ("t2048", 2048), ("t512", 512)):
        cfg = PPOConfig(k_epochs=10, minibatch_size=N // 4, fused_update=True,
                        shuffle_block=shuffle_block)
        # Data as jit ARGUMENTS: closed-over arrays bake into the HLO as
        # constants, and the axon remote-compile endpoint rejects the
        # ~900 MB upload (HTTP 413).
        upd = jax.jit(
            lambda p, o, ot, at, key, cfg=cfg: ppo_update_t(
                tx, p, o, ot, at, key, cfg
            )
        )
        o0 = tx.init(params)
        p2, o2, m = upd(params, o0, obs_t, aux_t, jax.random.PRNGKey(2))
        float(m["loss"])
        t0 = time.perf_counter()
        M = 5
        p2, o2 = params, o0
        for i in range(M):
            p2, o2, m = upd(p2, o2, obs_t, aux_t, jax.random.PRNGKey(i))
        float(m["loss"])
        res[f"update_t_{name}_ms"] = round((time.perf_counter() - t0) / M * 1e3, 1)
        print(name, res[f"update_t_{name}_ms"], flush=True)

    # Row-major reference (the current bench path).
    cfg_r = PPOConfig(k_epochs=10, minibatch_size=N // 4, fused_update=True,
                      shuffle_block=1024)
    upd_r = jax.jit(
        lambda p, o, rl, key: ppo_update(
            model, tx, p, o, rl, jnp.zeros(B), key, cfg_r
        )
    )
    o0 = tx.init(params)
    p2, o2, m = upd_r(params, o0, roll, jax.random.PRNGKey(2))
    float(m["loss"])
    t0 = time.perf_counter()
    M = 5
    p2, o2 = params, o0
    for i in range(M):
        p2, o2, m = upd_r(p2, o2, roll, jax.random.PRNGKey(i))
    float(m["loss"])
    res["update_rowmajor_ms"] = round((time.perf_counter() - t0) / M * 1e3, 1)
    print("rowmajor", res["update_rowmajor_ms"], flush=True)
    RES["update_alone"] = res
    flush()

if "e2e" not in RES:
    res = {}
    for b_envs in (8192, 16384):
        env_cfg = EnvConfig(n_steps=1000)
        ppo_cfg = PPOConfig(k_epochs=10, minibatch_size=T * b_envs // 4,
                            fused_update=True, shuffle_block=1024)
        train_cfg = TrainConfig(num_envs=b_envs, rollout_steps=T,
                                network_size=128, fused_rollout=True)
        m2, tx2, st = ppo_init(jax.random.PRNGKey(0), env_cfg, ppo_cfg, train_cfg)
        step = jax.jit(make_train_step(m2, tx2, env_cfg, ppo_cfg, train_cfg))
        st, met = step(st)
        float(met["loss"])
        M = 10
        t0 = time.perf_counter()
        for _ in range(M):
            st, met = step(st)
        float(met["loss"])
        dt = (time.perf_counter() - t0) / M
        res[f"envs{b_envs}"] = {
            "ms_per_update": round(dt * 1e3, 1),
            "env_steps_per_s": round(b_envs * T / dt),
        }
        print(res[f"envs{b_envs}"], flush=True)
        RES["e2e"] = res
        flush()

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
    for i in range(1, 501):
        st3, met = stp(st3)
        if i % 100 == 0:
            e = ev(st3.params, jax.random.PRNGKey(123))
            traj.append({"update": i, "solved": round(float(e["eval_solved"]), 3)})
            print("quality:", traj[-1], flush=True)
    RES["quality"] = {"train_s": round(time.perf_counter() - t0, 1), "trajectory": traj}
    flush()

print(json.dumps(RES, indent=2))
