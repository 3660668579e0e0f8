"""Round-3 perf probe: attribute the 87.9 ms fused train step.

The fused update (ops/ppo_fused.py) streams only ~28 GB/s of the chip's
819 GB/s — so the K-epoch update is NOT bandwidth-bound anymore. Two
hypotheses this script separates, on the real chip, in ONE process
(CLAUDE.md tunnel rules):

  (a) the kernel's f32 matmuls run at native-f32 MXU rate (~4x slower
      than bf16-operand passes) -> compute-bound per grad step;
  (b) with the update cheaper, the round-2 batch shape (2048x256) is no
      longer optimal -> larger env batches amortize the rollout scan's
      per-step kernel-launch latency.

Stages (each flushed to runs/r3/perf_probe.json as it completes):
  rollout_only  — rollout scan alone at 2048/4096/8192 envs x 256 steps
  update_parts  — GAE alone; grads-only (no optax) K=10 scan; full fused
                  update; XLA update — all at the bench rows (524288)
  shape_sweep   — end-to-end train step at candidate shapes
  trace         — jax.profiler trace of 2 bench-shape steps
                  (docs/profile/fused_state/)

All timings fence on a fetched host value per iteration (block_until_ready
lies over the axon tunnel — round-1 finding).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from autonomous_quadrotor_environment_tpu.agents import make_train_step, ppo_init
from autonomous_quadrotor_environment_tpu.agents.ppo import (
    Rollout,
    gae_advantages,
    ppo_update,
    rollout_batch,
)
from autonomous_quadrotor_environment_tpu.config import (
    EnvConfig,
    PPOConfig,
    TrainConfig,
)

OUT = "runs/r3/perf_probe.json"
RES: dict = {}


def flush(name, val):
    RES[name] = val
    os.makedirs("runs/r3", exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(RES, f, indent=2)
    print(json.dumps({name: val}), flush=True)


def timeit(fn, *args, iters=5, warmup=1):
    """Mean ms/call; fences on fetching the first scalar-ish leaf."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
        jax.block_until_ready(out)
        leaf = jax.tree.leaves(out)[0]
        float(jnp.asarray(leaf).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        leaf = jax.tree.leaves(out)[0]
        float(jnp.asarray(leaf).reshape(-1)[0])
    return (time.perf_counter() - t0) / iters * 1e3


def build(num_envs, rollout_steps, fused, block, k_epochs=10):
    env_cfg = EnvConfig(n_steps=1000)
    mb = num_envs * rollout_steps // 4
    ppo_cfg = PPOConfig(
        k_epochs=k_epochs, minibatch_size=mb, fused_update=fused,
        shuffle_block=block,
    )
    train_cfg = TrainConfig(
        num_envs=num_envs, rollout_steps=rollout_steps, network_size=128
    )
    model, tx, state = ppo_init(jax.random.PRNGKey(0), env_cfg, ppo_cfg, train_cfg)
    return env_cfg, ppo_cfg, train_cfg, model, tx, state


def stage_rollout_only():
    res = {}
    for envs in (2048, 4096, 8192):
        env_cfg, ppo_cfg, train_cfg, model, tx, state = build(envs, 256, True, 1024)
        roll_fn = jax.jit(
            lambda params, st, key: rollout_batch(
                model, params, st, key, env_cfg, 256, reset_pool=0
            )
        )
        ms = timeit(roll_fn, state.params, state.env_states, jax.random.PRNGKey(1))
        res[f"envs{envs}"] = {
            "ms": round(ms, 1),
            "steps_per_s": round(envs * 256 / ms * 1e3, 0),
        }
    flush("rollout_only", res)


def stage_update_parts():
    envs, steps = 2048, 256
    env_cfg, ppo_cfg, train_cfg, model, tx, state = build(envs, steps, True, 1024)
    k = jax.random.PRNGKey(2)
    # Synthetic rollout of the right shapes/dtypes (values don't matter for
    # timing; keep them small/realistic so exp() stays finite).
    ks = jax.random.split(k, 8)
    roll = Rollout(
        obs=jax.random.normal(ks[0], (steps, envs, 75)) * 0.3,
        actions=jax.random.normal(ks[1], (steps, envs, 4)) * 0.3,
        logprobs=jax.random.normal(ks[2], (steps, envs, 4)) * 0.1 - 1.0,
        values=jax.random.normal(ks[3], (steps, envs)) * 0.5,
        rewards=jax.random.normal(ks[4], (steps, envs)) * 0.5,
        dones=(jax.random.uniform(ks[5], (steps, envs)) < 0.002),
        solved=(jax.random.uniform(ks[6], (steps, envs)) < 0.001),
    )
    roll = jax.device_put(roll)
    bootstrap = jnp.zeros((envs,))
    res = {}

    gae = jax.jit(
        lambda r, b: gae_advantages(
            r.rewards, r.values, r.dones, b, ppo_cfg.gamma, ppo_cfg.gae_lambda
        )
    )
    res["gae_ms"] = round(timeit(gae, roll, bootstrap), 2)

    # Grads only: the K=10 x 4-minibatch fused kernel scan with NO optax
    # update between steps (params constant) — isolates kernel cost from
    # Adam + the loop-carried param dependency.
    from autonomous_quadrotor_environment_tpu.ops.ppo_fused import (
        fused_ppo_grad,
        pack_aux,
    )

    n = envs * steps
    tile = 1024
    flat = lambda x: x.reshape((-1,) + x.shape[2:])
    obs = flat(roll.obs)
    rets, advs = gae(roll, bootstrap)
    aux = pack_aux(flat(roll.actions), flat(roll.logprobs), flat(rets), flat(advs))

    def grads_only(params, obs, aux, key):
        def epoch(carry, ek):
            perm = jax.random.permutation(ek, n // tile)
            idxs = perm.reshape(4, -1)

            def mb(carry, idx):
                loss, metrics, grads = fused_ppo_grad(
                    params, obs, aux, idx.astype(jnp.int32), tile=tile,
                    action_std=ppo_cfg.action_std, clip_eps=ppo_cfg.clip_eps,
                    entropy_coef=ppo_cfg.entropy_coef, interpret=False,
                )
                acc = jax.tree.map(lambda a, g: a + g, carry, grads)
                return acc, loss

            carry, losses = jax.lax.scan(mb, carry, idxs)
            return carry, jnp.mean(losses)

        zero = jax.tree.map(jnp.zeros_like, params)
        acc, losses = jax.lax.scan(epoch, zero, jax.random.split(key, 10))
        return jnp.mean(losses), acc

    g_fn = jax.jit(grads_only)
    res["grads_only_k10_ms"] = round(
        timeit(g_fn, state.params, obs, aux, jax.random.PRNGKey(3)), 1
    )

    # One fused grad call amortized (40 identical calls via scan, fori-style).
    def one_call_x40(params, obs, aux):
        idx = jnp.arange(n // tile, dtype=jnp.int32)[: (n // 4) // tile]

        def body(carry, _):
            loss, metrics, grads = fused_ppo_grad(
                params, obs, aux, idx, tile=tile,
                action_std=ppo_cfg.action_std, clip_eps=ppo_cfg.clip_eps,
                entropy_coef=ppo_cfg.entropy_coef, interpret=False,
            )
            return carry + loss, None

        acc, _ = jax.lax.scan(body, jnp.zeros(()), None, length=40)
        return acc

    res["kernel_x40_fixed_idx_ms"] = round(
        timeit(jax.jit(one_call_x40), state.params, obs, aux), 1
    )

    # Full fused update (GAE + shuffle + kernel + Adam), and the XLA path.
    for name, fused, block in (("fused_b1024", True, 1024), ("xla_b128", False, 128)):
        cfg2 = PPOConfig(
            k_epochs=10, minibatch_size=n // 4, fused_update=fused,
            shuffle_block=block,
        )
        upd = jax.jit(
            lambda params, opt_state, roll, b, key, _cfg=cfg2: ppo_update(
                model, tx, params, opt_state, roll, b, key, _cfg
            )
        )
        res[f"update_{name}_ms"] = round(
            timeit(upd, state.params, state.opt_state, roll, bootstrap,
                   jax.random.PRNGKey(4)), 1
        )
    flush("update_parts", res)


def stage_shape_sweep():
    res = {}
    for envs, steps in ((2048, 256), (4096, 256), (8192, 256), (4096, 128),
                        (8192, 128)):
        env_cfg, ppo_cfg, train_cfg, model, tx, state = build(envs, steps, True, 1024)
        step = jax.jit(make_train_step(model, tx, env_cfg, ppo_cfg, train_cfg))
        state, m = step(state)
        float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(5):
            state, m = step(state)
            float(m["loss"])
        dt = (time.perf_counter() - t0) / 5
        res[f"{envs}x{steps}"] = {
            "ms_per_update": round(dt * 1e3, 1),
            "env_steps_per_s": round(envs * steps / dt, 0),
        }
        flush("shape_sweep", res)


def stage_trace():
    env_cfg, ppo_cfg, train_cfg, model, tx, state = build(2048, 256, True, 1024)
    step = jax.jit(make_train_step(model, tx, env_cfg, ppo_cfg, train_cfg))
    state, m = step(state)
    float(m["loss"])
    os.makedirs("docs/profile/fused_state", exist_ok=True)
    with jax.profiler.trace("docs/profile/fused_state"):
        for _ in range(2):
            state, m = step(state)
            float(m["loss"])
    flush("trace", "docs/profile/fused_state")


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    if os.path.exists(OUT):
        RES.update(json.load(open(OUT)))
    for name, fn in (
        ("rollout_only", stage_rollout_only),
        ("update_parts", stage_update_parts),
        ("shape_sweep", stage_shape_sweep),
        ("trace", stage_trace),
    ):
        if name in RES:
            print(f"skip {name} (done)", flush=True)
            continue
        t0 = time.time()
        fn()
        print(f"stage {name} done in {time.time() - t0:.0f}s", flush=True)
    print("ALL DONE", flush=True)
