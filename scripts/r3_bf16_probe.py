"""Round-3b: measure the bf16 fused kernel + amortized-fence timing.

Follow-up to scripts/r3_perf_probe.py, which established (device trace,
docs/profile/fused_state):
  * device step 58.7 ms vs 91.9 ms host-timed -> ~33 ms axon RTT charged
    to EVERY iteration by the per-iteration value fetch;
  * the fused kernel is compute-bound at the native-f32 MXU rate
    (0.744 ms/call = ~50 TFLOP/s).

This script measures, on the real chip, in one process:
  rtt            — bare dispatch+fetch roundtrip of a trivial jitted op
  update_bf16    — isolated K=10 update: fused f32 vs fused bf16 vs XLA
  sweep          — end-to-end train step, amortized fence (dispatch 10
                   sequential steps, fetch the LAST loss — a true fence:
                   step i+1's input is step i's output, so the final value
                   transitively forces the whole chain), at candidate
                   shapes with the bf16 kernel
  quality        — 400-update same-seed training at 1024x128, XLA vs
                   fused-bf16: eval solved%/reward trajectories
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

from autonomous_quadrotor_environment_tpu.agents import (
    make_eval_fn,
    make_train_step,
    ppo_init,
)
from autonomous_quadrotor_environment_tpu.agents.ppo import Rollout, ppo_update
from autonomous_quadrotor_environment_tpu.config import (
    EnvConfig,
    PPOConfig,
    TrainConfig,
)

OUT = "runs/r3/bf16_probe.json"
RES: dict = {}


def flush(name, val):
    RES[name] = val
    os.makedirs("runs/r3", exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(RES, f, indent=2)
    print(json.dumps({name: val}), flush=True)


def build(num_envs, rollout_steps, fused, block, compute="bf16"):
    env_cfg = EnvConfig(n_steps=1000)
    mb = num_envs * rollout_steps // 4
    ppo_cfg = PPOConfig(
        k_epochs=10, minibatch_size=mb, fused_update=fused,
        shuffle_block=block, fused_compute=compute,
    )
    train_cfg = TrainConfig(
        num_envs=num_envs, rollout_steps=rollout_steps, network_size=128
    )
    model, tx, state = ppo_init(jax.random.PRNGKey(0), env_cfg, ppo_cfg, train_cfg)
    return env_cfg, ppo_cfg, train_cfg, model, tx, state


def stage_rtt():
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros(())
    float(f(x))
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        float(f(x))
    flush("rtt_ms", round((time.perf_counter() - t0) / n * 1e3, 2))


def stage_update():
    envs, steps = 2048, 256
    env_cfg, ppo_cfg, train_cfg, model, tx, state = build(envs, steps, True, 1024)
    k = jax.random.PRNGKey(2)
    ks = jax.random.split(k, 8)
    roll = jax.device_put(Rollout(
        obs=jax.random.normal(ks[0], (steps, envs, 75)) * 0.3,
        actions=jax.random.normal(ks[1], (steps, envs, 4)) * 0.3,
        logprobs=jax.random.normal(ks[2], (steps, envs, 4)) * 0.1 - 1.0,
        values=jax.random.normal(ks[3], (steps, envs)) * 0.5,
        rewards=jax.random.normal(ks[4], (steps, envs)) * 0.5,
        dones=(jax.random.uniform(ks[5], (steps, envs)) < 0.002),
        solved=(jax.random.uniform(ks[6], (steps, envs)) < 0.001),
    ))
    bootstrap = jnp.zeros((envs,))
    res = {}
    n = envs * steps
    for name, fused, block, comp in (
        ("fused_f32", True, 1024, "f32"),
        ("fused_bf16", True, 1024, "bf16"),
        ("fused_bf16_b2048", True, 2048, "bf16"),
        ("fused_bf16_b512", True, 512, "bf16"),
        ("xla_b128", False, 128, "f32"),
    ):
        cfg2 = PPOConfig(
            k_epochs=10, minibatch_size=n // 4, fused_update=fused,
            shuffle_block=block, fused_compute=comp,
        )
        upd = jax.jit(
            lambda params, opt_state, roll, b, key, _cfg=cfg2: ppo_update(
                model, tx, params, opt_state, roll, b, key, _cfg
            )
        )
        # amortized fence: 5 dispatches chained on params, fetch last loss
        def run(k0):
            p, o = state.params, state.opt_state
            m = None
            for i in range(5):
                p, o, m = upd(p, o, roll, bootstrap, jax.random.fold_in(k0, i))
            return float(m["loss"])
        run(jax.random.PRNGKey(3))
        t0 = time.perf_counter()
        run(jax.random.PRNGKey(4))
        dt = (time.perf_counter() - t0) / 5
        res[name] = {"ms_per_update_amortized": round(dt * 1e3, 1)}
        print(json.dumps({name: res[name]}), flush=True)
    flush("update", res)


def stage_sweep():
    res = {}
    for envs, steps in (
        (2048, 256), (4096, 256), (8192, 256), (16384, 256), (8192, 512),
    ):
        env_cfg, ppo_cfg, train_cfg, model, tx, state = build(
            envs, steps, True, 1024, "bf16"
        )
        step = jax.jit(make_train_step(model, tx, env_cfg, ppo_cfg, train_cfg))
        state, m = step(state)
        float(m["loss"])
        n_iters = 10
        t0 = time.perf_counter()
        st = state
        for _ in range(n_iters):
            st, m = step(st)
        final = float(m["loss"])  # forces the whole chain
        dt = (time.perf_counter() - t0) / n_iters
        res[f"{envs}x{steps}"] = {
            "ms_per_update": round(dt * 1e3, 1),
            "env_steps_per_s": round(envs * steps / dt, 0),
            "final_loss": round(final, 3),
        }
        flush("sweep", res)


def stage_quality():
    """Same-seed 400-update training, XLA vs fused-bf16: the learning curve
    is the real gate for bf16 grad noise."""
    res = {}
    for name, fused, comp in (("xla", False, "f32"), ("fused_bf16", True, "bf16")):
        env_cfg = EnvConfig(n_steps=1000)
        ppo_cfg = PPOConfig(
            k_epochs=10, minibatch_size=32768, fused_update=fused,
            shuffle_block=1024, fused_compute=comp,
        )
        train_cfg = TrainConfig(num_envs=1024, rollout_steps=128, network_size=128)
        model, tx, state = ppo_init(
            jax.random.PRNGKey(11), env_cfg, ppo_cfg, train_cfg
        )
        step = jax.jit(make_train_step(model, tx, env_cfg, ppo_cfg, train_cfg))
        eval_fn = jax.jit(make_eval_fn(model, env_cfg, episodes=40))
        curve = []
        for i in range(400):
            state, m = step(state)
            if (i + 1) % 50 == 0:
                ev = eval_fn(state.params, jax.random.PRNGKey(99))
                curve.append({
                    "update": i + 1,
                    "solved": round(float(ev["eval_solved"]), 3),
                    "reward": round(float(ev["eval_reward"]), 2),
                })
                print(json.dumps({name: curve[-1]}), flush=True)
        res[name] = curve
        flush("quality", res)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    if os.path.exists(OUT):
        RES.update(json.load(open(OUT)))
    for name, fn in (
        ("rtt_ms", stage_rtt),
        ("update", stage_update),
        ("sweep", stage_sweep),
        ("quality", stage_quality),
    ):
        if name in RES:
            print(f"skip {name} (done)", flush=True)
            continue
        t0 = time.time()
        fn()
        print(f"stage {name} done in {time.time() - t0:.0f}s", flush=True)
    print("ALL DONE", flush=True)
