"""Round-3c: measure the VPU-transcendental (tanh) share of the fused
PPO kernel and whether a rational approximation buys real time.

bf16 matmul operands changed nothing (runs/r3/bf16_probe.json), so the
kernel's 0.744 ms/call must be VPU-elementwise-bound; tanh (5 layer
activations per row, ~524k evals per 1024-row tile) is the candidate
dominant term. Variants, swapped via ops.ppo_fused._tanh (jit cache
cleared between):

  exact  — jnp.tanh (Mosaic's native lowering)
  exp    — 1 - 2/(exp(2x)+1): is native tanh worse than its exp identity?
  pade   — clamped Pade continued-fraction (deg 7/6 in x, polynomial in
           x^2): ~12 mul/add + 1 div, no transcendental. |err| < 1e-6 for
           |x|<3, < 2e-4 at the +-4.97 clamp.
  clip   — clip(x,-1,1): NOT an approximation; a 2-op lower bound on the
           kernel with zero activation cost.

Timing: 40 kernel calls per measurement, each with a DIFFERENT prefetched
block permutation (inputs vary per scan iteration, so XLA cannot hoist
the call — the mistake that invalidated perf_probe's kernel_x40), fenced
on the summed losses. Accuracy: loss + max grad deviation vs exact on the
same minibatch.
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

from autonomous_quadrotor_environment_tpu.agents import ppo_init
from autonomous_quadrotor_environment_tpu.config import (
    EnvConfig,
    PPOConfig,
    TrainConfig,
)
from autonomous_quadrotor_environment_tpu.ops import ppo_fused

OUT = "runs/r3/tanh_probe.json"


def tanh_exp(x):
    return 1.0 - 2.0 / (jnp.exp(2.0 * x) + 1.0)


def tanh_pade(x):
    t = jnp.clip(x, -4.97, 4.97)
    t2 = t * t
    p = t * (135135.0 + t2 * (17325.0 + t2 * (378.0 + t2)))
    q = 135135.0 + t2 * (62370.0 + t2 * (3150.0 + 28.0 * t2))
    return p / q


def tanh_clip(x):
    return jnp.clip(x, -1.0, 1.0)


VARIANTS = {
    "exact": jnp.tanh,
    "exp": tanh_exp,
    "pade": tanh_pade,
    "clip": tanh_clip,
}


def main():
    print("devices:", jax.devices(), flush=True)
    env_cfg = EnvConfig(n_steps=1000)
    ppo_cfg = PPOConfig(k_epochs=10, minibatch_size=131072, fused_update=True,
                        shuffle_block=1024)
    train_cfg = TrainConfig(num_envs=2048, rollout_steps=256, network_size=128)
    model, tx, state = ppo_init(jax.random.PRNGKey(0), env_cfg, ppo_cfg, train_cfg)
    params = state.params

    n, tile = 2048 * 256, 1024
    k = jax.random.PRNGKey(5)
    ks = jax.random.split(k, 5)
    obs = jax.random.normal(ks[0], (n, 75)) * 0.3
    aux = ppo_fused.pack_aux(
        jax.random.normal(ks[1], (n, 4)) * 0.3,
        jax.random.normal(ks[2], (n, 4)) * 0.1 - 1.0,
        jax.random.normal(ks[3], (n,)),
        jax.random.normal(ks[4], (n,)),
    )
    # 40 distinct minibatch permutations (128 blocks each): no hoisting.
    perms = jax.vmap(
        lambda kk: jax.random.permutation(kk, n // tile)[:128].astype(jnp.int32)
    )(jax.random.split(jax.random.PRNGKey(9), 40))

    def forty(params, obs, aux, perms):
        def body(acc, perm):
            loss, _, _ = ppo_fused.fused_ppo_grad(
                params, obs, aux, perm, tile=tile,
                action_std=ppo_cfg.action_std, clip_eps=ppo_cfg.clip_eps,
                entropy_coef=ppo_cfg.entropy_coef, interpret=False,
            )
            return acc + loss, None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), perms)
        return acc

    res = {}
    ref = None
    for name, fn in VARIANTS.items():
        ppo_fused._tanh = fn
        ppo_fused.fused_ppo_grad.clear_cache()
        f40 = jax.jit(forty)
        float(f40(params, obs, aux, perms))  # compile+warm
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            out = f40(params, obs, aux, perms)
        float(out)
        dt = (time.perf_counter() - t0) / reps / 40
        # accuracy vs exact on one call
        loss, _, grads = jax.jit(
            lambda p, o, a, pm: ppo_fused.fused_ppo_grad(
                p, o, a, pm, tile=tile, action_std=ppo_cfg.action_std,
                clip_eps=ppo_cfg.clip_eps, entropy_coef=ppo_cfg.entropy_coef,
            )
        )(params, obs, aux, perms[0])
        g = jnp.concatenate([x.ravel() for x in jax.tree.leaves(grads)])
        if name == "exact":
            ref = (float(loss), g)
        gerr = float(jnp.max(jnp.abs(g - ref[1])) / (jnp.max(jnp.abs(ref[1])) + 1e-12))
        res[name] = {
            "ms_per_call": round(dt * 1e3, 3),
            "loss": round(float(loss), 6),
            "grad_max_rel_err_vs_exact": round(gerr, 6),
        }
        print(json.dumps({name: res[name]}), flush=True)
    ppo_fused._tanh = jnp.tanh
    os.makedirs("runs/r3", exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(res, f, indent=2)
    print("ALL DONE", flush=True)


if __name__ == "__main__":
    main()
