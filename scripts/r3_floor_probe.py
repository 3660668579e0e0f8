"""Round-3d: find the fused kernel's per-grid-step floor.

tanh variants (even a 2-op clip) and bf16 matmul operands all leave the
kernel at ~0.92 ms/call = 7.2 us per 1024-row grid step
(runs/r3/tanh_probe.json, bf16_probe.json), so the bound is neither MXU
nor VPU work. Remaining suspects: the per-grid-step pipeline overhead /
DMA latency of the scalar-prefetched random-block loads, or the 14
VMEM-resident output buffers revisited every step.

Kernels measured (same PrefetchScalarGridSpec, same 128-block random
perms, 40 calls with distinct perms, amortized fence):
  dma_only   — load obs+aux tile, accumulate jnp.sum into one (1,128) out
  dma_dot1   — + one (1024,75)@(75,128) dot
  dma_outs   — dma_only + the full 14 accumulated output buffers (write
               cost without the compute)
  full       — the real kernel (reference point)
"""

from __future__ import annotations

import json
import os
import time
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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

OUT = "runs/r3/floor_probe.json"
TILE = 1024
N = 2048 * 256


def _grid_spec(n_blocks, obs_dim, extra_outs):
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((TILE, obs_dim), lambda i, perm: (perm[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 8), lambda i, perm: (perm[i], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 128), lambda i, perm: (0, 0),
                         memory_space=pltpu.VMEM)
        ] + [
            pl.BlockSpec(s, lambda i, perm: (0, 0), memory_space=pltpu.VMEM)
            for s in extra_outs
        ],
    )


def make_dma_kernel(n_extra_outs):
    def kernel(perm_ref, obs_ref, aux_ref, sum_ref, *outs):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            sum_ref[:] = jnp.zeros_like(sum_ref)
            for r in outs:
                r[:] = jnp.zeros_like(r)

        s = jnp.sum(obs_ref[:]) + jnp.sum(aux_ref[:])
        sum_ref[:] += jnp.full((1, 128), s)
        for r in outs:
            r[:] += jnp.float32(1.0)
    return kernel


def make_dot_kernel(w_shape):
    def kernel(perm_ref, obs_ref, aux_ref, w_ref, sum_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            sum_ref[:] = jnp.zeros_like(sum_ref)

        h = jnp.dot(obs_ref[:], w_ref[:], preferred_element_type=jnp.float32)
        sum_ref[:] += jnp.full((1, 128), jnp.sum(h) + jnp.sum(aux_ref[:]))
    return kernel


def run_case(name, call_fn, perms, reps=5):
    def forty(perms):
        def body(acc, perm):
            return acc + call_fn(perm), None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), perms)
        return acc

    f = jax.jit(forty)
    float(f(perms))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(perms)
    float(out)
    dt = (time.perf_counter() - t0) / reps / 40
    return round(dt * 1e3, 3)


def main():
    print("devices:", jax.devices(), flush=True)
    k = jax.random.PRNGKey(5)
    ks = jax.random.split(k, 5)
    obs = jax.random.normal(ks[0], (N, 75)) * 0.3
    aux = jax.random.normal(ks[1], (N, 8)) * 0.3
    w1 = jax.random.normal(ks[2], (75, 128)) * 0.1
    perms = jax.vmap(
        lambda kk: jax.random.permutation(kk, N // TILE)[:128].astype(jnp.int32)
    )(jax.random.split(jax.random.PRNGKey(9), 40))

    res = {}

    # dma_only
    gs = _grid_spec(128, 75, [])
    def dma_only(perm):
        out = pl.pallas_call(
            make_dma_kernel(0), grid_spec=gs,
            out_shape=[jax.ShapeDtypeStruct((1, 128), jnp.float32)],
        )(perm, obs, aux)
        return out[0][0, 0]
    res["dma_only_ms"] = run_case("dma_only", dma_only, perms)
    print(json.dumps(res), flush=True)

    # dma + 1 dot
    gs_dot = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(128,),
        in_specs=[
            pl.BlockSpec((TILE, 75), lambda i, perm: (perm[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 8), lambda i, perm: (perm[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((75, 128), lambda i, perm: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 128), lambda i, perm: (0, 0),
                         memory_space=pltpu.VMEM)
        ],
    )
    def dma_dot1(perm):
        out = pl.pallas_call(
            make_dot_kernel((75, 128)), grid_spec=gs_dot,
            out_shape=[jax.ShapeDtypeStruct((1, 128), jnp.float32)],
        )(perm, obs, aux, w1)
        return out[0][0, 0]
    res["dma_dot1_ms"] = run_case("dma_dot1", dma_dot1, perms)
    print(json.dumps(res), flush=True)

    # dma + 14 accumulated outputs (shapes as the real kernel's grads)
    shapes = [(128, 128)] * 4 + [(1, 128)] * 9 + [(128, 128)]
    gs_outs = _grid_spec(128, 75, shapes)
    def dma_outs(perm):
        out = pl.pallas_call(
            make_dma_kernel(len(shapes)), grid_spec=gs_outs,
            out_shape=[jax.ShapeDtypeStruct((1, 128), jnp.float32)]
            + [jax.ShapeDtypeStruct(s, jnp.float32) for s in shapes],
        )(perm, obs, aux)
        return out[0][0, 0]
    res["dma_outs_ms"] = run_case("dma_outs", dma_outs, perms)
    print(json.dumps(res), flush=True)

    # reference: the real kernel
    env_cfg = EnvConfig(n_steps=1000)
    ppo_cfg = PPOConfig(k_epochs=10, minibatch_size=131072, fused_update=True,
                        shuffle_block=TILE)
    train_cfg = TrainConfig(num_envs=2048, rollout_steps=256, network_size=128)
    model, tx, state = ppo_init(jax.random.PRNGKey(0), env_cfg, ppo_cfg, train_cfg)
    aux_full = ppo_fused.pack_aux(
        jax.random.normal(ks[3], (N, 4)) * 0.3,
        jax.random.normal(ks[4], (N, 4)) * 0.1 - 1.0,
        jnp.zeros((N,)), jnp.ones((N,)),
    )
    def full(perm):
        loss, _, _ = ppo_fused.fused_ppo_grad(
            state.params, obs, aux_full, perm, tile=TILE,
            action_std=ppo_cfg.action_std, clip_eps=ppo_cfg.clip_eps,
            entropy_coef=ppo_cfg.entropy_coef,
        )
        return loss
    res["full_ms"] = run_case("full", full, perms)
    print(json.dumps(res), flush=True)

    os.makedirs("runs/r3", exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(res, f, indent=2)
    print("ALL DONE", flush=True)


if __name__ == "__main__":
    main()
