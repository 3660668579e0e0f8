"""Data-parallel visual-landing PPO over a device mesh.

Same layout as dp.py for the hover trainer: params/optimizer replicated,
landing-env batch + per-device RNG sharded over ``dp``, gradients and
metrics `pmean`'d over ICI inside the step. This is the TPU-native form of
the reference's mother/child data parallelism for the landing task
(reference visual_landing/rl_worker.py:267-342).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import PPOConfig
from ..landing.env import LandingConfigs, landing_reset
from ..landing.networks import LandingActorCritic
from ..landing.ppo import LandingTrainState, make_landing_train_step
from .dp import shard_map


def landing_ppo_init_sharded(
    key: jax.Array,
    cfgs: LandingConfigs,
    ppo_cfg: PPOConfig,
    num_envs: int,
    ctrl_model,
    ctrl_params,
    mesh: Mesh,
    conv_dtype=jnp.float32,
    conv_s2d: bool = False,
):
    """Global batch `num_envs` sharded over the mesh's dp axis.

    `conv_dtype` mirrors landing_ppo_init's mixed-precision knob (bf16 conv
    compute, f32 params/loss — the shipped trainer default)."""
    import optax

    n_dp = mesh.shape["dp"]
    if num_envs % n_dp != 0:
        raise ValueError(f"num_envs={num_envs} not divisible by dp={n_dp}")

    model = LandingActorCritic(
        action_std=ppo_cfg.action_std, dtype=conv_dtype, conv_s2d=conv_s2d
    )
    k_model, k_envs, k_state = jax.random.split(key, 3)
    params = model.init(
        k_model, jnp.zeros((1, 84, 84, 3)), jnp.zeros((1, 75)), jnp.zeros((1, 3))
    )
    tx = optax.adam(ppo_cfg.lr, b1=ppo_cfg.adam_b1, b2=ppo_cfg.adam_b2)
    opt_state = tx.init(params)
    env_keys = jax.random.split(k_envs, num_envs)
    env_states, obs = jax.jit(
        jax.vmap(lambda k: landing_reset(k, cfgs, ctrl_model, ctrl_params))
    )(env_keys)
    dev_keys = jax.random.key_data(jax.random.split(k_state, n_dp))

    state = LandingTrainState(
        params=params,
        opt_state=opt_state,
        env_states=env_states,
        obs=obs,
        key=dev_keys,
        update_i=jnp.zeros((), jnp.int32),
    )
    spec = _landing_state_spec()
    sharding = jax.tree.map(
        lambda s: jax.sharding.NamedSharding(mesh, s),
        spec,
        is_leaf=lambda x: isinstance(x, P),
    )
    state = jax.device_put(state, sharding)
    return model, tx, state


def _landing_state_spec() -> LandingTrainState:
    return LandingTrainState(
        params=P(),
        opt_state=P(),
        env_states=P("dp"),
        obs=P("dp"),
        key=P("dp"),
        update_i=P(),
    )


def make_landing_parallel_train_step(
    model,
    tx,
    cfgs: LandingConfigs,
    ppo_cfg: PPOConfig,
    ctrl_model,
    ctrl_params,
    rollout_steps: int,
    mesh: Mesh,
    reset_pool: int = 2,
    image_dtype=None,
):
    step = make_landing_train_step(
        model, tx, cfgs, ppo_cfg, ctrl_model, ctrl_params, rollout_steps,
        grad_reduce=lambda g: jax.lax.pmean(g, "dp"),
        metric_reduce=lambda m: jax.lax.pmean(m, "dp"),
        reset_pool=reset_pool,
        image_dtype=image_dtype,
    )
    spec = _landing_state_spec()

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec,),
        out_specs=(spec, P()),
        check_rep=False,
    )
    def _sharded(state: LandingTrainState):
        local = state.replace(key=jax.random.wrap_key_data(state.key[0]))
        new, metrics = step(local)
        new = new.replace(key=jax.random.key_data(new.key)[None])
        return new, metrics

    return jax.jit(_sharded)


def make_landing_parallel_train_loop(
    model,
    tx,
    cfgs: LandingConfigs,
    ppo_cfg: PPOConfig,
    ctrl_model,
    ctrl_params,
    rollout_steps: int,
    mesh: Mesh,
    inner: int,
    reset_pool: int = 2,
    image_dtype=None,
):
    """`inner` dp landing train steps scanned into ONE jitted program (see
    agents.make_train_loop / parallel.make_parallel_train_loop): host
    dispatch is paid once per `inner` updates, per-update metrics come back
    as stacked rows."""
    step = make_landing_parallel_train_step(
        model, tx, cfgs, ppo_cfg, ctrl_model, ctrl_params, rollout_steps, mesh,
        reset_pool=reset_pool, image_dtype=image_dtype,
    )

    def loop(state):
        return jax.lax.scan(lambda s, _: step(s), state, None, length=inner)

    return jax.jit(loop)
