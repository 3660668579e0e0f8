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


def test_dp_fused_gate_uses_per_shard_batch():
    """ADVICE r3 regression: fused paths enabled + a global batch that
    passes the transposed-update tile gate while the PER-SHARD batch fails
    it (32 envs / 8 devices = 4 < the 8-lane minimum). Before the fix,
    make_train_step gated on the global count and ppo_update_t's per-shard
    assert fired at trace time; now the step must fall back to the XLA
    update and run."""
    mesh = make_dp_mesh(8)
    env_cfg = EnvConfig(n_steps=50)
    ppo_cfg = PPOConfig(k_epochs=2, fused_update=True, shuffle_block=128)
    train_cfg = TrainConfig(
        num_envs=32, rollout_steps=8, network_size=16, fused_rollout=True
    )
    model, tx, state = ppo_init_sharded(
        jax.random.PRNGKey(0), env_cfg, ppo_cfg, train_cfg, mesh
    )
    train_step = make_parallel_train_step(model, tx, env_cfg, ppo_cfg, train_cfg, mesh)
    state, metrics = train_step(state)
    assert np.isfinite(float(metrics["loss"]))


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


def test_dp_gradients_match_single_device():
    """The pmean'd per-shard PPO gradients over the 8-device mesh must equal
    the single-device full-batch gradient on the SAME data (the numerical
    core of the dp claim: mean of equal-size shard grads == global grad)."""
    from functools import partial

    from jax.sharding import NamedSharding, PartitionSpec as P

    from autonomous_quadrotor_environment_tpu.agents.networks import ActorCritic
    from autonomous_quadrotor_environment_tpu.agents.ppo import ppo_loss
    from autonomous_quadrotor_environment_tpu.parallel.dp import shard_map

    mesh = make_dp_mesh(8)
    ppo_cfg = PPOConfig()
    model = ActorCritic(hidden=16)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 75)))

    k = jax.random.PRNGKey(42)
    n = 64
    obs = jax.random.normal(jax.random.fold_in(k, 0), (n, 75))
    actions = jax.random.normal(jax.random.fold_in(k, 1), (n, 4)) * 0.1
    old_lp = jax.random.normal(jax.random.fold_in(k, 2), (n, 4))
    rets = jax.random.normal(jax.random.fold_in(k, 3), (n,))
    advs = jax.random.normal(jax.random.fold_in(k, 4), (n,))

    def loss_fn(p, batch):
        return ppo_loss(model, p, *batch, ppo_cfg)[0]

    batch = (obs, actions, old_lp, rets, advs)
    g_single = jax.grad(loss_fn)(params, batch)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), tuple(P("dp") for _ in batch)),
        out_specs=P(),
        check_rep=False,
    )
    def dp_grads(p, batch):
        return jax.lax.pmean(jax.grad(loss_fn)(p, batch), "dp")

    sharded = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P("dp"))), batch
    )
    g_dp = jax.jit(dp_grads)(params, sharded)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-6),
        g_single,
        g_dp,
    )


def test_dp_one_device_mesh_matches_plain_jit():
    """A 1-device dp mesh must reproduce the plain single-chip train step
    bitwise (the shard_map plumbing adds nothing numerically)."""
    from autonomous_quadrotor_environment_tpu.agents import make_train_step

    env_cfg = EnvConfig(n_steps=50)
    ppo_cfg = PPOConfig(k_epochs=2)
    train_cfg = TrainConfig(num_envs=8, rollout_steps=8, network_size=16)

    mesh = make_dp_mesh(1)
    model, tx, dp_state = ppo_init_sharded(
        jax.random.PRNGKey(3), env_cfg, ppo_cfg, train_cfg, mesh
    )
    dp_step = make_parallel_train_step(model, tx, env_cfg, ppo_cfg, train_cfg, mesh)
    dp_state, dp_metrics = dp_step(dp_state)

    # Single-chip state with the identical per-device RNG stream.
    from autonomous_quadrotor_environment_tpu.agents.ppo import PPOTrainState

    _model, _tx, base = ppo_init_sharded(
        jax.random.PRNGKey(3), env_cfg, ppo_cfg, train_cfg, mesh
    )
    single = PPOTrainState(
        params=base.params,
        opt_state=base.opt_state,
        env_states=base.env_states,
        key=jax.random.wrap_key_data(base.key[0]),
        update_i=base.update_i,
    )
    step = jax.jit(make_train_step(model, tx, env_cfg, ppo_cfg, train_cfg))
    single, metrics = step(single)

    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6),
        single.params,
        dp_state.params,
    )
    np.testing.assert_allclose(float(metrics["loss"]), float(dp_metrics["loss"]), rtol=1e-6)


def test_dp_weak_scaling_smoke_2_4_8():
    """2/4/8-device meshes all run and keep params exactly replicated."""
    env_cfg = EnvConfig(n_steps=50)
    ppo_cfg = PPOConfig(k_epochs=1)
    train_cfg = TrainConfig(num_envs=16, rollout_steps=4, network_size=16)
    for n_dp in (2, 4, 8):
        mesh = make_dp_mesh(n_dp)
        model, tx, state = ppo_init_sharded(
            jax.random.PRNGKey(7), env_cfg, ppo_cfg, train_cfg, mesh
        )
        train_step = make_parallel_train_step(model, tx, env_cfg, ppo_cfg, train_cfg, mesh)
        state, metrics = train_step(state)
        assert np.isfinite(float(metrics["loss"]))
        leaf = jax.tree.leaves(state.params)[0]
        shards = [np.asarray(s.data) for s in leaf.addressable_shards]
        for s in shards[1:]:
            np.testing.assert_array_equal(shards[0], s)


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


def test_dp_train_loop_matches_sequential_dp_steps():
    """make_parallel_train_loop(inner=2) must be bitwise the 2-call
    sequential shard_mapped loop (same PRNG stream, same update order),
    with per-update stacked metrics."""
    from autonomous_quadrotor_environment_tpu.parallel import make_parallel_train_loop

    mesh = make_dp_mesh(8)
    env_cfg = EnvConfig(n_steps=50)
    ppo_cfg = PPOConfig(k_epochs=2)
    train_cfg = TrainConfig(num_envs=32, rollout_steps=8, network_size=16)
    model, tx, state = ppo_init_sharded(
        jax.random.PRNGKey(0), env_cfg, ppo_cfg, train_cfg, mesh
    )
    step = make_parallel_train_step(model, tx, env_cfg, ppo_cfg, train_cfg, mesh)
    loop = make_parallel_train_loop(model, tx, env_cfg, ppo_cfg, train_cfg, mesh, inner=2)

    seq_state, seq_losses = state, []
    for _ in range(2):
        seq_state, m = step(seq_state)
        seq_losses.append(np.asarray(m["loss"]))
    loop_state, stacked = loop(state)

    assert int(loop_state.update_i) == 2
    assert stacked["loss"].shape == (2,)
    np.testing.assert_array_equal(
        np.asarray(loop_state.params["params"]["actor"]["Dense_0"]["kernel"]),
        np.asarray(seq_state.params["params"]["actor"]["Dense_0"]["kernel"]),
    )
    for i, loss in enumerate(seq_losses):
        np.testing.assert_array_equal(np.asarray(stacked["loss"][i]), loss)
