"""Transposed fused PPO update kernel (ops/ppo_fused_t.py).

Pinned three ways: against the row-major fused kernel (ops/ppo_fused.py),
against the XLA `ppo_loss` gradient on the identical minibatch rows, and
end-to-end — the fully fused train path (rollout kernel -> GAE ->
transposed update) must reproduce the materialized fused path's updated
parameters from the same RNG keys.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from autonomous_quadrotor_environment_tpu.agents.networks import ActorCritic
from autonomous_quadrotor_environment_tpu.agents.ppo import (
    ppo_loss,
    ppo_update,
    ppo_update_t,
    rollout_batch_fused,
    rollout_batch_fused_raw,
    update_t_tile,
)
from autonomous_quadrotor_environment_tpu.config import EnvConfig, PPOConfig
from autonomous_quadrotor_environment_tpu.envs import hover
from autonomous_quadrotor_environment_tpu.ops.ppo_fused import fused_ppo_grad, pack_aux
from autonomous_quadrotor_environment_tpu.ops.ppo_fused_t import fused_ppo_grad_t
from autonomous_quadrotor_environment_tpu.ops.rollout_fused import transpose_leaves

T_STEPS, B, TILE = 4, 128, 64


@pytest.fixture(scope="module")
def data():
    model = ActorCritic(hidden=128, action_std=0.1)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 75)))
    k = jax.random.split(jax.random.PRNGKey(1), 5)
    n = T_STEPS * B
    obs = jax.random.normal(k[0], (n, 75)) * 0.3
    actions = jax.random.normal(k[1], (n, 4)) * 0.2
    old_lp = jax.random.normal(k[2], (n, 4)) * 0.1 - 1.0
    rets = jax.random.normal(k[3], (n,))
    advs = jax.random.normal(k[4], (n,))
    return model, params, obs, actions, old_lp, rets, advs


def test_grad_t_matches_row_major_and_xla(data):
    model, params, obs, actions, old_lp, rets, advs = data
    cfg = PPOConfig()
    n = obs.shape[0]
    aux = pack_aux(actions, old_lp, rets, advs)
    # Row-major (n, .) -> transposed (T, ., B): flat row = t * B + b.
    to_t = lambda x: jnp.moveaxis(x.reshape(T_STEPS, B, -1), 2, 1)
    obs_t, aux_t = to_t(obs), to_t(aux)
    blocks = jnp.asarray([1, 4, 6, 3], jnp.int32)  # 4 of the 8 tile-blocks

    loss_r, met_r, grads_r = fused_ppo_grad(
        params, obs, aux, blocks, tile=TILE, action_std=cfg.action_std,
        clip_eps=cfg.clip_eps, entropy_coef=cfg.entropy_coef, interpret=True,
    )
    loss_t, met_t, grads_t = fused_ppo_grad_t(
        params, transpose_leaves(params), obs_t, aux_t, blocks, tile=TILE,
        action_std=cfg.action_std, clip_eps=cfg.clip_eps,
        entropy_coef=cfg.entropy_coef, interpret=True,
    )
    np.testing.assert_allclose(float(loss_t), float(loss_r), rtol=2e-5)
    for key in met_r:
        np.testing.assert_allclose(
            float(met_t[key]), float(met_r[key]), rtol=2e-5, err_msg=key
        )
    for a, b in zip(jax.tree.leaves(grads_t), jax.tree.leaves(grads_r)):
        assert a.shape == b.shape
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-7
        )

    # And against XLA ppo_loss on the same gathered rows.
    rows = (blocks[:, None] * TILE + jnp.arange(TILE)[None]).reshape(-1)
    (loss_x, _), grads_x = jax.value_and_grad(
        lambda p: ppo_loss(
            model, p, obs[rows], actions[rows], old_lp[rows],
            rets[rows], advs[rows], cfg,
        ),
        has_aux=True,
    )(params)
    np.testing.assert_allclose(float(loss_t), float(loss_x), rtol=2e-5)
    for a, b in zip(jax.tree.leaves(grads_t), jax.tree.leaves(grads_x)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-7
        )


def test_fully_fused_path_matches_materialized(data):
    """rollout_batch_fused_raw + ppo_update_t == rollout_batch_fused +
    ppo_update (fused) from the same keys."""
    from autonomous_quadrotor_environment_tpu.agents.gae import gae_advantages

    env_cfg = EnvConfig()
    steps, b = 8, 16
    cfg = PPOConfig(
        k_epochs=3, minibatch_size=64, fused_update=True, shuffle_block=8
    )
    assert update_t_tile(cfg, steps, b) == 8
    model = ActorCritic(hidden=32, action_std=0.1)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 75)))
    tx = optax.adam(cfg.lr, b1=cfg.adam_b1, b2=cfg.adam_b2)
    keys = jax.random.split(jax.random.PRNGKey(7), b)
    states = jax.jit(jax.vmap(lambda k: hover.reset(k, env_cfg)))(keys)
    k_roll, k_upd = jax.random.split(jax.random.PRNGKey(9))

    # Materialized fused path.
    env_a, roll, boot_a = rollout_batch_fused(
        model, params, states, k_roll, env_cfg, steps
    )
    p_a, _, m_a = ppo_update(
        model, tx, params, tx.init(params), roll, boot_a, k_upd, cfg
    )

    # Fully fused path from the SAME keys.
    env_b, obs_t, misc, boot_b = rollout_batch_fused_raw(
        model, params, states, k_roll, env_cfg, steps
    )
    np.testing.assert_allclose(np.asarray(boot_b), np.asarray(boot_a), rtol=1e-6)
    rewards, dones = misc[:, 9], misc[:, 10] > 0.5
    returns, advs = gae_advantages(
        rewards, misc[:, 8], dones, boot_b, cfg.gamma, cfg.gae_lambda
    )
    old_lp_sum = jnp.sum(misc[:, 4:8], axis=1, keepdims=True)
    aux_t = jnp.concatenate(
        [misc[:, 0:4], old_lp_sum, returns[:, None], advs[:, None],
         jnp.zeros_like(old_lp_sum)],
        axis=1,
    )
    p_b, _, m_b = ppo_update_t(
        tx, params, tx.init(params), obs_t, aux_t, k_upd, cfg
    )
    for key in ("loss", "actor_loss", "critic_loss", "ratio_max"):
        np.testing.assert_allclose(
            float(m_b[key]), float(m_a[key]), rtol=5e-4, err_msg=key
        )
    for a, bb in zip(jax.tree.leaves(p_b), jax.tree.leaves(p_a)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), atol=cfg.lr * 0.05, rtol=0
        )


def test_train_step_fast_path_smoke():
    """make_train_step selects the fully fused path and trains (CPU)."""
    from autonomous_quadrotor_environment_tpu.agents import make_train_step, ppo_init
    from autonomous_quadrotor_environment_tpu.config import TrainConfig

    env_cfg = EnvConfig()
    ppo_cfg = PPOConfig(
        k_epochs=2, minibatch_size=64, fused_update=True, shuffle_block=8
    )
    train_cfg = TrainConfig(
        num_envs=16, rollout_steps=8, network_size=32, fused_rollout=True
    )
    model, tx, state = ppo_init(jax.random.PRNGKey(0), env_cfg, ppo_cfg, train_cfg)
    step = jax.jit(make_train_step(model, tx, env_cfg, ppo_cfg, train_cfg))
    state, metrics = step(state)
    state, metrics = step(state)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["solved_frac"]))


def test_update_t_tile_gating():
    cfg = PPOConfig(minibatch_size=0, shuffle_block=1024)
    assert update_t_tile(cfg, 256, 8192) == 1024
    assert update_t_tile(cfg, 256, 96) == 32  # gcd fallback
    # Indivisible minibatch -> ineligible.
    assert update_t_tile(dataclasses.replace(cfg, minibatch_size=1000), 256, 8192) == 0
