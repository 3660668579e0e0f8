"""PPO trainer validation.

GAE is checked against a literal numpy port of the reference's
`get_advantages` loop (reference ppo.py:125-141); the trainer is checked for
shape/finiteness and for actual learning progress on the hover task over a
handful of updates (SURVEY.md §4: eval-as-integration-test, miniaturized).
"""

import jax
import jax.numpy as jnp
import numpy as np

from autonomous_quadrotor_environment_tpu.agents import (
    gae_advantages,
    make_eval_fn,
    make_train_step,
    ppo_init,
    rollout_batch,
)
from autonomous_quadrotor_environment_tpu.agents.networks import ActorCritic, DiagGaussian
from autonomous_quadrotor_environment_tpu.agents.ppo import make_optimizer
from autonomous_quadrotor_environment_tpu.config import EnvConfig, PPOConfig, TrainConfig


def reference_gae(values, masks, rewards, gamma=0.99, lmbda=0.99):
    """Literal numpy port of the reference loop (ppo.py:125-141): `values`
    has one bootstrap entry appended at the end."""
    returns = []
    gae = 0.0
    for i in reversed(range(len(rewards))):
        delta = rewards[i] + gamma * values[i + 1] * masks[i] - values[i]
        gae = delta + gamma * lmbda * masks[i] * gae
        returns.insert(0, gae + values[i])
    returns = np.array(returns)
    adv = returns - values[:-1]
    return returns, (adv - np.mean(adv)) / (np.std(adv) + 1e-10)


def test_gae_matches_reference_loop():
    rng = np.random.default_rng(0)
    t = 57
    rewards = rng.normal(size=t).astype(np.float32)
    values = rng.normal(size=t + 1).astype(np.float32)
    dones = (rng.random(t) < 0.1).astype(np.float32)
    masks = 1.0 - dones

    ref_returns, ref_adv = reference_gae(values, masks, rewards)
    returns, adv = gae_advantages(
        jnp.asarray(rewards),
        jnp.asarray(values[:-1]),
        jnp.asarray(dones),
        jnp.asarray(values[-1]),
    )
    np.testing.assert_allclose(np.asarray(returns), ref_returns, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(adv), ref_adv, rtol=1e-4, atol=1e-5)


def test_gae_batched_consistent_with_flat():
    rng = np.random.default_rng(1)
    t, b = 31, 4
    rewards = rng.normal(size=(t, b)).astype(np.float32)
    values = rng.normal(size=(t, b)).astype(np.float32)
    boot = rng.normal(size=b).astype(np.float32)
    dones = (rng.random((t, b)) < 0.1).astype(np.float32)

    returns_b, _ = gae_advantages(
        jnp.asarray(rewards), jnp.asarray(values), jnp.asarray(dones), jnp.asarray(boot),
        normalize=False,
    )
    for j in range(b):
        returns_f, _ = gae_advantages(
            jnp.asarray(rewards[:, j]), jnp.asarray(values[:, j]),
            jnp.asarray(dones[:, j]), jnp.asarray(boot[j]), normalize=False,
        )
        np.testing.assert_allclose(
            np.asarray(returns_b[:, j]), np.asarray(returns_f), rtol=1e-5, atol=1e-5
        )


def test_diag_gaussian_matches_normal_logpdf():
    from scipy import stats

    mean = jnp.asarray([0.3, -0.2, 0.0, 1.0])
    log_std = jnp.log(jnp.asarray(0.1))
    dist = DiagGaussian(mean, log_std)
    x = jnp.asarray([0.25, -0.1, 0.05, 0.9])
    got = np.asarray(dist.log_prob(x))
    want = stats.norm.logpdf(np.asarray(x), np.asarray(mean), 0.1)
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # entropy of N(mu, 0.1): 0.5*log(2*pi*e*sigma^2)
    want_h = 0.5 * np.log(2 * np.pi * np.e * 0.1**2)
    np.testing.assert_allclose(np.asarray(dist.entropy()), want_h, rtol=1e-6)


def test_rollout_shapes_and_autoreset():
    env_cfg = EnvConfig(n_steps=50)
    ppo_cfg = PPOConfig()
    train_cfg = TrainConfig(num_envs=8, rollout_steps=16, network_size=16)
    model, _tx, state = ppo_init(jax.random.PRNGKey(0), env_cfg, ppo_cfg, train_cfg)
    env_states, roll, boot = rollout_batch(
        model, state.params, state.env_states, jax.random.PRNGKey(1), env_cfg, 16
    )
    assert roll.obs.shape == (16, 8, 75)
    assert roll.actions.shape == (16, 8, 4)
    assert roll.values.shape == (16, 8)
    assert boot.shape == (8,)
    assert np.isfinite(np.asarray(roll.rewards)).all()
    # With random-normal inits many envs leave the bounding box within 16
    # steps — dones must fire and the carried step counters stay within
    # bounds (auto-reset).
    assert int(env_states.i.max()) <= env_cfg.max_steps + 16


def test_train_step_runs_and_is_finite():
    env_cfg = EnvConfig(n_steps=100)
    ppo_cfg = PPOConfig(k_epochs=2)
    train_cfg = TrainConfig(num_envs=8, rollout_steps=32, network_size=16)
    model, tx, state = ppo_init(jax.random.PRNGKey(0), env_cfg, ppo_cfg, train_cfg)
    train_step = jax.jit(make_train_step(model, tx, env_cfg, ppo_cfg, train_cfg))
    state, metrics = train_step(state)
    state, metrics = train_step(state)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["reward_per_step"]))
    assert int(state.update_i) == 2


def test_train_loop_matches_sequential_steps():
    """make_train_loop(inner=3) must be bitwise the 3-call sequential loop
    (same PRNG stream, same update order) with per-update stacked metrics."""
    from autonomous_quadrotor_environment_tpu.agents import make_train_loop

    env_cfg = EnvConfig(n_steps=100)
    ppo_cfg = PPOConfig(k_epochs=2)
    train_cfg = TrainConfig(num_envs=8, rollout_steps=32, network_size=16)
    model, tx, state = ppo_init(jax.random.PRNGKey(0), env_cfg, ppo_cfg, train_cfg)
    train_step = jax.jit(make_train_step(model, tx, env_cfg, ppo_cfg, train_cfg))
    loop = jax.jit(make_train_loop(model, tx, env_cfg, ppo_cfg, train_cfg, inner=3))

    seq_state, seq_metrics = state, []
    for _ in range(3):
        seq_state, m = train_step(seq_state)
        seq_metrics.append(m)
    loop_state, loop_metrics = loop(state)

    assert int(loop_state.update_i) == 3
    np.testing.assert_array_equal(
        np.asarray(loop_state.params["params"]["actor"]["Dense_0"]["kernel"]),
        np.asarray(seq_state.params["params"]["actor"]["Dense_0"]["kernel"]),
    )
    assert loop_metrics["loss"].shape == (3,)
    for i, m in enumerate(seq_metrics):
        np.testing.assert_array_equal(
            np.asarray(loop_metrics["loss"][i]), np.asarray(m["loss"])
        )


def test_ppo_learns_on_hover():
    """A miniaturized training run must improve the evaluation reward — the
    same solved-rate criterion as the reference's log (SURVEY.md §6), scaled
    down to seconds of CPU time."""
    env_cfg = EnvConfig(n_steps=500)
    ppo_cfg = PPOConfig(k_epochs=10)
    train_cfg = TrainConfig(num_envs=64, rollout_steps=80, network_size=64)
    model, tx, state = ppo_init(jax.random.PRNGKey(42), env_cfg, ppo_cfg, train_cfg)
    train_step = jax.jit(make_train_step(model, tx, env_cfg, ppo_cfg, train_cfg))
    eval_fn = jax.jit(make_eval_fn(model, env_cfg, episodes=32))

    before = eval_fn(state.params, jax.random.PRNGKey(7))
    rps_first = None
    for i in range(40):
        state, metrics = train_step(state)
        if i == 0:
            rps_first = float(metrics["reward_per_step"])
    after = eval_fn(state.params, jax.random.PRNGKey(7))
    # Learning signals on this short budget (empirically length ~1.6x and
    # training reward-per-step roughly halves its magnitude by update 40):
    longer = float(after["eval_length"]) > float(before["eval_length"]) * 1.2
    rps_improved = float(metrics["reward_per_step"]) > rps_first + 0.02
    assert longer or rps_improved, (before, after, rps_first, metrics)


def test_minibatched_update_matches_fullbatch_shapes():
    env_cfg = EnvConfig(n_steps=50)
    ppo_cfg = PPOConfig(k_epochs=1, minibatch_size=64)
    train_cfg = TrainConfig(num_envs=8, rollout_steps=32, network_size=16)
    model, tx, state = ppo_init(jax.random.PRNGKey(0), env_cfg, ppo_cfg, train_cfg)
    train_step = jax.jit(make_train_step(model, tx, env_cfg, ppo_cfg, train_cfg))
    state, metrics = train_step(state)
    assert np.isfinite(float(metrics["loss"]))


def test_reset_pool_pulls_fresh_episode_after_done():
    """With the per-rollout reset pool, an env that terminates must carry a
    fresh episode (step counter back at warmup) on the next scan step."""
    env_cfg = EnvConfig(n_steps=4)  # forces timeout dones inside the rollout
    ppo_cfg = PPOConfig()
    train_cfg = TrainConfig(num_envs=8, rollout_steps=16, network_size=16)
    model, _tx, state = ppo_init(jax.random.PRNGKey(0), env_cfg, ppo_cfg, train_cfg)
    env_states, roll, _ = rollout_batch(
        model, state.params, state.env_states, jax.random.PRNGKey(1), env_cfg, 16,
        reset_pool=4,
    )
    # Every env times out at i = n_steps + warmup = 9 repeatedly in 16 steps.
    assert int(np.asarray(roll.dones).sum()) >= 8
    assert int(env_states.i.max()) <= env_cfg.max_steps
    # Pooled and exact-reset rollouts agree on the observable schema.
    env_states0, roll0, _ = rollout_batch(
        model, state.params, state.env_states, jax.random.PRNGKey(1), env_cfg, 16,
        reset_pool=0,
    )
    assert roll0.dones.shape == roll.dones.shape
    np.testing.assert_array_equal(np.asarray(roll0.dones), np.asarray(roll.dones))


def test_block_shuffle_minibatch_update_runs():
    """shuffle_block>1 (contiguous-block minibatches) and the reference's
    per-row shuffle both produce finite training steps."""
    env_cfg = EnvConfig(n_steps=50)
    train_cfg = TrainConfig(num_envs=8, rollout_steps=32, network_size=16)
    for block in (16, 1):
        ppo_cfg = PPOConfig(k_epochs=2, minibatch_size=64, shuffle_block=block)
        model, tx, state = ppo_init(jax.random.PRNGKey(0), env_cfg, ppo_cfg, train_cfg)
        train_step = jax.jit(make_train_step(model, tx, env_cfg, ppo_cfg, train_cfg))
        state, metrics = train_step(state)
        assert np.isfinite(float(metrics["loss"])), block
