"""Determinism discipline + golden-trajectory regression (SURVEY.md §4:
the reference's seed hooks ppo.py:224-228 / quad.seed, and the recommended
golden-trajectory regression tests for the RK4 dynamics)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from autonomous_quadrotor_environment_tpu.agents import ppo_init, rollout_batch
from autonomous_quadrotor_environment_tpu.config import EnvConfig, PPOConfig, TrainConfig
from autonomous_quadrotor_environment_tpu.envs import hover

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "hover_trajectory_v1.npy")


def test_golden_trajectory_regression():
    """Fixed state + action must reproduce the stored 50-step trajectory
    bit-for-bit-close: catches silent dynamics changes."""
    cfg = EnvConfig()
    x0 = jnp.asarray(
        [0.5, -0.2, 0.3, 0.1, -1.0, 0.4, 0.9914449, 0.0871557, 0.0593912,
         0.0261797, 0.2, -0.1, 0.3], jnp.float32,
    )
    s = hover.reset(jax.random.PRNGKey(0), cfg, det_state=x0)
    action = jnp.asarray([0.1, -0.05, 0.02, 0.08], jnp.float32)

    def body(s, _):
        s, _out = hover.step(s, action, cfg)
        return s, s.x

    _, xs = jax.lax.scan(body, s, None, length=50)
    golden = np.load(GOLDEN)
    np.testing.assert_allclose(np.asarray(xs), golden, rtol=2e-5, atol=2e-5)


def test_reset_deterministic_per_seed():
    cfg = EnvConfig()
    a = hover.reset(jax.random.PRNGKey(7), cfg)
    b = hover.reset(jax.random.PRNGKey(7), cfg)
    c = hover.reset(jax.random.PRNGKey(8), cfg)
    np.testing.assert_array_equal(np.asarray(a.x), np.asarray(b.x))
    assert not np.allclose(np.asarray(a.x), np.asarray(c.x))


def test_rollout_deterministic_per_seed():
    """Same seed -> identical rollout tensors; different seed -> different
    (the reference's per-worker seed offsets, ppo.py:224-228)."""
    env_cfg = EnvConfig(n_steps=50)
    ppo_cfg = PPOConfig()
    tc = TrainConfig(num_envs=4, rollout_steps=8, network_size=16)

    def collect(seed):
        model, _tx, state = ppo_init(jax.random.PRNGKey(seed), env_cfg, ppo_cfg, tc)
        _, roll, _ = rollout_batch(
            model, state.params, state.env_states, jax.random.PRNGKey(seed + 100),
            env_cfg, 8,
        )
        return np.asarray(roll.rewards), np.asarray(roll.actions)

    r1, a1 = collect(0)
    r2, a2 = collect(0)
    r3, a3 = collect(1)
    np.testing.assert_array_equal(r1, r2)
    np.testing.assert_array_equal(a1, a2)
    assert not np.array_equal(a1, a3)
