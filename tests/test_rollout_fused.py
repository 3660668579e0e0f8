"""Fused whole-rollout Pallas kernel (ops/rollout_fused.py).

Strategy: the kernel ships with an executable spec — `rollout_twin`, the
same per-step math as a plain lax.scan — and three layers of evidence:

  1. `step_math` (the shared transposed step) reproduces `hover.step`
     exactly (same constants, same order, reward/done/solved included).
  2. The kernel (interpret mode on CPU) matches the twin bit-for-bit
     modulo float reassociation, including the pool auto-reset path.
  3. `rollout_batch_fused` plugs into the real train step and trains.

Reference behavior: the rollout worker loop environment/controller/
ppo.py:233-266 over quadrotor_env.py:458-509.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autonomous_quadrotor_environment_tpu.agents.networks import ActorCritic
from autonomous_quadrotor_environment_tpu.config import EnvConfig
from autonomous_quadrotor_environment_tpu.envs import hover
from autonomous_quadrotor_environment_tpu.ops import rollout_fused as rf

B = 16


@pytest.fixture(scope="module")
def setup():
    cfg = EnvConfig()
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states = jax.jit(jax.vmap(lambda k: hover.reset(k, cfg)))(keys)
    params = ActorCritic(hidden=128, action_std=0.1).init(
        jax.random.PRNGKey(2), jnp.zeros((1, 75))
    )
    return cfg, states, rf.transpose_leaves(params)


def test_pack_unpack_roundtrip(setup):
    cfg, states, _ = setup
    s = rf.pack_env_state(states)
    assert s.shape == (rf.ROWS, B) and s.dtype == jnp.float32
    back = rf.unpack_env_state(s, states)
    for name in (
        "x", "hist", "i", "prev_shaping", "has_shaping", "prev_ang", "ang",
        "done", "solved", "abs_sum", "last_action", "vel_target", "ang_vel",
    ):
        np.testing.assert_allclose(
            np.asarray(getattr(back, name), np.float32),
            np.asarray(getattr(states, name), np.float32),
            rtol=1e-6, atol=1e-6, err_msg=name,
        )


def test_step_math_matches_hover_step(setup):
    cfg, states, _ = setup
    s = rf.pack_env_state(states)
    action = jax.random.uniform(jax.random.PRNGKey(1), (B, 4), minval=-1.2, maxval=1.2)
    stepped, out = jax.jit(jax.vmap(lambda st, a: hover.step(st, a, cfg)))(
        states, action
    )
    C = rf._scalars(cfg)
    s_next, reward, done, solved = jax.jit(lambda s, a: rf.step_math(s, a, C))(
        s, action.T
    )
    ref = rf.pack_env_state(stepped)
    # Everything except the kernel-only slot row (102) and padding.
    groups = {
        "dynamics": (0, 13), "hist": (13, 88), "prev_ang": (88, 91),
        "vel_target": (91, 94), "last_action": (94, 98),
        "counters": (98, 102), "flags": (103, 105), "ang_vel": (105, 108),
    }
    for name, (lo, hi) in groups.items():
        np.testing.assert_allclose(
            np.asarray(s_next[lo:hi]), np.asarray(ref[lo:hi]),
            rtol=2e-4, atol=2e-5, err_msg=name,
        )
    np.testing.assert_allclose(
        np.asarray(reward[0]), np.asarray(out.reward), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_array_equal(
        np.asarray(done[0]) > 0.5, np.asarray(out.done)
    )
    np.testing.assert_array_equal(
        np.asarray(solved[0]) > 0.5, np.asarray(out.solved)
    )


def test_atan2_asin_approximations():
    rng = np.random.RandomState(0)
    ys = rng.uniform(-3, 3, (512,)).astype(np.float32)
    xs = rng.uniform(-3, 3, (512,)).astype(np.float32)
    approx = np.asarray(rf._atan2(jnp.asarray(ys)[None], jnp.asarray(xs)[None]))[0]
    assert np.abs(approx - np.arctan2(ys, xs)).max() < 3e-6
    ts = rng.uniform(-1, 1, (512,)).astype(np.float32)
    ap = np.asarray(rf._asin(jnp.asarray(ts)[None]))[0]
    assert np.abs(ap - np.arcsin(ts)).max() < 1e-5
    # Axis/edge cases.
    for y, x in ((0.0, 1.0), (0.0, -1.0), (1.0, 0.0), (-1.0, 0.0), (0.0, 0.0)):
        got = float(rf._atan2(jnp.full((1, 1), y), jnp.full((1, 1), x))[0, 0])
        assert abs(got - np.arctan2(y, x)) < 1e-6, (y, x)


def _rollout_pair(cfg, states, wT, steps, p_size, key, t_chunk):
    """Run twin and interpret-mode kernel on identical inputs."""
    s0 = rf.pack_env_state(states)
    k_noise, k_pool = jax.random.split(key)
    noise = jax.random.normal(k_noise, (steps, 4, B))
    pool_keys = jax.random.split(k_pool, (p_size, B))
    pool_states = jax.jit(jax.vmap(jax.vmap(lambda k: hover.reset(k, cfg))))(pool_keys)
    pool = jax.vmap(rf.pack_env_state)(pool_states)
    C = rf._scalars(cfg)
    s_fin_t, outs_t = jax.jit(
        lambda *a: rf.rollout_twin(*a, C=C, action_std=0.1)
    )(s0, noise, pool, wT)
    s_fin_k, obs_k, misc_k = rf.fused_rollout(
        s0, noise, pool, wT, cfg, 0.1, tile=8, t_chunk=t_chunk, interpret=True
    )
    return (s_fin_t, outs_t), (s_fin_k, obs_k, misc_k)


def test_kernel_matches_twin(setup):
    cfg, states, wT = setup
    (s_t, outs_t), (s_k, obs_k, misc_k) = _rollout_pair(
        cfg, states, wT, steps=8, p_size=2, key=jax.random.PRNGKey(3), t_chunk=4
    )
    obs_t, act_t, lp_t, val_t, rew_t, done_t, solved_t = outs_t
    np.testing.assert_allclose(np.asarray(obs_k), np.asarray(obs_t), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(misc_k[:, 0:4]), np.asarray(act_t), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(misc_k[:, 4:8]), np.asarray(lp_t), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(misc_k[:, 8:9]), np.asarray(val_t), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(misc_k[:, 9:10]), np.asarray(rew_t), rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(misc_k[:, 10:11]), np.asarray(done_t))
    np.testing.assert_allclose(np.asarray(s_k), np.asarray(s_t), rtol=1e-5, atol=1e-5)


def test_kernel_matches_twin_with_resets(setup):
    """Tight bounding box forces terminations -> pool selects + slot wraps."""
    cfg, _, wT = setup
    cfg2 = dataclasses.replace(cfg, bb_scale=0.15)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states2 = jax.jit(jax.vmap(lambda k: hover.reset(k, cfg2)))(keys)
    (s_t, outs_t), (s_k, obs_k, misc_k) = _rollout_pair(
        cfg2, states2, wT, steps=32, p_size=2, key=jax.random.PRNGKey(5), t_chunk=8
    )
    n_dones = float(np.asarray(outs_t[5]).sum())
    assert n_dones > 2 * B, "reset path not exercised"
    assert float(np.asarray(s_k[rf._SLOT]).max()) > 2, "pool wrap not exercised"
    np.testing.assert_allclose(np.asarray(obs_k), np.asarray(outs_t[0]), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(misc_k[:, 9:10]), np.asarray(outs_t[4]), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(s_k), np.asarray(s_t), rtol=1e-5, atol=1e-5)


def test_rollout_batch_fused_trains():
    """End-to-end: the fused rollout feeds ppo_update and the train step
    runs (CPU interpret) with finite metrics and sane Rollout shapes."""
    from autonomous_quadrotor_environment_tpu.agents import make_train_step, ppo_init
    from autonomous_quadrotor_environment_tpu.config import PPOConfig, TrainConfig

    env_cfg = EnvConfig()
    ppo_cfg = PPOConfig(k_epochs=2, minibatch_size=0)
    train_cfg = TrainConfig(
        num_envs=B, rollout_steps=8, network_size=32, fused_rollout=True
    )
    model, tx, state = ppo_init(jax.random.PRNGKey(0), env_cfg, ppo_cfg, train_cfg)
    step = jax.jit(make_train_step(model, tx, env_cfg, ppo_cfg, train_cfg))
    state, metrics = step(state)
    state, metrics = step(state)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["reward_per_step"]))
    assert int(state.update_i) == 2


def test_termination_agreement_statistical():
    """Bound the Cephes-approximation drift on terminations (ADVICE r3).

    The fused kernel computes Euler angles with ~3e-6-max-error f32
    atan2/asin (rf._atan2/_asin), so fused and XLA rollouts can disagree on
    razor-edge done/solved decisions. The twin test can't see this (it uses
    the same approximations). Here: a large batch of random states —
    including copies perturbed toward the bounding box, under a tight box
    that actually terminates — stepped once by both `hover.step` (exact
    trig) and `rf.step_math`; the done/solved bits must agree on all but a
    vanishing fraction of rows."""
    n = 4096
    cfg = dataclasses.replace(EnvConfig(), bb_scale=0.3)
    keys = jax.random.split(jax.random.PRNGKey(11), n)
    states = jax.jit(jax.vmap(lambda k: hover.reset(k, cfg)))(keys)
    # Push half the batch outward so plenty of rows straddle the box.
    scale = jnp.where(jnp.arange(n) % 2 == 0, 1.0, 2.5)[:, None]
    states = states.replace(x=states.x * scale)
    actions = jax.random.uniform(
        jax.random.PRNGKey(12), (n, 4), minval=-1.2, maxval=1.2
    )

    _, out = jax.jit(jax.vmap(lambda s, a: hover.step(s, a, cfg)))(states, actions)
    C = rf._scalars(cfg)
    s_packed = rf.pack_env_state(states)
    _, _, done_k, solved_k = jax.jit(lambda s, a: rf.step_math(s, a, C))(
        s_packed, actions.T
    )

    done_x = np.asarray(out.done)
    solved_x = np.asarray(out.solved)
    done_f = np.asarray(done_k[0]) > 0.5
    solved_f = np.asarray(solved_k[0]) > 0.5
    assert done_x.sum() > 100, "termination path not exercised"
    # <=0.1% disagreement: drift only on rows within float-noise of a cut.
    assert np.mean(done_x != done_f) <= 1e-3, np.mean(done_x != done_f)
    assert np.mean(solved_x != solved_f) <= 1e-3


def test_supports_gating():
    cfg = EnvConfig()
    assert rf.supports(cfg, learn_std=False, obs_dim=75)
    assert not rf.supports(cfg, learn_std=True, obs_dim=75)
    assert not rf.supports(cfg, learn_std=False, obs_dim=60)
    rand_on = dataclasses.replace(
        cfg, randomization=dataclasses.replace(cfg.randomization, enabled=True)
    )
    assert not rf.supports(rand_on, learn_std=False, obs_dim=75)
    indirect = dataclasses.replace(cfg, direct_control=False)
    assert not rf.supports(indirect, learn_std=False, obs_dim=75)
