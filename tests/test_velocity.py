"""Velocity-tracking task (EnvConfig.vel_target_max).

The reference's 30-seed robustness study trained dedicated VELOCITY
controllers (reference: environment/controller/results/seeds/
velocity_training/ checkpoints, analyzed by logger_analyzer.py:5-97; the
frozen landing controller PPO_continuous_drone_velocity_solved.pth is one).
These tests pin the task semantics: per-episode random target, observation
= state-minus-target in the velocity slots, reward/solve on the velocity
error, and bit-identical hover behavior when the task is off.
"""

import jax
import jax.numpy as jnp
import numpy as np

from autonomous_quadrotor_environment_tpu.config import EnvConfig
from autonomous_quadrotor_environment_tpu.envs import hover

VEL_CFG = EnvConfig(vel_target_max=(1.0, 1.0, 1.0))
HOVER_CFG = EnvConfig()


def test_reset_samples_target_in_bounds():
    keys = jax.random.split(jax.random.PRNGKey(0), 64)
    states = jax.jit(jax.vmap(lambda k: hover.reset(k, VEL_CFG)))(keys)
    tgt = np.asarray(states.vel_target)
    assert tgt.shape == (64, 3)
    assert np.all(np.abs(tgt) <= 1.0)
    # Actually random (not collapsed), per-axis spread over the batch.
    assert np.all(tgt.std(axis=0) > 0.3)


def test_hover_task_target_is_zero_and_stream_unchanged():
    """vel_target_max=0 must not consume extra RNG: the sampled initial
    state is bit-identical with the leaf present-but-zero."""
    key = jax.random.PRNGKey(7)
    s_hover = jax.jit(lambda k: hover.reset(k, HOVER_CFG))(key)
    assert np.allclose(np.asarray(s_hover.vel_target), 0.0)
    # The velocity-task reset draws the SAME x0/domain (only k_state differs
    # by the extra gated split).
    s_vel = jax.jit(lambda k: hover.reset(k, VEL_CFG))(key)
    np.testing.assert_allclose(np.asarray(s_hover.x), np.asarray(s_vel.x))


def test_observation_sees_velocity_error():
    """The history window's newest velocity slots are vel - target."""
    key = jax.random.PRNGKey(3)
    state = hover.reset(key, VEL_CFG, det_state=jnp.zeros(13).at[6].set(1.0))
    state, out = jax.jit(lambda s, a: hover.step(s, a, VEL_CFG))(state, jnp.zeros(4))
    # featurizer layout per slot: [action(4), vel(3), quat(4), qdot(4)];
    # newest entry occupies the LAST 15 of the (75,) window.
    newest = np.asarray(out.obs[-15:])
    vel_obs = newest[4:7]
    expect = np.asarray(state.x[1:6:2]) - np.asarray(state.vel_target)
    np.testing.assert_allclose(vel_obs, expect, rtol=1e-6, atol=1e-6)


def test_reward_peaks_when_tracking_target():
    """A quad moving exactly at the target scores the top cascade bonus; the
    same quad judged against a different target does not."""
    tgt = jnp.asarray([0.5, -0.3, 0.2])
    x = jnp.zeros(13).at[6].set(1.0).at[1].set(tgt[0]).at[3].set(tgt[1]).at[5].set(tgt[2])
    base = hover.reset(jax.random.PRNGKey(0), VEL_CFG, det_state=x)
    on_target = base.replace(vel_target=tgt)
    off_target = base.replace(vel_target=-tgt)

    # One zero-ish action step from equilibrium-at-velocity: the error stays
    # tiny for on_target and large for off_target.
    act = jnp.zeros(4)
    step = jax.jit(lambda s: hover.step(s, act, VEL_CFG))
    _, out_on = step(on_target)
    _, out_off = step(off_target)
    assert bool(out_on.solved)
    assert not bool(out_off.solved)
    assert float(out_on.reward) > float(out_off.reward)


def test_targets_resample_on_autoreset():
    """step_autoreset draws a fresh target for the new episode."""
    cfg = EnvConfig(n_steps=3, warmup=0, vel_target_max=(1.0, 1.0, 1.0))
    state = hover.reset(jax.random.PRNGKey(1), cfg)
    first = np.asarray(state.vel_target)

    @jax.jit
    def run(state):
        def body(s, _):
            s, out = hover.step_autoreset(s, jnp.zeros(4), cfg)
            return s, (out.done, s.vel_target)

        return jax.lax.scan(body, state, None, length=16)

    _, (dones, targets) = run(state)
    dones = np.asarray(dones)
    targets = np.asarray(targets)
    assert dones.any(), "episode should end within budget"
    i = int(np.argmax(dones))
    assert not np.allclose(targets[i], first), "fresh episode must resample target"


def test_velocity_task_trains_a_little():
    """A miniaturized training run on the velocity task shows a learning
    signal (same criteria as test_ppo.test_ppo_learns_on_hover: episodes get
    longer or training reward-per-step improves by update 40)."""
    from autonomous_quadrotor_environment_tpu.agents import (
        make_eval_fn,
        make_train_step,
        ppo_init,
    )
    from autonomous_quadrotor_environment_tpu.config import PPOConfig, TrainConfig

    env_cfg = EnvConfig(n_steps=500, vel_target_max=(0.5, 0.5, 0.5))
    ppo_cfg = PPOConfig(k_epochs=10)
    train_cfg = TrainConfig(num_envs=64, rollout_steps=80, network_size=64)
    model, tx, state = ppo_init(jax.random.PRNGKey(42), env_cfg, ppo_cfg, train_cfg)
    step = jax.jit(make_train_step(model, tx, env_cfg, ppo_cfg, train_cfg))
    eval_fn = jax.jit(make_eval_fn(model, env_cfg, episodes=32))

    before = eval_fn(state.params, jax.random.PRNGKey(7))
    rps_first = None
    for i in range(40):
        state, metrics = step(state)
        if i == 0:
            rps_first = float(metrics["reward_per_step"])
    assert bool(jnp.isfinite(metrics["loss"]))
    after = eval_fn(state.params, jax.random.PRNGKey(7))
    longer = float(after["eval_length"]) > float(before["eval_length"]) * 1.2
    rps_improved = float(metrics["reward_per_step"]) > rps_first + 0.02
    assert longer or rps_improved, (before, after, rps_first, metrics)
