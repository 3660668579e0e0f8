"""Domain randomization + wind gusts (reference `robust_control`,
quadrotor_env.py:84-109): per-episode physics perturbations and the
linearly-interpolated gust model."""

import jax
import jax.numpy as jnp
import numpy as np

from autonomous_quadrotor_environment_tpu.config import EnvConfig, RandomizationConfig
from autonomous_quadrotor_environment_tpu.core.randomization import (
    sample_domain,
    wind_update,
    zeros_domain,
)
from autonomous_quadrotor_environment_tpu.envs import hover


def test_sample_domain_magnitudes():
    cfg = RandomizationConfig(enabled=True)
    keys = jax.random.split(jax.random.PRNGKey(0), 512)
    doms = jax.vmap(lambda k: sample_domain(k, cfg))(keys)
    kf = np.asarray(doms.kf_degrade)
    assert kf.min() >= 0.0 and kf.max() < cfg.d_kf  # U[0, d_kf)
    assert abs(np.std(np.asarray(doms.mass_factor)) - cfg.d_m) < 0.05
    assert abs(np.std(np.asarray(doms.j_factor)) - cfg.d_j) < 0.02


def test_sample_domain_disabled_is_identity():
    cfg = RandomizationConfig(enabled=False)
    dom = sample_domain(jax.random.PRNGKey(1), cfg)
    for leaf_a, leaf_b in zip(jax.tree.leaves(dom), jax.tree.leaves(zeros_domain())):
        np.testing.assert_array_equal(np.asarray(leaf_a), np.asarray(leaf_b))


def test_wind_interpolates_linearly_between_gusts():
    cfg = RandomizationConfig(enabled=True, gust_period=100)
    dom = sample_domain(jax.random.PRNGKey(2), cfg)
    key = jax.random.PRNGKey(3)
    winds = []
    for i in range(1, 201):
        dom, w = wind_update(dom, jax.random.fold_in(key, i), jnp.asarray(i), cfg)
        winds.append(np.asarray(w))
    winds = np.stack(winds)
    # within one period the wind ramps linearly: second differences ~ 0
    seg = winds[5:95]
    dd = np.diff(seg, n=2, axis=0)
    assert np.abs(dd).max() < 1e-4
    # and the gust target changes across periods (wind keeps evolving)
    assert np.linalg.norm(winds[150] - winds[50]) > 1e-3


def test_randomized_envs_diverge_from_identical_starts():
    """vmap of randomized envs: same deterministic start, different domain
    params per env -> trajectories separate (the TPU-native equivalent of
    the reference's per-process episode randomization)."""
    cfg = EnvConfig(randomization=RandomizationConfig(enabled=True))
    x0 = jnp.zeros(13).at[4].set(-1.0).at[6].set(1.0)
    keys = jax.random.split(jax.random.PRNGKey(4), 8)
    states = jax.vmap(lambda k: hover.reset(k, cfg, det_state=x0))(keys)
    action = jnp.zeros((8, 4))

    def roll(states):
        def body(s, _):
            s, out = jax.vmap(lambda s_, a: hover.step(s_, a, cfg))(s, action)
            return s, None

        s, _ = jax.lax.scan(body, states, None, length=100)
        return s

    final = jax.jit(roll)(states)
    pos = np.asarray(final.x[:, 0:5:2])
    spread = np.std(pos, axis=0)
    assert spread.max() > 1e-3, spread  # wind + mass/KF perturbations acted

    # and with randomization off, identical starts stay identical
    cfg0 = EnvConfig()
    states0 = jax.vmap(lambda k: hover.reset(k, cfg0, det_state=x0))(keys)
    final0 = jax.jit(
        lambda s: jax.lax.scan(
            lambda c, _: (jax.vmap(lambda s_, a: hover.step(s_, a, cfg0)[0])(c, action), None),
            s, None, length=100,
        )[0]
    )(states0)
    pos0 = np.asarray(final0.x[:, 0:5:2])
    assert np.std(pos0, axis=0).max() < 1e-6


def test_randomization_scaled_curriculum():
    """RandomizationConfig.scaled interpolates all magnitudes (curriculum
    stages for train_control --robust --curriculum)."""
    from autonomous_quadrotor_environment_tpu.config import RandomizationConfig

    base = RandomizationConfig(enabled=True)
    half = base.scaled(0.5)
    assert half.enabled
    assert half.d_m == base.d_m * 0.5
    assert half.gust_std == tuple(g * 0.5 for g in base.gust_std)
    calm = base.scaled(0.0)
    assert not calm.enabled  # zero severity disables randomization outright
    full = base.scaled(1.0)
    assert full == base
