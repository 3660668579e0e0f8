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


def test_severity_sample_spans_calm_to_windy():
    """severity_sample=True: each episode draws s~U[0,1] scaling every
    perturbation, so one batch contains near-calm AND near-full episodes;
    mid-episode gust resamples honor the same episode severity via
    DomainParams.gust_scale."""
    cfg = RandomizationConfig(enabled=True, severity_sample=True)
    keys = jax.random.split(jax.random.PRNGKey(0), 1024)
    doms = jax.jit(jax.vmap(lambda k: sample_domain(k, cfg)))(keys)
    sev = np.asarray(doms.gust_scale)
    assert sev.shape == (1024,)
    assert 0.0 <= sev.min() < 0.05 and 0.95 < sev.max() <= 1.0  # spans U[0,1]
    # magnitudes track the episode severity: |gust_next| is bounded by
    # what the severity allows, and low-severity episodes are near-calm
    gust = np.abs(np.asarray(doms.gust_next))
    calm = sev < 0.1
    windy = sev > 0.9
    assert gust[calm].max() < gust[windy].mean() + 1e-6
    assert np.abs(np.asarray(doms.mass_factor)[calm]).max() <= 0.1 * 2 * cfg.d_m + 1e-6

    # wind_update resamples scale with gust_scale: a zero-severity episode
    # never sees wind
    dom0 = jax.tree.map(lambda a: a[int(np.argmin(sev))], doms)
    dom0 = dom0.replace(gust_scale=jnp.zeros(()), gust_next=jnp.zeros(3))
    dom, w = wind_update(dom0, jax.random.PRNGKey(5), jnp.asarray(1), cfg)
    np.testing.assert_allclose(np.asarray(dom.gust_next), 0.0)

    # default path is unchanged: severity_sample=False keeps gust_scale = 1
    base = RandomizationConfig(enabled=True)
    dom_b = sample_domain(jax.random.PRNGKey(7), base)
    assert float(dom_b.gust_scale) == 1.0


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
