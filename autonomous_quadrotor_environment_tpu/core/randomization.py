"""Per-episode domain randomization and wind-gust model.

Functional re-design of the reference's `robust_control` class
(reference: environment/quadrotor_env.py:84-109): the randomized physics are a
pytree sampled at reset and carried in the environment state, so a `vmap`
over envs gives every quadrotor its own perturbed physics — the TPU-native
equivalent of the reference's per-process episode randomization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..config import RandomizationConfig


@struct.dataclass
class DomainParams:
    """Episode-constant physics perturbations + wind-gust interpolation state.

    All leaves are arrays so the pytree vmaps over a batch of envs.
    """

    kf_degrade: jnp.ndarray   # (4,)  motor force loss factor, U[0, d_kf)
    mass_factor: jnp.ndarray  # ()    mass multiplier offset, N(0, d_m)
    ir_factor: jnp.ndarray    # (4,)  rotor inertia factor, U[0, d_ir)
    j_factor: jnp.ndarray     # (3,)  inertia diagonal factor, N(0, d_j)
    gust_last: jnp.ndarray    # (3,)  previous wind gust [m/s]
    gust_next: jnp.ndarray    # (3,)  current wind gust target [m/s]
    gust_scale: jnp.ndarray   # ()    per-episode wind severity multiplier


def zeros_domain(dtype=jnp.float32) -> DomainParams:
    """Identity (non-randomized) domain parameters."""
    z3 = jnp.zeros(3, dtype)
    return DomainParams(
        kf_degrade=jnp.zeros(4, dtype),
        mass_factor=jnp.zeros((), dtype),
        ir_factor=jnp.zeros(4, dtype),
        j_factor=jnp.zeros(3, dtype),
        gust_last=z3,
        gust_next=z3,
        gust_scale=jnp.ones((), dtype),
    )


def sample_domain(key: jax.Array, cfg: RandomizationConfig, dtype=jnp.float32) -> DomainParams:
    """Sample per-episode perturbations (reference quadrotor_env.py:97-101).

    When `cfg.enabled` is False, returns identity parameters — same shapes,
    so the env step compiles once for both modes.
    """
    if not cfg.enabled:
        return zeros_domain(dtype)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    gust_std = jnp.asarray(cfg.gust_std, dtype)
    # Per-episode severity (cfg.severity_sample): one s ~ U[0, 1] scales
    # every magnitude below, so a training batch spans calm..full-windy
    # regimes (see RandomizationConfig). The extra split is gated statically
    # so the severity_sample=False RNG stream is unchanged.
    if cfg.severity_sample:
        key, k_sev = jax.random.split(k5)
        sev = jax.random.uniform(k_sev, (), dtype)
        k5 = key
    else:
        sev = jnp.ones((), dtype)
    # The normal factors are clipped to +/-2 sigma: the reference samples
    # unbounded normals (quadrotor_env.py:98-100), which at our batched
    # episode counts eventually draws mass_factor <= -1 (non-positive mass,
    # NaN dynamics) — a latent reference bug surfaced by scale, fixed as a
    # documented divergence.
    return DomainParams(
        kf_degrade=jax.random.uniform(k1, (4,), dtype) * cfg.d_kf * sev,
        mass_factor=sev * jnp.clip(
            jax.random.normal(k2, (), dtype) * cfg.d_m, -2.0 * cfg.d_m, 2.0 * cfg.d_m
        ),
        ir_factor=jax.random.uniform(k3, (4,), dtype) * cfg.d_ir * sev,
        j_factor=sev * jnp.clip(
            jax.random.normal(k4, (3,), dtype) * cfg.d_j, -2.0 * cfg.d_j, 2.0 * cfg.d_j
        ),
        gust_last=jnp.zeros(3, dtype),
        gust_next=jax.random.normal(k5, (3,), dtype) * gust_std * sev,
        gust_scale=sev,
    )


def wind_update(
    dom: DomainParams, key: jax.Array, i: jnp.ndarray, cfg: RandomizationConfig
) -> tuple[DomainParams, jnp.ndarray]:
    """Advance the gust state and return the interpolated wind for step ``i``.

    Reference quadrotor_env.py:103-109: a new gust is drawn every
    ``gust_period`` steps and the wind ramps linearly from the previous gust
    to the new one over the period. The reference materializes a
    ``linspace(last, gust, period)`` table; here the interpolation is
    computed in closed form (same values), which keeps the env state small
    and the step branch-free:  ``w(i) = last + (next-last) * idx/(period-1)``
    with ``idx = (i % period) - 1`` and a resample when ``idx == 0``.
    """
    if not cfg.enabled:
        return dom, jnp.zeros(3, dom.gust_last.dtype)
    period = cfg.gust_period
    idx = (i % period) - 1
    resample = idx == 0
    gust_std = jnp.asarray(cfg.gust_std, dom.gust_next.dtype)
    # Mid-episode resamples honor the episode's severity draw (gust_scale
    # is 1 unless cfg.severity_sample put the episode at severity s).
    new_gust = jax.random.normal(key, (3,), dom.gust_next.dtype) * gust_std * dom.gust_scale
    gust_last = jnp.where(resample, dom.gust_next, dom.gust_last)
    gust_next = jnp.where(resample, new_gust, dom.gust_next)
    frac = jnp.clip(idx, 0, period - 1).astype(dom.gust_next.dtype) / (period - 1)
    wind = gust_last + (gust_next - gust_last) * frac
    return dom.replace(gust_last=gust_last, gust_next=gust_next), wind
