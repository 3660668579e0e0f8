"""Generalized Advantage Estimation as a reverse `lax.scan`.

Matches the reference's `get_advantages` semantics
(reference: environment/controller/ppo.py:125-141 and
visual_landing/ppo_trainer.py:133-148):

    delta_i  = r_i + gamma * v_{i+1} * mask_i - v_i
    gae_i    = delta_i + gamma * lambda * mask_i * gae_{i+1}
    return_i = gae_i + v_i
    adv      = (return - v) normalized by mean/std (+1e-10)

where ``mask_i = !done_i`` and ``v_{T}`` is a bootstrap value — the reference
appends a literal 0 (ppo.py:385) because its rollouts always end on a
terminal step (mask 0 kills the bootstrap); the batched TPU rollout truncates
episodes at the scan boundary, so the caller passes ``v(s_T)`` instead.
The reference's unreachable ``i == len(rewards)`` branch (ppo.py:132-133)
is dead code and intentionally not replicated.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gae_advantages(
    rewards: jnp.ndarray,      # (T, ...) per-step rewards
    values: jnp.ndarray,       # (T, ...) state values v(s_0..s_{T-1})
    dones: jnp.ndarray,        # (T, ...) terminal flags
    bootstrap_value: jnp.ndarray,  # (...,)  v(s_T)
    gamma: float = 0.99,
    lam: float = 0.99,
    normalize: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns ``(returns, advantages)``, each shaped like ``rewards``.

    Works for flat (T,) or batched (T, B) inputs — the scan runs over the
    leading time axis and broadcasts over the rest.
    """
    masks = 1.0 - dones.astype(values.dtype)
    next_values = jnp.concatenate([values[1:], bootstrap_value[None]], axis=0)

    def body(gae, inp):
        reward, value, next_value, mask = inp
        delta = reward + gamma * next_value * mask - value
        gae = delta + gamma * lam * mask * gae
        return gae, gae

    _, gaes = jax.lax.scan(
        body,
        jnp.zeros_like(bootstrap_value),
        (rewards.astype(values.dtype), values, next_values, masks),
        reverse=True,
    )
    returns = gaes + values
    advantages = gaes
    if normalize:
        advantages = (advantages - jnp.mean(advantages)) / (jnp.std(advantages) + 1e-10)
    return returns, advantages
