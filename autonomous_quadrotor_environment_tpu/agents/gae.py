"""Generalized Advantage Estimation as a parallel prefix (associative) scan.

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

The recurrence ``gae_i = delta_i + (gamma*lam*mask_i) * gae_{i+1}`` is a
first-order linear (affine) recurrence, so instead of a sequential
reverse `lax.scan` — which at T=256 lowers to 256 dependent micro-kernels
and was measured LATENCY-bound at 57.3 ms of the 236 ms train step
(runs/r3/perf_probe.json `update_parts.gae_ms`) — it is evaluated as a
`lax.associative_scan` over affine maps: composing ``f(x) = a*x + b``
pairs ``(a1*a2, a2*b1 + b2)`` needs only ceil(log2 T) full-width passes.
Same math, float-reassociated (differences ~1e-6 relative; the sequential
reference lives in tests/test_ppo.py::reference_gae).
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
    delta = rewards.astype(values.dtype) + gamma * next_values * masks - values
    coef = gamma * lam * masks

    # gae_i = delta_i + coef_i * gae_{i+1}: compose the affine maps
    # x -> a*x + b front-to-back with associative_scan in reverse. Applying
    # f2 after f1 gives a2*(a1*x + b1) + b2 = (a1*a2)*x + (a2*b1 + b2).
    def compose(f1, f2):
        a1, b1 = f1
        a2, b2 = f2
        return a1 * a2, a2 * b1 + b2

    _, gaes = jax.lax.associative_scan(compose, (coef, delta), reverse=True)
    returns = gaes + values
    advantages = gaes
    if normalize:
        advantages = (advantages - jnp.mean(advantages)) / (jnp.std(advantages) + 1e-10)
    return returns, advantages
