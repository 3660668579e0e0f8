"""Actor-critic networks for the state controller.

Capability match for the reference's `ActorCritic`
(reference: environment/controller/model.py:20-85): a tanh MLP actor
(state -> N -> N -> act_dim, tanh output) and critic (state -> N -> N -> 1),
with a single shared action standard deviation that is either fixed or
learned. TPU-first differences:

  * flax.linen modules under `jit`/`vmap` instead of torch Sequential —
    the policy forward is a pair of small matmuls that XLA fuses straight
    into the scanned rollout (no host<->device transfer per step, unlike the
    reference's per-step torch call, ppo.py:122).
  * The learned deviation is parameterized as ``log_std`` so it stays
    positive under gradient descent (the reference learns raw ``std``,
    model.py:44-47, which can go negative; same expressive power).
  * Orthogonal initialization (sqrt(2) hidden / 0.01 policy head / 1 value
    head) — the standard PPO recipe; the reference relies on torch's default
    uniform fan-in init.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class MLP(nn.Module):
    """Tanh MLP trunk; the hot matmuls of the state controller."""

    features: Sequence[int]
    out_dim: int
    out_tanh: bool = False
    out_scale: float = 0.01
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for h in self.features:
            x = nn.Dense(
                h,
                kernel_init=nn.initializers.orthogonal(math.sqrt(2.0)),
                bias_init=nn.initializers.zeros,
                dtype=self.dtype,
            )(x)
            x = jnp.tanh(x)
        x = nn.Dense(
            self.out_dim,
            kernel_init=nn.initializers.orthogonal(self.out_scale),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
        )(x)
        if self.out_tanh:
            x = jnp.tanh(x)
        return x


class ActorCritic(nn.Module):
    """75 -> N -> N -> 4 tanh actor + 75 -> N -> N -> 1 critic
    (reference model.py:27-42), shared scalar action std (:44-47)."""

    hidden: int = 128
    act_dim: int = 4
    action_std: float = 0.1
    learn_std: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.actor = MLP(
            (self.hidden, self.hidden),
            self.act_dim,
            out_tanh=True,
            out_scale=0.01,
            dtype=self.dtype,
        )
        self.critic = MLP(
            (self.hidden, self.hidden), 1, out_tanh=False, out_scale=1.0, dtype=self.dtype
        )
        if self.learn_std:
            # f32 regardless of compute dtype (see landing/networks.py
            # log_std: a bf16-stored scalar param silently freezes under
            # small-lr Adam — bf16 ulp at log(0.1) is ~0.0156).
            self._log_std = self.param(
                "log_std",
                lambda _key: jnp.full((), math.log(self.action_std), jnp.float32),
            )

    def actor_mean(self, obs):
        """Deterministic policy output — the frozen low-level controller's
        forward inside the landing env (reference rl_worker.py:408:
        CRTL_POLICY.actor(...))."""
        return self.actor(obs)

    def __call__(self, obs):
        mean = self.actor(obs)
        value = self.critic(obs)
        if self.learn_std:
            log_std = self._log_std
        else:
            log_std = jnp.asarray(math.log(self.action_std), self.dtype)
        return mean, jnp.squeeze(value, -1), log_std


@dataclasses.dataclass(frozen=True)
class DiagGaussian:
    """Factorized Normal policy head (reference model.py:62, torch Normal)."""

    mean: jnp.ndarray
    log_std: jnp.ndarray

    @property
    def std(self):
        return jnp.exp(self.log_std)

    def sample(self, key: jax.Array) -> jnp.ndarray:
        return self.mean + self.std * jax.random.normal(key, self.mean.shape, self.mean.dtype)

    def log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        """Per-dimension log probability (summed by the caller, matching the
        reference's `logprobs.sum(axis=2)` ppo.py:190)."""
        z = (x - self.mean) / self.std
        return -0.5 * z**2 - self.log_std - 0.5 * math.log(2.0 * math.pi)

    def entropy(self) -> jnp.ndarray:
        """Per-dimension entropy (reference sums it, ppo.py:198)."""
        return 0.5 + 0.5 * math.log(2.0 * math.pi) + self.log_std * jnp.ones_like(self.mean)
