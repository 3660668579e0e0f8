"""RL agents: actor-critic networks, GAE, and the PPO trainer."""

from .gae import gae_advantages
from .multiseed import (
    make_injectable_optimizer,
    make_multiseed_eval_fn,
    make_multiseed_train_loop,
    make_multiseed_train_step,
    multiseed_init,
    seed_slice,
)
from .networks import ActorCritic, MLP
from .ppo import (
    PPOTrainState,
    Rollout,
    evaluate,
    make_eval_fn,
    make_forensic_eval_fn,
    make_train_loop,
    make_train_step,
    ppo_init,
    ppo_update,
    rollout_batch,
)

__all__ = [
    "ActorCritic",
    "MLP",
    "PPOTrainState",
    "Rollout",
    "evaluate",
    "gae_advantages",
    "make_eval_fn",
    "make_forensic_eval_fn",
    "make_injectable_optimizer",
    "make_multiseed_eval_fn",
    "make_multiseed_train_loop",
    "make_multiseed_train_step",
    "make_train_loop",
    "make_train_step",
    "multiseed_init",
    "seed_slice",
    "ppo_init",
    "ppo_update",
    "rollout_batch",
]
