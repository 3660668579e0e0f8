"""Hierarchical visual-landing task: env, CNN policy, PPO trainer, oracle.

Capability match for the reference's `visual_landing/` subsystem
(reference: rl_worker.py, ppo_trainer.py, rl_nn_model_v2.py,
rl_reward_fuction.py, rl_eval_worker.py, math_trajectory.py), re-designed
TPU-first: the two-level control loop (CNN velocity commands at 10 Hz over a
frozen 100 Hz state controller), the on-device camera render, the sensor
fusion, and the PPO update all fuse into one compiled program that `vmap`s
over a batch of landing episodes — replacing the reference's mother/child
file-IPC data parallelism (SURVEY.md §2).
"""

from .env import LandingObs, LandingState, landing_reset, landing_step, landing_step_autoreset
from .networks import LandingActorCritic
from .ppo import (
    LandingTrainState,
    landing_eval,
    landing_ppo_init,
    make_landing_eval_fn,
    make_landing_train_loop,
    make_landing_train_step,
)
from .reward import visual_reward

__all__ = [
    "LandingActorCritic",
    "LandingObs",
    "LandingState",
    "LandingTrainState",
    "landing_eval",
    "landing_ppo_init",
    "landing_reset",
    "landing_step",
    "landing_step_autoreset",
    "make_landing_eval_fn",
    "make_landing_train_loop",
    "make_landing_train_step",
    "visual_reward",
]
