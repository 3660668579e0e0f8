"""Trained-model fixtures (the role of the reference's `solved/` and
`visual_landing/controller/` checkpoint directories, SURVEY.md §2 #32).

``nn_solved_128_0.msgpack``: state controller (ActorCritic hidden=128,
seed 0) trained by apps/train_control.py on a TPU v5e to 100% eval solved /
mean reward 26.8 over 40 deterministic episodes (reference bar: 95-97.5%
solved, reward ~25, training_log/log_128_32000….csv final rows). Used as
the frozen low-level policy of the visual-landing task (reference
rl_worker.py:57-63) and by the eval/comparison harnesses.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

FIXTURE_DIR = os.path.dirname(os.path.abspath(__file__))
SOLVED_CONTROLLER = os.path.join(FIXTURE_DIR, "nn_solved_128_0.msgpack")


def load_solved_controller():
    """(model, params) for the shipped solved state controller."""
    from ..agents.networks import ActorCritic
    from ..utils import load_params

    model = ActorCritic(hidden=128)
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 75)))
    return model, load_params(SOLVED_CONTROLLER, template)
