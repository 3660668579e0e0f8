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
LANDING_POLICY = os.path.join(FIXTURE_DIR, "landing_policy.msgpack")
ROBUST_CONTROLLER = os.path.join(FIXTURE_DIR, "nn_robust_128_0.msgpack")


def load_solved_controller():
    """(model, params) for the shipped solved state controller."""
    from ..agents.networks import ActorCritic
    from ..utils import load_params

    model = ActorCritic(hidden=128)
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 75)))
    return model, load_params(SOLVED_CONTROLLER, template)


def load_robust_controller():
    """(model, params) for the shipped robust state controller.

    Trained by the round-3 calm->windy curriculum (4000 updates, 8-stage
    severity schedule, runs/ctrl_robust_r4) plus a 2000-update severity-
    sampled fine-tune (each episode draws severity~U[0,1], apps/
    train_control.py --severity-sample, runs/ctrl_robust_r5). 256-episode
    cross-eval (apps/robust_eval.py): calm 98.0% strict station-keeping
    solve / windy 57.4% at full severity (5 m/s gusts + randomized params)
    vs the nominal fixture's 91.4% / 0%. Reference feature: robust_control,
    quadrotor_env.py:84-109.
    """
    from ..agents.networks import ActorCritic
    from ..utils import load_params

    model = ActorCritic(hidden=128)
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 75)))
    return model, load_params(ROBUST_CONTROLLER, template)


def load_landing_policy():
    """(model, params) for the shipped landing CNN policy.

    Trained by apps/train_landing.py (8000 updates total, reference
    hyperparams lr 2e-5 / K=5 / minibatch 1536) to **100% solved** on the
    official 100-episode eval-mode benchmark (reference bar: 93.5%,
    rl_eval_worker.py / README.md:10).
    """
    from ..landing.networks import LandingActorCritic, detect_s2d
    from ..utils import load_params

    model = LandingActorCritic(conv_s2d=detect_s2d(LANDING_POLICY))
    template = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 84, 84, 3)), jnp.zeros((1, 75)),
        jnp.zeros((1, 3)),
    )
    return model, load_params(LANDING_POLICY, template)
