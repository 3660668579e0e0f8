"""App-level smoke tests (miniaturized) — the CLI surface stays wired."""

import jax
import jax.numpy as jnp
import numpy as np


def test_missions_eval_pid(tmp_path):
    from autonomous_quadrotor_environment_tpu.apps import missions_eval

    out = missions_eval.main(["--steps", "300", "--out", str(tmp_path)])
    assert len(out["episodes"]) == 14  # the full target table
    assert np.isfinite(out["mean_track_err"])


def test_missions_eval_rl_with_fixture(tmp_path):
    from autonomous_quadrotor_environment_tpu.apps import missions_eval
    from autonomous_quadrotor_environment_tpu.fixtures import SOLVED_CONTROLLER

    out = missions_eval.main([
        "--policy", SOLVED_CONTROLLER, "--steps", "300", "--out", str(tmp_path),
    ])
    assert len(out["episodes"]) == 14
    assert np.isfinite(out["mean_track_err"])


def test_fixture_controller_solves_hover():
    """The shipped fixture must still pass the reference bar on a small
    deterministic eval (capability #32 artifact validity)."""
    from autonomous_quadrotor_environment_tpu.agents import make_eval_fn
    from autonomous_quadrotor_environment_tpu.config import EnvConfig
    from autonomous_quadrotor_environment_tpu.fixtures import load_solved_controller

    model, params = load_solved_controller()
    eval_fn = jax.jit(make_eval_fn(model, EnvConfig(n_steps=1000), episodes=16))
    out = eval_fn(params, jax.random.PRNGKey(123))
    assert float(out["eval_solved"]) >= 0.8, dict(out)
    assert float(out["eval_reward"]) > 15.0


def test_replay_app_renders_frames(tmp_path):
    import pytest

    from autonomous_quadrotor_environment_tpu.native import preview_available

    if not preview_available():
        pytest.skip("native toolchain unavailable")
    from autonomous_quadrotor_environment_tpu.apps import replay

    states = np.zeros((100, 13))
    states[:, 6] = 1.0
    states[:, 4] = np.linspace(0, -4, 100)
    log = str(tmp_path / "flight.npy")
    np.save(log, states)
    out = replay.main([
        "--log", log, "--mode", "orbit", "--every", "25",
        "--width", "80", "--height", "60", "--out", str(tmp_path / "frames"),
    ])
    assert len(out["frames"]) == 4
    import os as _os

    assert all(_os.path.getsize(f) > 100 for f in out["frames"])
