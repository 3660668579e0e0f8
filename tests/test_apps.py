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


def test_robust_fixture_station_keeps_in_wind():
    """The shipped robust controller (fixtures/nn_robust_128_0.msgpack,
    TPU-measured calm 98.0%/windy 57.4% at 256 episodes) must still hold
    station under full-severity wind+randomization on a small eval, where
    the nominal fixture scores 0%."""
    from autonomous_quadrotor_environment_tpu.agents import make_eval_fn
    from autonomous_quadrotor_environment_tpu.config import (
        EnvConfig,
        RandomizationConfig,
    )
    from autonomous_quadrotor_environment_tpu.fixtures import load_robust_controller

    model, params = load_robust_controller()
    cfg = EnvConfig(n_steps=1000, randomization=RandomizationConfig(enabled=True))
    eval_fn = jax.jit(make_eval_fn(model, cfg, episodes=16))
    out = eval_fn(params, jax.random.PRNGKey(3))
    # Round-5 survival-cut fix (agents/ppo.py make_eval_fn): the env's step
    # counter starts at warmup, so timeout episodes record length ==
    # n_steps, not max_steps — before the fix every timeout-without-solve
    # episode (a full-episode hover displaced by gusts) was mislabeled
    # non-survived/non-station. The 256-episode TPU forensic
    # (runs/r5/robust_forensic.json): station-keeping 94.5% at full
    # severity, not the ~50% the bug reported.
    assert float(out["eval_station_keeping"]) >= 0.7, dict(out)
    assert float(out["eval_survived"]) >= float(out["eval_solved"]), dict(out)
    assert float(out["eval_rms_vel_late"]) < 0.5, dict(out)


def test_landing_fixture_stored_half_precision():
    """The shipped landing checkpoint stays f16-stored (~23MB, not 46MB)
    and loads back as f32 params that drive the CNN forward pass."""
    import os

    from autonomous_quadrotor_environment_tpu.fixtures import (
        LANDING_POLICY, load_landing_policy,
    )

    assert os.path.getsize(LANDING_POLICY) < 25e6
    model, params = load_landing_policy()
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(params))
    out = model.apply(
        params, jnp.zeros((2, 84, 84, 3)), jnp.zeros((2, 75)), jnp.zeros((2, 3))
    )
    assert all(np.all(np.isfinite(np.asarray(x))) for x in jax.tree.leaves(out))


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


def test_watch_dashboard_renders(tmp_path):
    """The --watch training dashboard renders all panels from a JSONL."""
    import json

    from autonomous_quadrotor_environment_tpu.apps.watch import main

    p = tmp_path / "train.jsonl"
    rows = [
        {"update": i, "eval_reward": -20.0 + i, "eval_solved": i / 10,
         "solved_frac": i / 20, "actor_loss": -0.01, "critic_loss": 1.0 / (i + 1),
         "eval_length": 100 + i, "episodes": 12, "reward_per_step": 0.01 * i,
         "ts": 1000.0 + i}
        for i in range(10)
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    out = main([str(p), "--once"])
    for label in ("eval reward", "eval solved", "critic loss", "throughput"):
        assert label in out


def test_replay_live_mode(tmp_path):
    """Real-time paced terminal replay (reference conf_eval.prc 20 FPS)."""
    import numpy as np

    from autonomous_quadrotor_environment_tpu.apps.replay import main

    st = np.zeros((40, 13))
    st[:, 6] = 1.0
    st[:, 4] = np.linspace(1.0, -4.0, 40)
    log = tmp_path / "traj.npy"
    np.save(log, st)
    r = main(["--log", str(log), "--live", "--fps", "100", "--term-cols", "20",
              "--max-seconds", "0.1"])
    assert r["live"] and r["frames"] >= 5


def test_live_mission_mode_switching():
    """The interactive rig switches True-State/MEMS/Hybrid on the live sim
    (reference menu.py:28-50) — scripted hotkeys, headless."""
    from autonomous_quadrotor_environment_tpu.apps.live_mission import main

    r = main([
        "--policy",
        "autonomous_quadrotor_environment_tpu/fixtures/nn_solved_128_0.msgpack",
        "--headless-keys", ".2.3.1", "--max-seconds", "0.5", "--fps", "20",
    ])
    assert r["mode_switches"] == 3
    assert r["frames"] >= 5


def test_train_control_inner_matches_single_steps(tmp_path):
    """`train_control --inner N` (in-jit multi-update chunking via
    agents.make_train_loop) must reproduce the --inner 1 run exactly: same
    PRNG stream, same update order, same final evaluation."""
    from autonomous_quadrotor_environment_tpu.apps import train_control

    common = [
        "--seed", "3", "--size", "16", "--updates", "6", "--num-envs", "8",
        "--rollout-steps", "16", "--eval-every", "3", "--eval-episodes", "4",
        "--solved-threshold", "1.1",
    ]
    r1 = train_control.main(common + ["--out", str(tmp_path / "single")])
    rN = train_control.main(common + ["--inner", "3", "--out", str(tmp_path / "inner")])
    assert r1["total_steps"] == rN["total_steps"]
    for k, v in r1["final_eval"].items():
        np.testing.assert_array_equal(v, rN["final_eval"][k], err_msg=k)
