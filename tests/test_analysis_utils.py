"""analysis/, utils/, native/ and the scripted manual-flight path."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from autonomous_quadrotor_environment_tpu.analysis import (
    aggregate_pilot_logs,
    episodes_to_solve,
    size_sweep_summary,
    training_curves,
)
from autonomous_quadrotor_environment_tpu.utils import (
    CSVLogger,
    JSONLLogger,
    TRAIN_LOG_HEADER,
    load_params,
    save_params,
)


def _write_log(path, rewards):
    log = CSVLogger(path, TRAIN_LOG_HEADER)
    for i, r in enumerate(rewards, 1):
        log.append({
            "LR": 5e-4, "Training Count": i, "Reward avg": r, "Solved avg": 0.5,
            "Total Episodes": i * 10, "Total Timesteps": i * 5000,
        })


def test_training_log_roundtrip_and_analysis(tmp_path):
    p = str(tmp_path / "log_128_0.csv")
    _write_log(p, [10.0, 50.0, 700.0])
    curves = training_curves([p])
    assert curves[p]["reward"] == [10.0, 50.0, 700.0]
    assert episodes_to_solve(p, 660.0) == 30
    _write_log(str(tmp_path / "log_128_1.csv"), [5.0, 20.0, 680.0])
    _write_log(str(tmp_path / "log_64_0.csv"), [1.0, 2.0, 3.0])
    summary = size_sweep_summary(str(tmp_path))
    assert set(summary) == {64, 128}
    assert summary[128]["n"] == 2
    np.testing.assert_allclose(summary[128]["reward_mean"], 690.0)


def test_csv_logger_resumes(tmp_path):
    p = str(tmp_path / "log.csv")
    log = CSVLogger(p, ["a", "b"])
    log.append({"a": 1, "b": 2})
    log2 = CSVLogger(p, ["a", "b"])
    assert log2.rows == 1  # resumed, not truncated


def test_checkpoint_roundtrip(tmp_path):
    from autonomous_quadrotor_environment_tpu.agents.networks import ActorCritic

    model = ActorCritic(hidden=16)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 75)))
    path = str(tmp_path / "ckpt.msgpack")
    save_params(path, params)
    template = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 75)))
    loaded = load_params(path, template)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pilot_log_aggregation(tmp_path):
    import csv

    p = str(tmp_path / "log_u1_eval.csv")
    with open(p, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["Episode", "Delta V", "Reward", "Time", "Solved"])
        w.writeheader()
        w.writerow({"Episode": 0, "Delta V": 10.0, "Reward": 5.0, "Time": 3.0, "Solved": 1})
        w.writerow({"Episode": 1, "Delta V": 20.0, "Reward": -5.0, "Time": 6.0, "Solved": 0})
    out = aggregate_pilot_logs(str(tmp_path / "log_*_eval.csv"))
    assert out["episodes"] == 2
    assert out["success_rate"] == 0.5
    assert out["mean_time_s"] == 4.5


def test_native_preview_renderer():
    from autonomous_quadrotor_environment_tpu.native import (
        preview_available,
        render_preview,
        render_trajectory,
    )

    if not preview_available():
        import pytest

        pytest.skip("native toolchain unavailable")
    st = np.zeros(13)
    st[6] = 1.0
    st[4] = -3.0
    img = render_preview(st, (0.0, 0.0), cam_offset=(1.0, 1.0, 2.0), width=160, height=120)
    assert img.shape == (120, 160, 3)
    # marker visible: black and white pixels present
    gray = img.mean(-1)
    assert (gray < 40).any() and (gray > 200).any()
    traj = np.tile(st, (4, 1))
    frames = render_trajectory(traj, width=80, height=60)
    assert frames.shape == (4, 60, 80, 3)


def test_manual_flight_scripted(tmp_path):
    """The scripted-input manual flight app end-to-end (CI surrogate for the
    human path; reference manual_flight.py)."""
    from autonomous_quadrotor_environment_tpu.agents.networks import ActorCritic
    from autonomous_quadrotor_environment_tpu.apps import manual_flight

    model = ActorCritic(hidden=16)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 75)))
    ctrl = str(tmp_path / "ctrl.msgpack")
    save_params(ctrl, params)
    cmds = np.zeros((200, 3))
    cmds[:, 2] = -1.0
    script = str(tmp_path / "cmds.npy")
    np.save(script, cmds)
    out = manual_flight.main([
        "--controller", ctrl, "--controller-size", "16", "--user", "test",
        "--episodes", "1", "--script", script, "--out", str(tmp_path / "runs"),
    ])
    assert len(out["episodes"]) == 1
    assert os.path.exists(out["log"])
    agg = aggregate_pilot_logs(str(tmp_path / "runs" / "log_*_eval.csv"))
    assert agg["episodes"] == 1


def test_plots_write_pngs(tmp_path):
    from autonomous_quadrotor_environment_tpu.analysis import (
        plot_landing_stats,
        plot_training_curves,
        plot_trajectory_3d,
        training_curves,
    )

    states = np.zeros((50, 13))
    states[:, 0] = np.linspace(0, 1, 50)
    states[:, 4] = np.linspace(0, 2, 50)
    p1 = plot_trajectory_3d(states, str(tmp_path / "traj.png"), target=[1.0, 0.0, 2.0])
    assert os.path.getsize(p1) > 1000

    _write_log(str(tmp_path / "log_128_0.csv"), [1.0, 5.0, 9.0])
    curves = training_curves([str(tmp_path / "log_128_0.csv")])
    p2 = plot_training_curves(curves, str(tmp_path / "curves.png"))
    assert os.path.getsize(p2) > 1000

    errors = np.random.default_rng(0).normal(0, 0.2, (8, 100, 3))
    p3 = plot_landing_stats(errors, str(tmp_path / "landing.png"))
    assert os.path.getsize(p3) > 1000


def test_sweep_band_figure(tmp_path):
    """Per-size mean±std bands over seeds with unequal-length (early-stopped)
    curves — the csv_reader-style figure for the 5x4 sweep."""
    from autonomous_quadrotor_environment_tpu.analysis.plots import sweep_band_figure

    _write_log(str(tmp_path / "log_128_0.csv"), [1.0, 5.0, 9.0])
    _write_log(str(tmp_path / "log_128_1.csv"), [2.0, 6.0])  # early-stopped
    _write_log(str(tmp_path / "log_64_0.csv"), [0.0, 1.0, 2.0])
    out = str(tmp_path / "bands.png")
    summary = sweep_band_figure(str(tmp_path), [64, 128, 256], [0, 1], out)
    assert os.path.getsize(out) > 1000
    assert set(summary) == {"64", "128"}  # no 256 logs -> omitted
    assert summary["128"]["seeds"] == 2
    # Final means: seed1's last value (6.0) is held to the common grid end.
    np.testing.assert_allclose(summary["128"]["final_reward_mean"], (9.0 + 6.0) / 2)


def test_manual_flight_autopilot(tmp_path):
    """The closed-loop scripted pilot (--autopilot) flies and logs through
    the same CSV path (the human-benchmark stand-in, RESULTS.md)."""
    from autonomous_quadrotor_environment_tpu.apps import manual_flight
    from autonomous_quadrotor_environment_tpu.fixtures import SOLVED_CONTROLLER

    out = manual_flight.main([
        "--controller", SOLVED_CONTROLLER, "--user", "ap",
        "--episodes", "1", "--autopilot", "--out", str(tmp_path / "runs"),
    ])
    assert len(out["episodes"]) == 1
    agg = aggregate_pilot_logs(str(tmp_path / "runs" / "log_ap_eval.csv"))
    assert agg["episodes"] == 1
    # With the solved fixture under it, the P-pilot should land this episode
    # (81/100 measured); episode 0 of user "ap" is deterministic.
    assert out["episodes"][0]["Time"] > 0


def test_step_response_metrics():
    from autonomous_quadrotor_environment_tpu.apps.step_response import (
        response_metrics_velocity,
    )

    log = np.zeros((1000, 13))
    # first-order response to 1 m/s with tau = 0.5 s
    t = np.arange(1000) * 0.01
    log[:, 1] = 1.0 - np.exp(-t / 0.5)
    m = response_metrics_velocity(log, axis=0, target=1.0, dt=0.01)
    assert 1.2 < m["rise_s"] < 1.8  # ln(20)*tau ~ 1.5 s to the 5% band
    assert abs(m["ss_error"]) < 0.01
