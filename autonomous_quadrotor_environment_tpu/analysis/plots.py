"""Figure generation: 3D trajectories and training curves.

Capability match for the reference's `plotter` class
(reference: environment/quadrotor_env.py:727-836 — accumulates states and
renders a 3D position plot with optional target) and the training-log
curve figures (training_log/csv_reader.py:17-69). Headless matplotlib
(Agg), PNG output.
"""

from __future__ import annotations

import os

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_trajectory_3d(
    states: np.ndarray,           # (T, 13) state log
    path: str,
    target: np.ndarray | None = None,  # (T, 3) or (3,) reference positions
    title: str = "Trajectory",
) -> str:
    """3D position plot (reference plotter.plot, quadrotor_env.py:790-836)."""
    plt = _plt()
    fig = plt.figure(figsize=(7, 6))
    ax = fig.add_subplot(projection="3d")
    xyz = states[:, 0:5:2]
    ax.plot(xyz[:, 0], xyz[:, 1], xyz[:, 2], label="position")
    if target is not None:
        t = np.atleast_2d(np.asarray(target))
        if t.shape[0] == 1:
            ax.scatter(*t[0], color="r", marker="*", s=80, label="target")
        else:
            ax.plot(t[:, 0], t[:, 1], t[:, 2], "--", label="target")
    ax.set_xlabel("x (m)")
    ax.set_ylabel("y (m)")
    ax.set_zlabel("z (m)")
    ax.set_title(title)
    ax.legend()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=110, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_training_curves(curves: dict, path: str, metric: str = "reward") -> str:
    """Reward/solved curves per log (reference csv_reader.py:41-69).
    ``curves``: output of analysis.training_curves."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(7, 4))
    for name, c in curves.items():
        label = os.path.basename(name).replace("log_", "").replace(".csv", "")
        ax.plot(c["updates"], c[metric], label=label)
    ax.set_xlabel("update")
    ax.set_ylabel(metric)
    ax.grid(True)
    ax.legend()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=110, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_landing_stats(
    errors: np.ndarray,   # (E, T, 3) per-episode position errors over time
    path: str,
    dt: float = 0.01,     # seconds per sample (0.1 for per-decision samples)
) -> str:
    """Mean ± std landing-error envelopes (reference rl_eval_worker.py:
    306-348: mean/std error plots over the 100-episode benchmark)."""
    plt = _plt()
    fig, axs = plt.subplots(3, 1, figsize=(7, 7), sharex=True)
    t = np.arange(errors.shape[1]) * dt
    for i, lab in enumerate(["x", "y", "z"]):
        mean = errors[:, :, i].mean(0)
        std = errors[:, :, i].std(0)
        axs[i].plot(t, mean, label=f"{lab} error")
        axs[i].fill_between(t, mean - std, mean + std, alpha=0.3)
        axs[i].grid(True)
        axs[i].legend()
    axs[-1].set_xlabel("time (s)")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=110, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_controller_comparison(
    logs: dict,   # {"pid": (E, T, >=10) log, "lqr": ..., "rl": ...}
    path: str,
    dt: float = 0.01,
) -> str:
    """Same-start controller comparison: mean state norm (vel, ang, ang_vel)
    vs time per controller (reference classical_controller_results/
    results_analyzer_same.py:16-71 figures)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(7, 4))
    for name, log in logs.items():
        norm = np.linalg.norm(log[:, :, 0:9], axis=-1)
        t = np.arange(norm.shape[1]) * dt
        # median + IQR: episodes that leave the bounding box keep integrating
        # (the reference's fixed-500-step protocol) and would swamp a mean
        med = np.median(norm, 0)
        ax.plot(t, med, label=f"{name} (median of {norm.shape[0]} eps)")
        ax.fill_between(t, np.quantile(norm, 0.25, 0), np.quantile(norm, 0.75, 0), alpha=0.2)
    ax.axhline(0.05, color="k", ls=":", lw=1, label="success band (0.05)")
    ax.set_yscale("log")
    ax.set_xlabel("time (s)")
    ax.set_ylabel("‖vel, ang, ang-vel‖")
    ax.grid(True, which="both", alpha=0.3)
    ax.legend()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=110, bbox_inches="tight")
    plt.close(fig)
    return path
