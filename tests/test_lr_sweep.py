"""LR-sweep driver: curves, summary, and resume-skip semantics
(reference: environment/controller/training_log/lr_test/csv_reader_lr.py)."""

import json
import os


def _run(tmp_path, monkeypatch=None):
    from autonomous_quadrotor_environment_tpu.apps import lr_sweep

    return lr_sweep.main([
        "--lrs", "0.001", "--seeds", "1", "--size", "16",
        "--updates", "4", "--eval-every", "2",
        "--num-envs", "4", "--rollout-steps", "8",
        "--out", str(tmp_path),
    ])


def test_lr_sweep_micro_end_to_end(tmp_path):
    summary = _run(tmp_path)
    assert "0.001" in summary
    assert os.path.exists(tmp_path / "lr_sweep.png")
    assert os.path.exists(tmp_path / "lr_0.001" / "log_16_0.csv")
    with open(tmp_path / "summary.json") as f:
        assert json.load(f).keys() == summary.keys()


def test_lr_sweep_resume_skips_completed_runs(tmp_path, capsys):
    """A killed/stalled sweep restarts where it left off: completed runs
    (full CSV) are skipped, partial CSVs are restarted clean."""
    _run(tmp_path)
    capsys.readouterr()
    # Second invocation: the completed run must be skipped, not retrained.
    _run(tmp_path)
    out = capsys.readouterr().out
    assert "(done, skipping)" in out

    # Truncate to a partial curve: the run must restart from scratch.
    csv_path = tmp_path / "lr_0.001" / "log_16_0.csv"
    with open(csv_path) as f:
        lines = f.readlines()
    with open(csv_path, "w") as f:
        f.writelines(lines[:2])  # header + one row < full curve
    _run(tmp_path)
    out = capsys.readouterr().out
    assert "(done, skipping)" not in out
    with open(csv_path) as f:
        assert sum(1 for _ in f) - 1 == 2  # full 4-update / eval-every-2 curve
