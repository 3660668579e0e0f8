"""True multi-process data-parallel training via `jax.distributed`.

SURVEY.md §4 calls for multi-host tests driven by jax.distributed-on-CPU;
the in-process virtual-device tests (test_parallel.py) cannot exercise the
cross-process coordinator/collective path that `parallel/dp.py`'s docstring
claims ("multi-host runs only need jax.distributed.initialize"). Here two
OS processes (2 virtual CPU devices each) form one 4-device dp mesh, run
one shard_mapped PPO train step, and must reproduce bit-for-bit what a
single process with 4 virtual devices computes — params replicated on every
rank, losses identical. Reference analogue: the mother/child multi-process
trainer (reference trainer_vldg.sh:1-8, visual_landing/rl_worker.py:267-342).
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "distributed_worker.py")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TIMEOUT = 300


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _env(n_local_devices: int) -> dict:
    env = dict(os.environ)
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_local_devices}"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _parse(stdout: str) -> dict:
    for line in stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise AssertionError(f"no RESULT line in worker output:\n{stdout}")


def _run_single(path: str) -> dict:
    proc = subprocess.run(
        [sys.executable, WORKER, "single", "0", "0", "1", path],
        capture_output=True, text=True, timeout=TIMEOUT, env=_env(4), cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    return _parse(proc.stdout)


def _run_dist(path: str) -> list[dict]:
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, "dist", str(port), str(rank), "2", path],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=_env(2), cwd=REPO,
        )
        for rank in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=TIMEOUT)
            if p.returncode != 0:
                if "distributed" in err and ("not supported" in err or "Unimplemented" in err):
                    pytest.skip(f"jax.distributed unsupported here: {err[-500:]}")
                raise AssertionError(f"worker rc={p.returncode}\n{err[-3000:]}")
            outs.append(_parse(out))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    return outs


@pytest.mark.parametrize("path", ["state", "landing"])
def test_two_process_dp_matches_single_process(path):
    """state: plain dp PPO step. landing: the scanned landing dp train loop
    under uint8 image storage — exactly the protocol the reference's
    mother/children implemented (rl_worker.py:267-342), VERDICT r4 next #5."""
    outs = _run_dist(path)
    single = _run_single(path)

    # Both ranks observed the same replicated state...
    assert outs[0]["checksum"] == pytest.approx(outs[1]["checksum"], rel=0, abs=0)
    assert outs[0]["loss"] == pytest.approx(outs[1]["loss"], rel=0, abs=0)
    # ...and the 2-process run reproduces the single-process run exactly
    # (same seed, same 4-device mesh => same per-device RNG streams; CPU
    # arithmetic is deterministic).
    assert outs[0]["loss"] == pytest.approx(single["loss"], rel=1e-6)
    assert outs[0]["checksum"] == pytest.approx(single["checksum"], rel=1e-6)


def test_two_process_multiseed_matches_single_process():
    """Seed-sharded stacked train loop across 2 OS processes: each rank
    holds 2 of the 4 seeds; merged per-seed checksums/losses must match the
    single-process 4-device run (embarrassingly parallel — no collectives,
    so per-seed streams cannot leak across ranks)."""
    outs = _run_dist("multiseed")
    single = _run_single("multiseed")

    merged_ck: dict = {}
    merged_loss: dict = {}
    for o in outs:
        merged_ck.update(o["per_seed_checksum"])
        merged_loss.update(o["per_seed_loss"])
    # All 4 seeds covered across the two ranks, none doubly owned.
    assert sorted(merged_ck) == ["0", "1", "2", "3"]
    assert sum(len(o["per_seed_checksum"]) for o in outs) == 4
    for k in merged_ck:
        assert merged_ck[k] == pytest.approx(single["per_seed_checksum"][k], rel=1e-6)
        assert merged_loss[k] == pytest.approx(single["per_seed_loss"][k], rel=1e-6)
