"""Round-5 batched TPU driver — ALL remaining TPU stages in ONE process.

CLAUDE.md tunnel rules: one client at a time, batch stages into a single
process, flush results incrementally, every stage resumable (gated on its
output artifact). Run: `python -u scripts/r5_driver.py > /tmp/r5.log 2>&1`.
(The landing retrain/ablation ladder runs separately via
scripts/r5_landing_ablation.py — also artifact-gated and resumable.)

VERDICT r4 directives covered here:
  #2 landing_conv_probe -> runs/r5/landing_conv_probe.json + fresh trace
                           under docs/profile/landing_r5/
  #3 robust_forensic    -> runs/r5/robust_forensic.json (per-episode windy
                           failure taxonomy, 256 episodes, shipped fixture)
  #4 vel_smallbatch10   -> runs/r5/seed_study_smallbatch10/ (>=10 seeds at
                           the reference's per-update scale) + re-scored
                           runs/r5/ref_criterion.json
  #7 bench_probe        -> runs/r5/bench_probe.json (roofline now carries
                           vpu_util_pct)

Stage estimates cite their source runs (VERDICT r4 next #8); the watchdog
is 2x estimate + 15 min, and no stage may start within est+300s of
R5_DEADLINE_TS.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(REPO)
sys.path.insert(0, REPO)

import jax

EXIT_TUNNEL_LOST = 99

_TUNNEL_SIGNATURES = (
    "UNAVAILABLE",
    "nable to initialize backend",
    "DEADLINE_EXCEEDED",
    "Socket closed",
    "Connection reset",
    "failed to connect",
)

FIXTURES = "autonomous_quadrotor_environment_tpu/fixtures"
DEADLINE_TS = float(os.environ.get("R5_DEADLINE_TS", "0")) or None


def banner(msg):
    print(f"\n===== {time.strftime('%H:%M:%S')} {msg} =====", flush=True)


def remaining_s() -> float:
    return (DEADLINE_TS - time.time()) if DEADLINE_TS else float("inf")


def _watchdog(signum, frame):
    print("\n===== WATCHDOG: stage exceeded its time budget — exiting "
          f"{EXIT_TUNNEL_LOST} for the waiter to resume =====", flush=True)
    os._exit(EXIT_TUNNEL_LOST)


signal.signal(signal.SIGALRM, _watchdog)


def stage(name, artifact, fn, est_s: float = 600.0):
    if artifact and os.path.exists(artifact):
        banner(f"{name}: artifact {artifact} exists, skipping")
        return None
    if remaining_s() < est_s + 300:
        banner(f"{name}: only {remaining_s():.0f}s to deadline "
               f"(< est {est_s:.0f}s + margin), skipping")
        return None
    banner(f"{name}: start (est {est_s:.0f}s)")
    t0 = time.time()
    signal.alarm(int(2 * est_s + 900))
    try:
        out = fn()
        dt = time.time() - t0
        banner(f"{name}: done in {dt:.0f}s ({dt / est_s:.2f}x est)")
        return out
    except Exception:
        tb = traceback.format_exc()
        print(tb, flush=True)
        if any(sig in tb for sig in _TUNNEL_SIGNATURES):
            banner(f"{name}: TUNNEL LOST after {time.time() - t0:.0f}s — "
                   f"exiting {EXIT_TUNNEL_LOST} for the waiter to resume")
            sys.exit(EXIT_TUNNEL_LOST)
        banner(f"{name}: FAILED after {time.time() - t0:.0f}s — continuing")
        return None
    finally:
        signal.alarm(0)


def tunnel_smoke():
    import jax.numpy as jnp

    t0 = time.time()
    x = jax.jit(lambda a: a @ a)(jnp.eye(8))
    s = float(x.sum())
    print(f"smoke matmul ok: sum={s} in {time.time() - t0:.1f}s", flush=True)
    return s


def robust_forensic():
    """256-episode per-episode failure taxonomy for the shipped robust
    fixture (VERDICT r4 next #3). est source: the r4 robust256_eval stage
    ran four 256-episode eval cells inside a 600s estimate; this runs the
    4-cell table plus two 256-episode forensic sweeps."""
    from autonomous_quadrotor_environment_tpu.apps import robust_eval

    return robust_eval.main([
        "--nominal", f"{FIXTURES}/nn_solved_128_0.msgpack",
        "--robust", f"{FIXTURES}/nn_robust_128_0.msgpack",
        "--episodes", "256",
        "--forensic", "runs/r5/robust_forensic.json",
    ])


def vel_smallbatch10():
    """10 velocity seeds at the reference's ~5k-transitions-per-update
    scale, stacked into one program (VERDICT r4 next #4: n=3 was thin).
    est source: runs/seed_study_smallbatch — the 3-seed stacked run
    trained in 147s; 10 seeds ~= 490s + compile."""
    from autonomous_quadrotor_environment_tpu.apps import seed_study

    return seed_study.main([
        "--stacked", "--seeds", "10", "--task", "velocity", "--num-envs", "64",
        "--rollout-steps", "80", "--updates", "4000", "--eval-every", "20",
        "--out", "runs/r5/seed_study_smallbatch10",
    ])


def _run_script(relpath: str):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        os.path.splitext(os.path.basename(relpath))[0], os.path.join(REPO, relpath)
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()


def landing_conv_probe():
    """Fresh landing profile + conv levers (VERDICT r4 next #2). est
    source: runs/r4/landing_block_probe.json — its 8 loop-of-3 cells fit a
    900s estimate; this is 4 cells + one profiler trace."""
    _run_script("scripts/r5_landing_conv_probe.py")


def bench_probe():
    import contextlib
    import io

    import bench as bench_mod

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench_mod.main()
    line = buf.getvalue().strip().splitlines()[-1]
    print("bench:", line, flush=True)
    os.makedirs("runs/r5", exist_ok=True)
    with open("runs/r5/bench_probe.json", "w") as f:
        f.write(line + "\n")


def main():
    banner(f"r5 driver start, devices: {jax.devices()}")
    if DEADLINE_TS:
        print(f"deadline in {remaining_s():.0f}s", flush=True)
    os.makedirs("runs/r5", exist_ok=True)
    stage("tunnel_smoke", None, tunnel_smoke, est_s=60)
    stage("robust_forensic", "runs/r5/robust_forensic.json", robust_forensic,
          est_s=600)
    stage("vel_smallbatch10", "runs/r5/seed_study_smallbatch10/summary.json",
          vel_smallbatch10, est_s=700)
    stage("ref_criterion", None, lambda: _run_script("scripts/r5_ref_criterion.py"),
          est_s=60)
    stage("landing_conv_probe", "runs/r5/landing_conv_probe.json",
          landing_conv_probe, est_s=900)
    stage("bench_probe", "runs/r5/bench_probe.json", bench_probe, est_s=700)
    banner("ALL STAGES DONE")


if __name__ == "__main__":
    main()
