"""Round-4 batched TPU driver — ALL TPU stages in ONE process.

CLAUDE.md tunnel rules: one client at a time, batch stages into a single
process, flush results incrementally, every stage resumable (gated on its
output artifact). Run: `python -u scripts/r4_driver.py > /tmp/r4.log 2>&1`.

VERDICT r3 directives covered:
  #1 bench_probe     -> runs/r4/bench_probe.json  (certify the 31M number +
                        reconcile the three landing figures in ONE mode)
  #2 u8_probe        -> runs/r3/landing_u8.json   (uint8 image storage gate)
     landing_bsweep  -> runs/r3/landing_bsweep.json
     robust256*      -> runs/ctrl_robust256{,_mix}/ (+ eval.json)  [also #4]
  #3 size_sweep      -> runs/sweep/ 5 sizes x 4 seeds incl. N=256
  #6 classical_r4    -> runs/classical_r4/summary.json (per-episode norms)
  #7 vel_smallbatch  -> runs/seed_study_smallbatch/ (64-env, ~5k steps per
                        update — commensurable with the reference's
                        1,935±505 episodes-to-solve)

Deadline discipline (VERDICT r3 next #9): R4_DEADLINE_TS (unix seconds) in
the environment makes every stage check remaining wall clock before
starting; a stage that would plausibly overrun is skipped so the tunnel is
idle well before the external driver's end-of-round bench.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(REPO)
sys.path.insert(0, REPO)

import jax

# Exit code telling wait_and_run.sh "the tunnel died under me — resume the
# probe loop and relaunch later" (stages are artifact-gated, so a relaunch
# costs nothing already done).
EXIT_TUNNEL_LOST = 99

_TUNNEL_SIGNATURES = (
    "UNAVAILABLE",
    "nable to initialize backend",
    "DEADLINE_EXCEEDED",
    "Socket closed",
    "Connection reset",
    "failed to connect",
)

FIXTURE_CTRL = "autonomous_quadrotor_environment_tpu/fixtures/nn_solved_128_0.msgpack"
DEADLINE_TS = float(os.environ.get("R4_DEADLINE_TS", "0")) or None

SWEEP_SIZES = (16, 32, 64, 128, 256)
SWEEP_SEEDS = (0, 1, 2, 3)
SWEEP_UPDATES = 2500
SWEEP_EVAL_EVERY = 50


def banner(msg):
    print(f"\n===== {time.strftime('%H:%M:%S')} {msg} =====", flush=True)


def remaining_s() -> float:
    return (DEADLINE_TS - time.time()) if DEADLINE_TS else float("inf")


def _watchdog(signum, frame):
    # The round-2 postmortem wedge mode: the client freezes mid-call (futex
    # wait, 0 CPU) and a Python-level exception may never propagate out of
    # the blocked C call. Hard-exit so the waiter's probe loop takes over;
    # incremental flushes + artifact gating make the restart cheap.
    print(f"\n===== WATCHDOG: stage exceeded its time budget — exiting "
          f"{EXIT_TUNNEL_LOST} for the waiter to resume =====", flush=True)
    os._exit(EXIT_TUNNEL_LOST)


signal.signal(signal.SIGALRM, _watchdog)


def stage(name, artifact, fn, est_s: float = 600.0):
    if artifact and os.path.exists(artifact):
        banner(f"{name}: artifact {artifact} exists, skipping")
        return None
    if remaining_s() < est_s + 300:
        banner(f"{name}: only {remaining_s():.0f}s to deadline (< est {est_s:.0f}s + margin), skipping")
        return None
    banner(f"{name}: start")
    t0 = time.time()
    # Watchdog: 2x the estimate (first-compile inflation) + 15 min.
    signal.alarm(int(2 * est_s + 900))
    try:
        out = fn()
        banner(f"{name}: done in {time.time() - t0:.0f}s")
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


# ---------------------------------------------------------------- smoke
def tunnel_smoke():
    import jax.numpy as jnp

    t0 = time.time()
    x = jax.jit(lambda a: a @ a)(jnp.eye(8))
    s = float(x.sum())
    print(f"smoke matmul ok: sum={s} in {time.time() - t0:.1f}s", flush=True)
    return s


# ---------------------------------------------------------------- bench
def bench_probe():
    """bench.py's exact measurement, run in THIS process (one TPU client).

    Certifies round 3's 31.25M steps/s headline and reconciles the three
    landing figures (18.5k driver / 20.1k probe / 24.3k RESULTS claim) in
    the single mode bench.py actually measures (VERDICT r3 weak #6)."""
    import contextlib
    import io

    import bench as bench_mod

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench_mod.main()
    line = buf.getvalue().strip().splitlines()[-1]
    print("bench:", line, flush=True)
    os.makedirs("runs/r4", exist_ok=True)
    with open("runs/r4/bench_probe.json", "w") as f:
        f.write(line + "\n")


def _run_script(relpath: str):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        os.path.splitext(os.path.basename(relpath))[0], os.path.join(REPO, relpath)
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()


def u8_probe():
    _run_script("scripts/r3_u8_probe.py")


def landing_bsweep():
    _run_script("scripts/r3_landing_bsweep.py")


def landing_block_probe():
    _run_script("scripts/r4_landing_block_probe.py")


# ---------------------------------------------------------------- sweep
def size_sweep():
    """The reference's headline experiment at the reference's scope
    (VERDICT r3 missing #1): 5 sizes x 4 seeds, early stop at solved, with
    N=256 included (reference training_log/log_{016..256}_*.csv,
    csv_reader.py:17-69).

    Each size trains its remaining seeds STACKED — one compiled program via
    apps/size_sweep.py + apps/stacked.py — so a size costs ~one run's wall
    clock instead of four. Resumable per (size, seed): solved or
    full-budget CSVs are kept, partial ones retrain."""
    from autonomous_quadrotor_environment_tpu.apps import size_sweep as sweep_app

    base_argv = [
        "--stacked", "--updates", str(SWEEP_UPDATES),
        "--eval-every", str(SWEEP_EVAL_EVERY), "--out", "runs/sweep",
        "--seeds", str(len(SWEEP_SEEDS)),
    ]
    args = sweep_app.build_parser().parse_args(base_argv)
    for size in SWEEP_SIZES:
        todo = [s for s in SWEEP_SEEDS
                if not sweep_app.run_done(f"runs/sweep/log_{size}_{s}.csv",
                                          SWEEP_UPDATES, 0.95)]
        if not todo:
            print(f"(sweep size={size}: all seeds complete, skipping)", flush=True)
            continue
        if remaining_s() < 900:
            print("(sweep: deadline margin reached, stopping)", flush=True)
            return
        banner(f"sweep size={size} seeds={todo} (stacked)")
        # Re-arm the stage watchdog per size: a stacked size is a few
        # minutes and individually resumable, so a mid-sweep tunnel wedge
        # costs <=30 min, not the whole-stage 2*est+900 budget.
        signal.alarm(1800)
        sweep_app.sweep_size(args, size, todo)
    # Aggregate + band figure (reference csv_reader.py:17-69 analog) —
    # sweep_app.main skips every completed run and writes figure + summary.
    signal.alarm(900)
    sweep_app.main(base_argv)


# ---------------------------------------------------------------- robust 256
def robust256():
    from autonomous_quadrotor_environment_tpu.apps import train_control

    return train_control.main([
        "--robust", "--curriculum", "0,0.25,0.5,0.75,1.0,1.0,1.0,1.0",
        "--size", "256", "--updates", "4000", "--eval-every", "20",
        "--inner", "20", "--seed", "0", "--out", "runs/ctrl_robust256",
    ])


def robust256_mix():
    from autonomous_quadrotor_environment_tpu.apps import train_control

    return train_control.main([
        "--robust", "--severity-sample", "--curriculum", "1.0",
        "--size", "256",
        "--resume-from", "runs/ctrl_robust256/nn_final_256_0.msgpack",
        "--updates", "2000", "--eval-every", "20", "--inner", "20",
        "--seed", "0", "--solved-threshold", "1.1",
        "--out", "runs/ctrl_robust256_mix",
    ])


def robust256_eval():
    from autonomous_quadrotor_environment_tpu.apps import robust_eval

    table = robust_eval.main([
        "--nominal", FIXTURE_CTRL,
        "--robust", "runs/ctrl_robust256_mix/nn_final_256_0.msgpack",
        "--robust-size", "256", "--episodes", "256",
    ])
    with open("runs/ctrl_robust256_mix/eval.json", "w") as f:
        json.dump(
            {k: {m: float(v) for m, v in row.items()} for k, row in table.items()},
            f, indent=2,
        )
    return table


# ---------------------------------------------------------------- small batch
def vel_smallbatch():
    """~5k env-steps per update (64 envs x 80 steps), the reference's
    per-update scale (VERDICT r3 next #7), so episodes-to-solve is
    commensurable with the reference's 1,935 ± 505
    (logger_analyzer.py:51-97). Stacked: all 3 seeds in one program, with
    eval-chunk scanning (the serial path dispatched every update)."""
    from autonomous_quadrotor_environment_tpu.apps import seed_study

    return seed_study.main([
        "--stacked", "--seeds", "3", "--task", "velocity", "--num-envs", "64",
        "--rollout-steps", "80", "--updates", "4000", "--eval-every", "20",
        "--out", "runs/seed_study_smallbatch",
    ])


# ---------------------------------------------------------------- stacked study
def vel_stacked30():
    """The full 30-seed velocity study as ONE compiled program
    (agents/multiseed.py; the serial study took 17 min TPU in round 3,
    runs/seed_study_vel). Measures the stacked wall clock on the same
    task/shape — the headline demonstration of seed-vmapped training."""
    import time as _time

    from autonomous_quadrotor_environment_tpu.apps import seed_study

    t0 = _time.time()
    summary = seed_study.main([
        "--stacked", "--seeds", "30", "--task", "velocity",
        "--num-envs", "1024", "--rollout-steps", "128",
        "--updates", "2000", "--eval-every", "10",
        "--out", "runs/seed_study_vel_stacked",
    ])
    summary["wall_clock_s"] = round(_time.time() - t0, 1)
    summary["serial_reference_s"] = 17 * 60  # round-3 serial study
    with open("runs/seed_study_vel_stacked/summary.json", "w") as f:
        json.dump(summary, f, indent=2)
    return summary


# ---------------------------------------------------------------- classical
def classical_r4():
    """Five-leg same-start comparison, now committing per-episode final
    norms (VERDICT r3 next #6). Uses the polished RL fixture (100%)."""
    from autonomous_quadrotor_environment_tpu.apps import classical_compare

    return classical_compare.main([
        "--policy", FIXTURE_CTRL, "--out", "runs/classical_r4",
    ])


if __name__ == "__main__":
    from autonomous_quadrotor_environment_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)
    if DEADLINE_TS:
        print(f"deadline in {remaining_s():.0f}s", flush=True)
    stage("tunnel_smoke", None, tunnel_smoke, est_s=60)
    stage("bench_probe", "runs/r4/bench_probe.json", bench_probe, est_s=600)
    stage("u8_probe", "runs/r3/landing_u8.json", u8_probe, est_s=600)
    stage("landing_bsweep", "runs/r3/landing_bsweep.json", landing_bsweep, est_s=900)
    stage("landing_block_probe", "runs/r4/landing_block_probe.json", landing_block_probe, est_s=900)
    stage("size_sweep", "runs/sweep/summary.json", size_sweep, est_s=1800)
    # est from the N=128 record: 4000 robust updates ran in 5.2 min
    # (runs/ctrl_robust_r4 CSV, T hours 0.0873); N=256 ~2x.
    stage("robust256", "runs/ctrl_robust256/nn_final_256_0.msgpack", robust256, est_s=900)
    stage("robust256_mix", "runs/ctrl_robust256_mix/nn_final_256_0.msgpack", robust256_mix, est_s=600)
    stage("robust256_eval", "runs/ctrl_robust256_mix/eval.json", robust256_eval, est_s=600)
    stage("vel_smallbatch", "runs/seed_study_smallbatch/summary.json", vel_smallbatch, est_s=900)
    stage("classical_r4", "runs/classical_r4/summary.json", classical_r4, est_s=600)
    stage("vel_stacked30", "runs/seed_study_vel_stacked/summary.json", vel_stacked30, est_s=900)
    banner("ALL STAGES DONE")
