"""Round-3e batched TPU driver — ALL TPU stages in ONE process.

CLAUDE.md tunnel rules: one client at a time, batch stages into a single
process, flush results incrementally, every stage resumable (gated on its
output artifact). Run: `python -u scripts/r3e_driver.py > /tmp/r3e.log 2>&1`.

Stages:
  0. tunnel_smoke     — tiny jitted matmul with a fetched value; proves the
                        tunnel is alive before committing to long stages.
  1. u8_probe         -> runs/r3/landing_u8.json  (uint8 rollout-image
                        storage timing + same-seed quality gate)
  2. robust256        -> runs/ctrl_robust256/nn_final_256_0.msgpack
                        (staged calm->windy curriculum at N=256 — wider net,
                        SAME 75-dim obs space; the reference sweeps N up to
                        256. The N=128 windy plateau at ~57% is the
                        hypothesized capacity limit.)
  3. robust256_mix    -> runs/ctrl_robust256_mix/nn_final_256_0.msgpack
                        (severity-sampled fine-tune — the recipe that took
                        N=128 to calm 98.0% / windy 57.4%)
  4. robust256_eval   -> runs/ctrl_robust256_mix/eval.json (256-episode
                        cross-eval vs the nominal 128 fixture)
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(REPO)
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

FIXTURE_CTRL = "autonomous_quadrotor_environment_tpu/fixtures/nn_solved_128_0.msgpack"


def banner(msg):
    print(f"\n===== {time.strftime('%H:%M:%S')} {msg} =====", flush=True)


def stage(name, artifact, fn):
    if artifact and os.path.exists(artifact):
        banner(f"{name}: artifact {artifact} exists, skipping")
        return None
    banner(f"{name}: start")
    t0 = time.time()
    try:
        out = fn()
        banner(f"{name}: done in {time.time() - t0:.0f}s")
        return out
    except Exception:
        traceback.print_exc()
        banner(f"{name}: FAILED after {time.time() - t0:.0f}s — continuing")
        return None


# ---------------------------------------------------------------- stage 0
def tunnel_smoke():
    t0 = time.time()
    x = jax.jit(lambda a: a @ a)(jnp.eye(8))
    s = float(x.sum())
    print(f"smoke matmul ok: sum={s} in {time.time() - t0:.1f}s", flush=True)
    return s


# ---------------------------------------------------------------- stage 1
def u8_probe():
    spec = importlib.util.spec_from_file_location(
        "r3_u8_probe", os.path.join(REPO, "scripts/r3_u8_probe.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()


# ---------------------------------------------------------------- stage 1b
def bench_probe():
    """bench.py's measurement in-process (one TPU client): records the
    landing-loop bench mode's first TPU numbers to runs/r3/bench_probe.json."""
    import contextlib
    import io

    import bench as bench_mod

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench_mod.main()
    line = buf.getvalue().strip().splitlines()[-1]
    print("bench:", line, flush=True)
    os.makedirs("runs/r3", exist_ok=True)
    with open("runs/r3/bench_probe.json", "w") as f:
        f.write(line + "\n")


# ---------------------------------------------------------------- stage 1c
def landing_bsweep():
    spec = importlib.util.spec_from_file_location(
        "r3_landing_bsweep", os.path.join(REPO, "scripts/r3_landing_bsweep.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()


# ---------------------------------------------------------------- stage 2
def robust256():
    from autonomous_quadrotor_environment_tpu.apps import train_control

    return train_control.main([
        "--robust", "--curriculum", "0,0.25,0.5,0.75,1.0,1.0,1.0,1.0",
        "--size", "256", "--updates", "4000", "--eval-every", "20",
        "--inner", "20", "--seed", "0", "--out", "runs/ctrl_robust256",
    ])


# ---------------------------------------------------------------- stage 3
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


# ---------------------------------------------------------------- stage 4
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


if __name__ == "__main__":
    from autonomous_quadrotor_environment_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)
    stage("tunnel_smoke", None, tunnel_smoke)
    stage("u8_probe", "runs/r3/landing_u8.json", u8_probe)
    stage("bench_probe", "runs/r3/bench_probe.json", bench_probe)
    stage("landing_bsweep", "runs/r3/landing_bsweep.json", landing_bsweep)
    stage("robust256", "runs/ctrl_robust256/nn_final_256_0.msgpack", robust256)
    stage("robust256_mix", "runs/ctrl_robust256_mix/nn_final_256_0.msgpack", robust256_mix)
    stage("robust256_eval", "runs/ctrl_robust256_mix/eval.json", robust256_eval)
    banner("ALL STAGES DONE")
