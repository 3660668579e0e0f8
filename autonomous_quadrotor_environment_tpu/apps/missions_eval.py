"""Mission-tracking evaluation of the RL controller (+ sensor-fusion mode).

Replaces the reference's orphaned Panda3D mission harness and the PID
mission script (reference: environment/position.py:23-262 — REAL_CTRL vs
sensor-estimated control, CE/EOT/overshoot/rise/settling table to
rl_results.csv — and PID_control.py:220-278): flies every episode of the
target table (missions/targets.py) with either the RL policy or the
cascaded PID, using true state or the fused sensor estimate, and emits the
response-metrics table as CSV + JSON.

Example:
    python -m autonomous_quadrotor_environment_tpu.apps.missions_eval \
        --policy runs/ctrl/solved/nn_solved_128_0.msgpack --sensors
"""

from __future__ import annotations

import argparse
import csv
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..agents.networks import ActorCritic
from ..baselines import POSITION_GAINS, cascaded_pid_control, cascaded_pid_init
from ..baselines.velocity_pid import vel_pid, vel_pid_init
from ..config import EnvConfig, SensorConfig
from ..core.quaternion import deriv_quat, quat_normalize
from ..core.dynamics import aux_at_state
from ..core.randomization import zeros_domain
from ..envs import hover
from ..envs.sensors import reads_from_env, sensor_fused, sensor_reset
from ..missions import (
    episode_n,
    gen_trajectory,
    mission_target,
    response_metrics,
    spiral_trajectory,
    target_parse,
)
from ..utils import load_params

MISSION_STEPS = 5000


def _make_traj(spec, dt):
    if spec.mission_class == 1:
        return gen_trajectory(
            MISSION_STEPS, max(int(spec.time / dt), 1), np.asarray(spec.target), dt=dt
        )
    args = list(spec.target)
    return spiral_trajectory(
        int(args[0]), int(args[1]), args[2], args[3], args[4], np.asarray(args[5]), dt=dt
    )


def make_mission_body(env_cfg, model, params, scfg, use_sensors, use_vision=False):
    """Build the per-step mission control body + carry initializer.

    Shared by the batch eval runner below and the interactive live rig
    (apps/live_mission.py), so every control mode's semantics have exactly
    one implementation. The carry holds ALL mode states (sensors, velocity
    PID, vision fusion) regardless of flags so the three compiled modes are
    carry-compatible and can be switched live (the reference's menu buttons
    flip REAL_CTRL/IMG_POS_DETER on the same running sim, menu.py:28-50).
    """
    from ..config import CameraConfig, MarkerConfig
    from ..envs.featurizer import feat_size, push_hist
    from ..vision import vision_correction_step, vision_fusion_init

    # Higher-res mission camera like the reference's (its saved intrinsics
    # imply a ~960px buffer, config/camera_calibration_cam_1.npz): the board
    # must stay detectable from cruise altitude.
    mission_cam = CameraConfig(width=480, height=480)
    marker_cfg = MarkerConfig()

    def init(key):
        x0 = jnp.zeros(13).at[6].set(1.0)
        env_s = hover.reset(key, env_cfg, det_state=x0)
        aux0 = aux_at_state(env_s.x, jnp.zeros(4), env_cfg.physics, zeros_domain())
        sens0 = sensor_reset(key, reads_from_env(env_s.x, aux0), scfg)
        return (
            env_s, sens0, vel_pid_init(), vision_fusion_init(),
            jnp.zeros(feat_size(5)), jnp.zeros(4), key,
        )

    def body(carry, traj, i):
        env_s, sens_s, vp_s, f_s, hist, action, k = carry
        k, k_s = jax.random.split(k)
        tgt = mission_target(traj, i)
        if use_sensors:
            # Diagnostics AT the current state from the action that
            # produced it — one RHS eval, exact reference pairing
            # (core/dynamics.aux_at_state).
            aux = aux_at_state(
                env_s.x, action, env_cfg.physics, env_s.dom,
                direct_control=env_cfg.direct_control,
            )
            sens_s, fused = sensor_fused(
                sens_s, reads_from_env(env_s.x, aux), k_s, scfg,
                env_cfg.physics, env_cfg.dt,
            )
            state14 = fused.states_sens
            if use_vision:  # hybrid: PnP corrections into the INS
                f_s, sens_s, _vout = vision_correction_step(
                    f_s, sens_s, env_s.x[0:5:2], jnp.zeros(2), i, env_cfg.dt,
                    mission_cam, marker_cfg, quad_quat=env_s.x[6:10],
                )
        else:
            # true-state mode: the controller's quat_dot features must
            # be real (reference position.py feeds the env's
            # quat_state) — zeroing them destabilizes the attitude loop.
            q = quat_normalize(env_s.x[6:10])
            state14 = jnp.concatenate(
                [env_s.x[0:10], deriv_quat(env_s.x[10:13], q)]
            )
        vp_s, verr = vel_pid(vp_s, state14, tgt, env_cfg.dt)
        hist = push_hist(hist, state14 - tgt - verr, action)
        action = model.apply(params, hist, method="actor_mean")
        env_s, _ = hover.step(env_s, action, env_cfg)
        err_pos = env_s.x[0:5:2] - tgt[0:5:2]
        est_err = jnp.linalg.norm(sens_s.pos_ins - env_s.x[0:5:2])
        log = jnp.concatenate(
            [env_s.x, err_pos, jnp.asarray([jnp.linalg.norm(err_pos), est_err])]
        )
        return (env_s, sens_s, vp_s, f_s, hist, action, k), log

    return body, init


def make_rl_mission_runner(
    env_cfg, model, params, scfg, use_sensors, steps, use_vision=False
):
    """Build a JITTED mission runner ``fn(traj, key) -> log``.

    Compiled ONCE per mode — every episode's trajectory has the same table
    shape, so all 14 episodes reuse the executable (un-jitted per-episode
    scans retrace and recompile 14x, minutes each over the remote tunnel).

    The runner: RL controller with the outer velocity-error PID injecting
    the mission offset (reference position.py:232-247, velocity_pid.py),
    observing (state - mission target - velocity offset) through its own
    rolling window. ``use_vision`` enables the hybrid ("IMG_POS_DETER")
    mode: every 10th frame the onboard camera view of the origin marker is
    rendered, the chessboard PnP pose is solved, and the estimate is
    blended into the INS (reference quadrotor_cv.py:57-105, menu.py:28-50).
    """
    body, init = make_mission_body(env_cfg, model, params, scfg, use_sensors, use_vision)

    @jax.jit
    def run(traj, key):
        _, log = jax.lax.scan(
            lambda c, i: body(c, traj, i), init(key), jnp.arange(steps)
        )
        return log

    return run


def run_rl_mission(
    env_cfg, traj, model, params, scfg, use_sensors, steps, key, use_vision=False
):
    """One-shot convenience wrapper (tests); batch callers should reuse
    `make_rl_mission_runner` to share the compile across episodes."""
    runner = make_rl_mission_runner(
        env_cfg, model, params, scfg, use_sensors, steps, use_vision
    )
    return np.asarray(runner(traj, key))


def make_pid_mission_runner(env_cfg, steps):
    @jax.jit
    def run(traj, key):
        x0 = jnp.zeros(13).at[6].set(1.0)
        env_s = hover.reset(key, env_cfg, det_state=x0)
        pid_s = cascaded_pid_init()

        def body(carry, i):
            env_s, pid_s = carry
            tgt = mission_target(traj, i)
            pid_s, action = cascaded_pid_control(
                pid_s, env_s.x[0:5:2], env_s.x[1:6:2], env_s.ang, env_s.ang_vel,
                tgt[0:5:2], tgt[1:6:2], jnp.zeros(()), POSITION_GAINS,
                env_cfg.physics, env_cfg.dt,
            )
            env_s, _ = hover.step(env_s, action, env_cfg)
            err_pos = env_s.x[0:5:2] - tgt[0:5:2]
            log = jnp.concatenate(
                [env_s.x, err_pos, jnp.asarray([jnp.linalg.norm(err_pos)])]
            )
            return (env_s, pid_s), log

        _, log = jax.lax.scan(body, (env_s, pid_s), jnp.arange(steps))
        return log

    return run


def run_pid_mission(env_cfg, traj, steps, key):
    return np.asarray(make_pid_mission_runner(env_cfg, steps)(traj, key))


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--policy", type=str, default=None, help="RL checkpoint; omit for PID")
    p.add_argument("--policy-size", type=int, default=128)
    p.add_argument("--sensors", action="store_true",
                   help="control on fused sensor estimates instead of true state")
    p.add_argument("--vision", action="store_true",
                   help="hybrid mode: PnP pose corrections blended into the "
                        "INS every 10 frames (implies --sensors)")
    p.add_argument("--steps", type=int, default=MISSION_STEPS)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, default="runs/missions")
    return p


def main(argv=None) -> dict:
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()
    args = build_parser().parse_args(argv)
    os.makedirs(args.out, exist_ok=True)
    scfg = SensorConfig()
    results = {}

    if args.vision:
        args.sensors = True
    model = params = None
    if args.policy:
        env_cfg = EnvConfig(n_steps=args.steps, direct_control=True, training=False)
        model = ActorCritic(hidden=args.policy_size)
        template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 75)))
        params = load_params(args.policy, template)
        name = "rl" + ("_vis" if args.vision else "_sens" if args.sensors else "")
    else:
        env_cfg = EnvConfig(n_steps=args.steps, direct_control=False, training=False)
        name = "pid"

    if args.policy:
        runner = make_rl_mission_runner(
            env_cfg, model, params, scfg, args.sensors, args.steps,
            use_vision=args.vision,
        )
    else:
        runner = make_pid_mission_runner(env_cfg, args.steps)

    rows = []
    for ep in range(episode_n()):
        spec = target_parse(ep)
        traj = _make_traj(spec, env_cfg.dt)
        key = jax.random.fold_in(jax.random.PRNGKey(args.seed), ep)
        log = np.asarray(runner(traj, key))
        # log: (T, 13 + 3 + 1): state, err_pos, |err|
        y = log[:, 0:13].T
        err_sum = float(log[:, 16].sum())
        target3 = (
            list(spec.target) if spec.mission_class == 1 else [0.0, 0.0, 0.0]
        )
        m = response_metrics(
            y, target3[:3], control_effort=0.0, abs_error=err_sum,
            env_max_steps=args.steps, dt=env_cfg.dt,
        )
        m["episode"] = ep
        m["mission_class"] = spec.mission_class
        m["mean_track_err"] = float(log[:, 16].mean())
        rows.append(m)

    csv_path = f"{args.out}/{name}_results.csv"
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    results["episodes"] = rows
    results["mean_track_err"] = float(np.mean([r["mean_track_err"] for r in rows]))
    print(json.dumps({"mean_track_err": results["mean_track_err"], "csv": csv_path}))
    return results


if __name__ == "__main__":
    main()
