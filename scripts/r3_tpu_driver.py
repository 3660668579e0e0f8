"""Round-3 batched TPU driver — ALL TPU stages in ONE process.

CLAUDE.md tunnel rules: one client at a time, batch stages into a single
process, flush results incrementally, make every stage resumable. Each
stage is gated on its output artifact, so a killed/wedged driver restarts
where it left off (`python -u scripts/r3_tpu_driver.py > /tmp/r3_driver.log`).

Stages (VERDICT round-2 directives in parentheses):
  1. profile_landing  (#5) -> runs/r3/landing_profile.json
  2. polish           (#2) -> runs/polish_r3/solved/
  3. vel_train        (#1) -> runs/vel_control/solved/
  4. robust4k         (#4) -> runs/ctrl_robust_r4 + eval.json
  5. lr_sweep         (#3) -> runs/lr_sweep (internally resumable)
  6. step_response    (#1) -> runs/vel_control/step_response.json
  7. vel_seed_study   (#1) -> runs/seed_study_vel (internally resumable)
"""

from __future__ import annotations

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


# ---------------------------------------------------------------- stage 1
def profile_landing():
    """Decompose the 178.5 ms landing update (VERDICT r2 weak #2) with the
    docs/PERF.md methodology: time sub-jits with host-value fences."""
    from autonomous_quadrotor_environment_tpu.apps.train_landing import load_controller
    from autonomous_quadrotor_environment_tpu.config import PPOConfig
    from autonomous_quadrotor_environment_tpu.landing import (
        landing_ppo_init,
        make_landing_train_step,
    )
    from autonomous_quadrotor_environment_tpu.landing.env import LandingConfigs
    from autonomous_quadrotor_environment_tpu.landing.ppo import (
        landing_loss,
        landing_rollout,
    )
    from autonomous_quadrotor_environment_tpu.render import make_camera, render_nadir

    B, T = 128, 24
    ctrl_model, ctrl_params = load_controller(FIXTURE_CTRL, 128)
    cfgs = LandingConfigs.default(training=True)
    ppo_cfg = PPOConfig.landing_variant()
    model, tx, state = landing_ppo_init(
        jax.random.PRNGKey(0), cfgs, ppo_cfg, B, ctrl_model, ctrl_params
    )
    train_step = jax.jit(
        make_landing_train_step(model, tx, cfgs, ppo_cfg, ctrl_model, ctrl_params, T)
    )

    def timed(fn, fence, n=5, warm=2):
        for _ in range(warm):
            fence(fn())
        t0 = time.time()
        for _ in range(n):
            fence(fn())  # host fetch per iter: block_until_ready lies (CLAUDE.md)
        return (time.time() - t0) / n * 1e3  # ms

    res = {"B": B, "T": T, "k_epochs": ppo_cfg.k_epochs, "mb": ppo_cfg.minibatch_size}
    os.makedirs("runs/r3", exist_ok=True)

    def flush():  # incremental flush (CLAUDE.md tunnel rules)
        with open("runs/r3/landing_profile_partial.json", "w") as f:
            json.dump(res, f, indent=2)
        print(json.dumps(res), flush=True)

    # (a) full train step
    s_holder = [state]

    def full():
        s, metrics = train_step(s_holder[0])
        s_holder[0] = s
        return metrics["loss"]

    res["full_step_ms"] = timed(full, lambda x: float(x))
    flush()
    state = s_holder[0]

    # (b) rollout only (incl. reset pool + render + CNN forward + 10:1 physics)
    roll_fn = jax.jit(
        lambda p, es, obs, k: landing_rollout(
            model, p, es, obs, k, cfgs, ctrl_model, ctrl_params, T
        )
    )
    k = jax.random.PRNGKey(1)
    res["rollout_ms"] = timed(
        lambda: roll_fn(state.params, state.env_states, state.obs, k),
        lambda out: float(out[2].rewards[0, 0]),
    )
    flush()

    # capture one rollout's flat tensors for the update-side measurements
    env_states, obs, roll, bootstrap = jax.block_until_ready(
        roll_fn(state.params, state.env_states, state.obs, k)
    )
    flat = lambda x: x.reshape((-1,) + x.shape[2:])
    images, sens = flat(roll.images), flat(roll.sens)
    actions, old_lp = flat(roll.actions), flat(roll.logprobs)
    n = images.shape[0]
    mb = min(ppo_cfg.minibatch_size, n)
    rets = jnp.zeros((n,), jnp.float32)
    advs = jnp.ones((n,), jnp.float32)

    # (c) one minibatch fwd-bwd (CNN loss grad) — the MXU-bound unit
    grad_fn = jax.jit(
        lambda p: jax.value_and_grad(
            lambda pp: landing_loss(
                model, pp, images[:mb], sens[:mb], actions[:mb],
                old_lp[:mb], rets[:mb], advs[:mb], ppo_cfg,
            )[0]
        )(p)
    )
    res["grad_minibatch_ms"] = timed(lambda: grad_fn(state.params), lambda o: float(o[0]))
    n_grad_steps = ppo_cfg.k_epochs * max(n // mb, 1)
    res["n_grad_steps"] = n_grad_steps
    res["update_inferred_ms"] = res["full_step_ms"] - res["rollout_ms"]
    res["grad_total_ms"] = res["grad_minibatch_ms"] * n_grad_steps
    flush()

    # (d) render only: one nadir frame per env, the per-decision render load
    cam = make_camera(cfgs.camera)
    pos = jax.random.normal(jax.random.PRNGKey(2), (B, 3)) * 2 + jnp.array([0, 0, 5.0])
    mk = jax.random.normal(jax.random.PRNGKey(3), (B, 2)) * 0.8
    render_fn = jax.jit(
        jax.vmap(lambda p, m: render_nadir(cam, p, m, cfgs.marker, ground_z_env=cfgs.landing.ground_z))
    )
    res["render_batch_ms"] = timed(
        lambda: render_fn(pos, mk), lambda img: float(img.ravel()[0])
    )
    res["render_per_rollout_ms"] = res["render_batch_ms"] * T
    flush()

    # (e) CNN forward (actor) on one batch of observations
    fwd = jax.jit(lambda p, im, s: model.apply(p, im, s, method="actor"))
    res["cnn_fwd_batch_ms"] = timed(
        lambda: fwd(state.params, obs.image, obs.control_in),
        lambda a: float(a[0, 0]),
    )
    res["cnn_fwd_per_rollout_ms"] = res["cnn_fwd_batch_ms"] * T
    flush()

    # (f) committed trace of one full step (docs/PERF.md methodology)
    try:
        with jax.profiler.trace("docs/profile/landing"):
            float(full())
        res["trace"] = "docs/profile/landing"
    except Exception as e:
        res["trace_error"] = str(e)

    with open("runs/r3/landing_profile.json", "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res, indent=2), flush=True)
    return res


# ---------------------------------------------------------------- stage 2
def polish():
    from autonomous_quadrotor_environment_tpu.apps import train_control

    for s in (0, 1, 2, 3, 4):
        solved = f"runs/polish_r3/solved/nn_solved_128_{s}.msgpack"
        if os.path.exists(solved):
            print(f"polish: {solved} already exists", flush=True)
            return solved
        ckpt = f"runs/seed_study/solved/nn_solved_128_{s}.msgpack"
        banner(f"polish attempt from seed-study ckpt {s}")
        train_control.main([
            "--polish", "--resume-from", ckpt, "--seed", str(s),
            "--updates", "400", "--eval-every", "10", "--out", "runs/polish_r3",
        ])
        if os.path.exists(solved):
            return solved
    return None


# ---------------------------------------------------------------- stage 3
def vel_train():
    from autonomous_quadrotor_environment_tpu.apps import train_control

    return train_control.main([
        "--task", "velocity", "--vel-target-max", "1.0", "--seed", "0",
        "--updates", "3000", "--eval-every", "10", "--out", "runs/vel_control",
    ])


# ---------------------------------------------------------------- stage 4
def robust4k():
    from autonomous_quadrotor_environment_tpu.apps import robust_eval, train_control

    final = "runs/ctrl_robust_r4/nn_final_128_0.msgpack"
    if not os.path.exists(final):
        train_control.main([
            "--robust", "--curriculum", "0,0.25,0.5,0.75,1.0,1.0,1.0,1.0",
            "--updates", "4000", "--eval-every", "20", "--seed", "0",
            "--out", "runs/ctrl_robust_r4",
        ])
    table = robust_eval.main([
        "--nominal", FIXTURE_CTRL, "--robust", final,
    ])
    with open("runs/ctrl_robust_r4/eval.json", "w") as f:
        json.dump({k: {m: float(v) for m, v in row.items()} for k, row in table.items()}, f, indent=2)
    return table


# ------------------------------------------------------------ stage 4b
def robust_mix():
    """Severity-sampled fine-tune of the r4 curriculum checkpoint: each
    episode draws s~U[0,1], so calm and windy are trained jointly and the
    calm regime can't be forgotten (the staged-curriculum failure mode)."""
    from autonomous_quadrotor_environment_tpu.apps import robust_eval, train_control

    final = "runs/ctrl_robust_r5/nn_final_128_0.msgpack"
    if not os.path.exists(final):
        train_control.main([
            "--robust", "--severity-sample", "--curriculum", "1.0",
            "--resume-from", "runs/ctrl_robust_r4/nn_final_128_0.msgpack",
            "--updates", "2000", "--eval-every", "20", "--seed", "0",
            "--solved-threshold", "1.1",  # run the full budget
            "--out", "runs/ctrl_robust_r5",
        ])
    table = robust_eval.main([
        "--nominal", FIXTURE_CTRL, "--robust", final, "--episodes", "256",
    ])
    with open("runs/ctrl_robust_r5/eval.json", "w") as f:
        json.dump({k: {m: float(v) for m, v in row.items()} for k, row in table.items()},
                  f, indent=2)
    return table


# ------------------------------------------------------------ stage 4c
def fused_bench():
    """Time the state-controller train step with PPOConfig.fused_update on
    vs off at the bench shape (2048x256, mb=131072, block=128). The fused
    Pallas kernel (ops/ppo_fused.py) eliminates the per-grad-step HBM
    activation round-trips docs/PERF.md measured at ~10x the FLOP cost."""
    import dataclasses

    from autonomous_quadrotor_environment_tpu.agents import make_train_step, ppo_init
    from autonomous_quadrotor_environment_tpu.config import (
        EnvConfig,
        PPOConfig,
        TrainConfig,
    )

    env_cfg = EnvConfig(n_steps=1000)
    train_cfg = TrainConfig(num_envs=2048, rollout_steps=256, network_size=128)
    res = {}
    for fused in (False, True):
        ppo_cfg = PPOConfig(k_epochs=10, minibatch_size=131072, fused_update=fused)
        model, tx, state = ppo_init(
            jax.random.PRNGKey(0), env_cfg, ppo_cfg, train_cfg
        )
        step = jax.jit(make_train_step(model, tx, env_cfg, ppo_cfg, train_cfg))
        state, m = step(state)
        float(m["loss"])  # host-value fence (CLAUDE.md: block_until_ready lies)
        t0 = time.time()
        for _ in range(5):
            state, m = step(state)
            loss = float(m["loss"])
        dt = (time.time() - t0) / 5
        res["fused" if fused else "xla"] = {
            "ms_per_update": round(dt * 1e3, 1),
            "env_steps_per_s": round(2048 * 256 / dt, 0),
            "final_loss": loss,
        }
        print(json.dumps(res), flush=True)
    res["speedup"] = round(
        res["xla"]["ms_per_update"] / res["fused"]["ms_per_update"], 3
    )
    with open("runs/r3/fused_bench.json", "w") as f:
        json.dump(res, f, indent=2)
    return res


# ------------------------------------------------------------ stage 2b
def classical_final():
    """Re-score the five-leg classical comparison with the polished RL
    checkpoint (VERDICT r2 missing #4: close the RL leg to the reference's
    100%)."""
    from autonomous_quadrotor_environment_tpu.apps import classical_compare

    results = classical_compare.main([
        "--policy", "runs/polish_r3/solved/nn_solved_128_0.msgpack",
        "--out", "runs/classical_r3",
    ])
    with open("runs/classical_r3/summary.json", "w") as f:
        json.dump(results, f, indent=2)
    return results


# ------------------------------------------------------------ stage 1b
def landing_opt():
    """Attack the landing update's measured bottlenecks (runs/r3/
    landing_profile.json + docs/profile/landing): the device step is 133 ms
    = 112 ms update (51 ms conv grads at ~50% f32 MFU + ~42 ms minibatch
    block gather at ~31 GB/s) + ~20 ms rollout. Variants: bigger shuffle
    blocks (fewer, larger DMAs), bf16 conv compute (MXU ceiling 2x), bf16
    image storage (halves the gather stream). Also: fixture eval under bf16
    + a short same-seed learning run as quality gates."""
    import dataclasses

    from autonomous_quadrotor_environment_tpu.apps.train_landing import load_controller
    from autonomous_quadrotor_environment_tpu.config import PPOConfig
    from autonomous_quadrotor_environment_tpu.landing.env import LandingConfigs
    from autonomous_quadrotor_environment_tpu.landing.ppo import (
        landing_ppo_init,
        make_landing_train_step,
    )

    B, T = 128, 24
    ctrl_model, ctrl_params = load_controller(FIXTURE_CTRL, 128)
    cfgs = LandingConfigs.default(training=True)
    base_cfg = PPOConfig.landing_variant()
    variants = {
        "base": dict(cfg=base_cfg, conv=jnp.float32, img=None),
        "blocks768": dict(
            cfg=dataclasses.replace(base_cfg, shuffle_block=768),
            conv=jnp.float32, img=None,
        ),
        "bf16": dict(
            cfg=dataclasses.replace(base_cfg, shuffle_block=768),
            conv=jnp.bfloat16, img=None,
        ),
        "bf16img": dict(
            cfg=dataclasses.replace(base_cfg, shuffle_block=768),
            conv=jnp.bfloat16, img=jnp.bfloat16,
        ),
    }
    res = {}
    os.makedirs("runs/r3", exist_ok=True)
    for name, v in variants.items():
        model, tx, state = landing_ppo_init(
            jax.random.PRNGKey(0), cfgs, v["cfg"], B, ctrl_model, ctrl_params,
            conv_dtype=v["conv"],
        )
        step = jax.jit(make_landing_train_step(
            model, tx, cfgs, v["cfg"], ctrl_model, ctrl_params, T,
            image_dtype=v["img"],
        ))
        state, m = step(state)
        float(m["loss"])
        t0 = time.time()
        for _ in range(5):
            state, m = step(state)
            loss = float(m["loss"])
        dt = (time.time() - t0) / 5
        res[name] = {
            "ms_per_update": round(dt * 1e3, 1),
            "decisions_per_s": round(B * T / dt, 0),
            "loss_after_6": loss,
        }
        print(json.dumps({name: res[name]}), flush=True)

    # Quality gate 1: the official 100-episode fixture benchmark with bf16
    # conv compute — inference-parity evidence for the bf16 trunks.
    try:
        from autonomous_quadrotor_environment_tpu.apps import eval_landing

        out = eval_landing.main([
            "--controller", FIXTURE_CTRL,
            "--policy",
            "autonomous_quadrotor_environment_tpu/fixtures/landing_policy.msgpack",
            "--episodes", "100", "--seed", "0", "--conv-dtype", "bfloat16",
        ])
        res["bf16_fixture_eval"] = out
    except SystemExit:
        res["bf16_fixture_eval"] = "eval_landing lacks --conv-dtype; skipped"
    except Exception as e:
        res["bf16_fixture_eval"] = f"error: {e}"
    print(json.dumps({"bf16_fixture_eval": res.get("bf16_fixture_eval")}), flush=True)

    # Quality gate 2: 80-update same-seed learning runs, f32 vs winner.
    def short_train(cfg, conv, img):
        model, tx, state = landing_ppo_init(
            jax.random.PRNGKey(7), cfgs, cfg, B, ctrl_model, ctrl_params,
            conv_dtype=conv,
        )
        step = jax.jit(make_landing_train_step(
            model, tx, cfgs, cfg, ctrl_model, ctrl_params, T, image_dtype=img,
        ))
        rewards = []
        for i in range(80):
            state, m = step(state)
            if (i + 1) % 10 == 0:
                rewards.append(round(float(m["reward_per_decision"]), 4))
        return rewards
    res["learn_f32"] = short_train(base_cfg, jnp.float32, None)
    res["learn_bf16img"] = short_train(
        dataclasses.replace(base_cfg, shuffle_block=768), jnp.bfloat16, jnp.bfloat16
    )
    with open("runs/r3/landing_opt.json", "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res), flush=True)
    return res


# ---------------------------------------------------------------- stage 5
def lr_sweep_stage():
    from autonomous_quadrotor_environment_tpu.apps import lr_sweep

    return lr_sweep.main(["--updates", "1000", "--out", "runs/lr_sweep"])


# ---------------------------------------------------------------- stage 6
def step_response_stage():
    from autonomous_quadrotor_environment_tpu.apps import step_response

    policy = "runs/vel_control/solved/nn_solved_128_0.msgpack"
    if not os.path.exists(policy):
        policy = "runs/vel_control/nn_final_128_0.msgpack"
    metrics = step_response.main(["--policy", policy])
    with open("runs/vel_control/step_response.json", "w") as f:
        json.dump({"policy": policy, "metrics": metrics}, f, indent=2)
    return metrics


# ---------------------------------------------------------------- stage 7
def vel_seed_study():
    from autonomous_quadrotor_environment_tpu.apps import seed_study

    # Budget: 2x the single-run solve point (read from stage-3's CSV), with
    # sane bounds so one slow seed can't eat the round.
    budget = 2000
    csv = "runs/vel_control/log_128_0.csv"
    if os.path.exists(csv):
        with open(csv) as f:
            rows = sum(1 for _ in f) - 1
        budget = max(1000, min(3000, rows * 10 * 2))  # eval-every 10
    banner(f"vel seed study, updates budget {budget}")
    return seed_study.main([
        "--task", "velocity", "--seeds", "30", "--updates", str(budget),
        "--eval-every", "10", "--out", "runs/seed_study_vel",
    ])


if __name__ == "__main__":
    from autonomous_quadrotor_environment_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)
    stage("profile_landing", "runs/r3/landing_profile.json", profile_landing)
    stage("polish", None, polish)
    stage("classical_final", "runs/classical_r3/summary.json", classical_final)
    stage("vel_train", "runs/vel_control/nn_final_128_0.msgpack", vel_train)
    stage("robust4k", "runs/ctrl_robust_r4/eval.json", robust4k)
    stage("robust_mix", "runs/ctrl_robust_r5/eval.json", robust_mix)
    stage("fused_bench", "runs/r3/fused_bench.json", fused_bench)
    stage("landing_opt", "runs/r3/landing_opt.json", landing_opt)
    stage("lr_sweep", "runs/lr_sweep/summary.json", lr_sweep_stage)
    stage("step_response", "runs/vel_control/step_response.json", step_response_stage)
    stage("vel_seed_study", "runs/seed_study_vel/summary.json", vel_seed_study)
    banner("ALL STAGES DONE")
