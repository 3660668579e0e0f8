"""Append the f32img+bf16conv+per-row + s2d cells (B128/B256) to
runs/r5/landing_conv_probe.json — the exact configuration of the round-5
s2d certification run (scripts/r5_landing_ablation.py stage s2d_cert_s0),
measured eval-free like the rest of the grid."""

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(REPO)
sys.path.insert(0, REPO)

import jax.numpy as jnp

spec = importlib.util.spec_from_file_location(
    "conv_probe", os.path.join(REPO, "scripts/r5_landing_conv_probe.py")
)
cp = importlib.util.module_from_spec(spec)
spec.loader.exec_module(cp)


def main():
    import jax

    print("devices:", jax.devices(), flush=True)
    from autonomous_quadrotor_environment_tpu.apps.train_landing import load_controller
    from autonomous_quadrotor_environment_tpu.landing.env import LandingConfigs

    ctrl_model, ctrl_params = load_controller(cp.FIXTURE_CTRL, 128)
    cfgs = LandingConfigs.default(training=True)
    with open(cp.OUT) as f:
        res = json.load(f)
    T, inner = 24, 3
    for B in (128, 256):
        key = f"f32img_bf16conv_perrow_s2d_B{B}"
        if key in res:
            continue
        loop, state = cp.build_loop(
            cfgs, ctrl_model, ctrl_params, B, T, inner, s2d=True,
            block=1, conv_dtype=jnp.bfloat16, image_dtype=None,
        )
        res[key], _ = cp.time_loop(loop, state, B, T, inner)
        print(json.dumps({key: res[key]}), flush=True)
        with open(cp.OUT, "w") as f:
            json.dump(res, f, indent=2)


if __name__ == "__main__":
    main()
