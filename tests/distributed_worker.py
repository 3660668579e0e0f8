"""Subprocess worker for tests/test_distributed.py.

Runs ONE dp training program on a 4-device CPU mesh either as a single
process (mode=single: 4 local virtual devices) or as one rank of a
2-process `jax.distributed` job (mode=dist: 2 local virtual devices per
process, global mesh spanning both). Same seed + same mesh shape => the
two modes must produce identical results, which is what the test asserts.

Three paths (argv[5], VERDICT r4 next #5 — the reference's actual
multi-process protocol was the *landing* trainer, rl_worker.py:267-342):

  state     one shard_mapped state-controller PPO step (parallel/dp.py)
  landing   the scanned landing dp train LOOP (parallel/dp_landing.py,
            inner=2) under the product uint8 rollout-image storage
  multiseed the seed-sharded stacked train loop (parallel/multiseed.py,
            4 seeds over 4 devices, zero collectives)

Prints one line: ``RESULT {json}``. For state/landing: post-step loss +
replicated-params checksum. For multiseed: per-seed param checksums and
final losses for the seeds whose shards this process can address (the
test merges ranks and compares against the single-process run).
"""

from __future__ import annotations

import json
import sys


def _replicated_checksum(params):
    import numpy as np
    import jax

    # Params must stay replicated: every locally-addressable shard bitwise
    # equal (in dist mode each process checks its own shards).
    leaf = jax.tree.leaves(params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)
    return float(
        sum(np.abs(np.asarray(l.addressable_shards[0].data)).sum()
            for l in jax.tree.leaves(params))
    )


def _scalar(x) -> float:
    import numpy as np

    if hasattr(x, "addressable_shards"):
        return float(np.asarray(x.addressable_shards[0].data).reshape(-1)[0])
    return float(np.asarray(x).reshape(-1)[0])


def run_state(mesh) -> dict:
    import jax

    from autonomous_quadrotor_environment_tpu.config import (
        EnvConfig,
        PPOConfig,
        TrainConfig,
    )
    from autonomous_quadrotor_environment_tpu.parallel import (
        make_parallel_train_step,
        ppo_init_sharded,
    )

    env_cfg = EnvConfig(n_steps=50)
    ppo_cfg = PPOConfig(k_epochs=2)
    train_cfg = TrainConfig(num_envs=32, rollout_steps=8, network_size=16)
    model, tx, state = ppo_init_sharded(
        jax.random.PRNGKey(0), env_cfg, ppo_cfg, train_cfg, mesh
    )
    train_step = make_parallel_train_step(model, tx, env_cfg, ppo_cfg, train_cfg, mesh)
    state, metrics = train_step(state)
    return {"loss": _scalar(metrics["loss"]), "checksum": _replicated_checksum(state.params)}


def run_landing(mesh) -> dict:
    import dataclasses

    import jax
    import jax.numpy as jnp

    from autonomous_quadrotor_environment_tpu.agents.networks import ActorCritic
    from autonomous_quadrotor_environment_tpu.config import PPOConfig
    from autonomous_quadrotor_environment_tpu.landing.env import LandingConfigs
    from autonomous_quadrotor_environment_tpu.parallel import (
        landing_ppo_init_sharded,
        make_landing_parallel_train_loop,
    )

    cfgs = LandingConfigs.default(training=True)
    ppo_cfg = dataclasses.replace(
        PPOConfig.landing_variant(), k_epochs=1, minibatch_size=8
    )
    ctrl = ActorCritic(hidden=16)
    ctrl_params = ctrl.init(jax.random.PRNGKey(0), jnp.zeros((1, 75)))
    model, tx, state = landing_ppo_init_sharded(
        jax.random.PRNGKey(0), cfgs, ppo_cfg, num_envs=4, ctrl_model=ctrl,
        ctrl_params=ctrl_params, mesh=mesh,
    )
    loop = make_landing_parallel_train_loop(
        model, tx, cfgs, ppo_cfg, ctrl, ctrl_params, rollout_steps=2, mesh=mesh,
        inner=2, image_dtype=jnp.uint8,
    )
    state, metrics = loop(state)
    return {
        "loss": _scalar(metrics["loss"]),
        "checksum": _replicated_checksum(state.params),
    }


def run_multiseed(mesh) -> dict:
    import jax
    import numpy as np

    from autonomous_quadrotor_environment_tpu.config import (
        EnvConfig,
        PPOConfig,
        TrainConfig,
    )
    from autonomous_quadrotor_environment_tpu.parallel.multiseed import (
        make_multiseed_parallel_train_loop,
        multiseed_init_sharded,
    )

    env_cfg = EnvConfig(n_steps=50)
    ppo_cfg = PPOConfig(k_epochs=2)
    train_cfg = TrainConfig(num_envs=8, rollout_steps=8, network_size=16)
    model, tx, state = multiseed_init_sharded(
        [0, 1, 2, 3], env_cfg, ppo_cfg, train_cfg, mesh
    )
    loop = make_multiseed_parallel_train_loop(
        model, tx, env_cfg, ppo_cfg, train_cfg, mesh, inner=2
    )
    state, metrics = loop(state)
    # Per-seed param checksums for locally-addressable seed shards; the
    # seed index is the shard's position on the leading (seed) axis.
    per_seed: dict[int, float] = {}
    for leaf in jax.tree.leaves(state.params):
        for s in leaf.addressable_shards:
            i0 = s.index[0].start or 0
            data = np.asarray(s.data)
            for j in range(data.shape[0]):
                per_seed[i0 + j] = per_seed.get(i0 + j, 0.0) + float(
                    np.abs(data[j]).sum()
                )
    # Final-update per-seed losses (metrics lead with the inner scan axis).
    losses: dict[int, float] = {}
    for s in metrics["loss"].addressable_shards:
        i0 = s.index[1].start or 0
        data = np.asarray(s.data)
        for j in range(data.shape[1]):
            losses[i0 + j] = float(data[-1, j])
    return {
        "per_seed_checksum": {str(k): v for k, v in sorted(per_seed.items())},
        "per_seed_loss": {str(k): v for k, v in sorted(losses.items())},
    }


def main() -> None:
    mode = sys.argv[1]  # "single" | "dist"
    port = sys.argv[2]
    pid = int(sys.argv[3])
    nproc = int(sys.argv[4])
    path = sys.argv[5] if len(sys.argv) > 5 else "state"

    import jax

    # Container sitecustomize re-applies the axon TPU platform at import
    # time; the config update (not the env var) is what actually forces CPU.
    jax.config.update("jax_platforms", "cpu")
    if mode == "dist":
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=nproc,
            process_id=pid,
        )

    from autonomous_quadrotor_environment_tpu.parallel import make_dp_mesh

    assert jax.device_count() == 4, jax.devices()
    mesh = make_dp_mesh(4)
    result = {"state": run_state, "landing": run_landing, "multiseed": run_multiseed}[
        path
    ](mesh)
    result["process"] = pid
    print("RESULT " + json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
