"""Subprocess worker for tests/test_distributed.py.

Runs ONE dp train step on a 4-device CPU mesh either as a single process
(mode=single: 4 local virtual devices) or as one rank of a 2-process
`jax.distributed` job (mode=dist: 2 local virtual devices per process,
global mesh spanning both). Same seed + same mesh shape => the two modes
must produce identical results, which is what the test asserts.

Prints one line: ``RESULT {json}`` with the post-step loss and a params
checksum.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    mode = sys.argv[1]  # "single" | "dist"
    port = sys.argv[2]
    pid = int(sys.argv[3])
    nproc = int(sys.argv[4])

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

    import jax.numpy as jnp
    import numpy as np

    from autonomous_quadrotor_environment_tpu.config import (
        EnvConfig,
        PPOConfig,
        TrainConfig,
    )
    from autonomous_quadrotor_environment_tpu.parallel import (
        make_dp_mesh,
        make_parallel_train_step,
        ppo_init_sharded,
    )

    assert jax.device_count() == 4, jax.devices()
    mesh = make_dp_mesh(4)
    env_cfg = EnvConfig(n_steps=50)
    ppo_cfg = PPOConfig(k_epochs=2)
    train_cfg = TrainConfig(num_envs=32, rollout_steps=8, network_size=16)
    model, tx, state = ppo_init_sharded(
        jax.random.PRNGKey(0), env_cfg, ppo_cfg, train_cfg, mesh
    )
    train_step = make_parallel_train_step(model, tx, env_cfg, ppo_cfg, train_cfg, mesh)
    state, metrics = train_step(state)

    # Params must stay replicated: every locally-addressable shard bitwise
    # equal (in dist mode each process checks its own shards).
    leaf = jax.tree.leaves(state.params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)

    checksum = float(
        sum(np.abs(np.asarray(l.addressable_shards[0].data)).sum()
            for l in jax.tree.leaves(state.params))
    )
    loss = float(np.asarray(metrics["loss"].addressable_shards[0].data)) if hasattr(
        metrics["loss"], "addressable_shards"
    ) else float(metrics["loss"])
    print("RESULT " + json.dumps({"process": pid, "loss": loss, "checksum": checksum}),
          flush=True)


if __name__ == "__main__":
    main()
