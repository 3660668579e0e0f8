"""Seed-parallel studies over the device mesh: the seed axis as a mesh axis.

The reference farmed its 30-seed velocity study across a SLURM cluster —
one process per seed (reference: environment/controller/slurm_output/
slurm-*.out; results/seeds/velocity_training/). `agents/multiseed.py`
already collapses the study to ONE program via a vmapped seed axis; here
that axis is additionally sharded over the mesh's `dp` axis, so S seeds
spread across D chips with S/D replicas per chip and ZERO collectives —
seed studies are embarrassingly parallel, so unlike the dp trainer
(gradient `pmean` over ICI) the compiled program contains no communication
at all. Scaling is linear in devices by construction.

No shard_map is needed: every leaf of the stacked train state carries a
leading seed axis, so a `NamedSharding(mesh, P("dp"))` on that axis plus
XLA's sharding propagation keeps the whole scanned train loop local to
each chip."""

from __future__ import annotations

from typing import Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..agents.multiseed import (
    make_multiseed_train_loop,
    multiseed_init,
)
from ..config import EnvConfig, PPOConfig, TrainConfig


def _seed_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp"))


def multiseed_init_sharded(
    seeds: Sequence[int],
    env_cfg: EnvConfig,
    ppo_cfg: PPOConfig,
    train_cfg: TrainConfig,
    mesh: Mesh,
    obs_dim: int = 75,
):
    """Stacked train state with the leading seed axis sharded over the
    mesh's `dp` axis. len(seeds) must divide evenly across the mesh."""
    n_dev = mesh.devices.size
    if len(seeds) % n_dev != 0:
        raise ValueError(
            f"{len(seeds)} seeds do not shard evenly over {n_dev} devices"
        )
    model, tx, state = multiseed_init(seeds, env_cfg, ppo_cfg, train_cfg, obs_dim)
    shard = _seed_sharding(mesh)
    state = jax.tree.map(
        lambda x: jax.device_put(x, shard), state
    )
    return model, tx, state


def make_multiseed_parallel_train_loop(
    model,
    tx,
    env_cfg: EnvConfig,
    ppo_cfg: PPOConfig,
    train_cfg: TrainConfig,
    mesh: Mesh,
    inner: int,
):
    """`inner` seed-sharded stacked updates as one jitted program. The
    vmapped step is jitted with seed-axis shardings pinned on inputs and
    outputs; XLA propagates them through the scan, so each device runs its
    seed replicas end-to-end locally (no collectives in the program).

    Shardings are pytree prefixes: the state carries the seed axis leading
    on every leaf (P("dp")); the stacked metrics lead with the `inner` scan
    axis, seed second (P(None, "dp"))."""
    loop = make_multiseed_train_loop(model, tx, env_cfg, ppo_cfg, train_cfg, inner)
    state_shard = _seed_sharding(mesh)
    metric_shard = NamedSharding(mesh, P(None, "dp"))
    return jax.jit(
        loop, in_shardings=state_shard, out_shardings=(state_shard, metric_shard)
    )
