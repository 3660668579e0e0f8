"""Vectorized multi-seed training: a whole seed study as ONE compiled program.

TPU-first replacement for the reference's cluster seed farm: the 30-seed
velocity study (reference: environment/controller/results/seeds/
velocity_training/ checkpoints, produced by separate SLURM jobs —
slurm_output/slurm-*.out — and aggregated by logger_analyzer.py:45-97) ran
one process per seed on a CPU cluster. On TPU the seed axis is just
another batch axis: `jax.vmap` over the full PPO train step stacks S
independent (params, optimizer state, env batch, PRNG stream) replicas
into one XLA program, so every matmul gains a factor-S batch dimension and
the whole study runs at roughly one seed's wall clock on a single chip
(the controller MLPs are far from saturating the MXU at study shapes).

PRNG discipline matches apps/train_control exactly: seed s trains on the
same key stream `ppo_init(jax.random.PRNGKey(s))` produces, so the stacked
study is the *same experiment* as the serial one — tests pin the stacked
init bitwise and the stacked train step to f32 tolerance against the
serial trainer (tests/test_multiseed.py).

The stacked step vmaps the XLA train path; the Pallas kernels
(fused_rollout / fused_update) are per-shard kernels whose grids are not
batched over a seed axis, so fused configs are refused loudly.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import optax

from ..config import EnvConfig, PPOConfig, TrainConfig
from ..envs import hover
from .networks import ActorCritic
from .ppo import PPOTrainState, make_eval_fn, make_optimizer, make_train_step


def make_injectable_optimizer(cfg: PPOConfig) -> optax.GradientTransformation:
    """agents.ppo.make_optimizer with the learning rate carried in the
    optimizer STATE (optax.inject_hyperparams) instead of baked into the
    compiled program — per-replica learning rates then vmap like any other
    leaf, turning an LR x seed grid into one stacked program (the
    reference's lr_test burned a cluster job per cell,
    training_log/lr_test/csv_reader_lr.py:18-74)."""

    def factory(learning_rate):
        tx = optax.adam(learning_rate, b1=cfg.adam_b1, b2=cfg.adam_b2)
        if cfg.max_grad_norm > 0:
            tx = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm), tx)
        return tx

    return optax.inject_hyperparams(factory)(learning_rate=cfg.lr)


def multiseed_init(
    seeds: Sequence[int],
    env_cfg: EnvConfig,
    ppo_cfg: PPOConfig,
    train_cfg: TrainConfig,
    obs_dim: int = 75,
    lrs: Sequence[float] | None = None,
):
    """Stacked `PPOTrainState` with a leading seed axis on every leaf.

    Seed s's replica is constructed with the identical split order
    `agents.ppo.ppo_init(PRNGKey(s))` uses, so `seed_slice(state, i)`
    equals the serial trainer's initial state for that seed.

    ``lrs`` (optional, same length as ``seeds``): per-replica learning
    rates — the optimizer is then built with `make_injectable_optimizer`
    so replica i trains at lrs[i]; this generalizes the seed study to
    stacked hyperparameter sweeps (LR x seed grids in one program)."""
    model = ActorCritic(
        hidden=train_cfg.network_size,
        action_std=ppo_cfg.action_std,
        learn_std=ppo_cfg.learn_std,
    )
    if lrs is not None:
        if len(lrs) != len(seeds):
            raise ValueError(f"{len(lrs)} lrs for {len(seeds)} seeds")
        tx = make_injectable_optimizer(ppo_cfg)
    else:
        tx = make_optimizer(ppo_cfg)

    def init_one(seed, lr):
        key = jax.random.PRNGKey(seed)
        k_model, k_envs, k_state = jax.random.split(key, 3)
        params = model.init(k_model, jnp.zeros((1, obs_dim)))
        opt_state = tx.init(params)
        if lrs is not None:
            opt_state = opt_state._replace(
                hyperparams={**opt_state.hyperparams, "learning_rate": lr}
            )
        env_states = jax.vmap(lambda k: hover.reset(k, env_cfg))(
            jax.random.split(k_envs, train_cfg.num_envs)
        )
        return PPOTrainState(
            params=params,
            opt_state=opt_state,
            env_states=env_states,
            key=k_state,
            update_i=jnp.zeros((), jnp.int32),
        )

    # jit the stacked init: un-jitted vmap dispatches op-by-op over the
    # remote-TPU tunnel (CLAUDE.md rule; same reasoning as ppo_init).
    state = jax.jit(jax.vmap(init_one))(
        jnp.asarray(list(seeds), jnp.int32),
        jnp.asarray(list(lrs) if lrs is not None else [0.0] * len(seeds),
                    jnp.float32),
    )
    return model, tx, state


def _require_xla_path(ppo_cfg: PPOConfig, train_cfg: TrainConfig) -> None:
    if train_cfg.fused_rollout or ppo_cfg.fused_update:
        raise ValueError(
            "multiseed training vmaps the XLA train step over the seed "
            "axis; the Pallas kernels (fused_rollout/fused_update) are not "
            "seed-batched — build the configs with both disabled"
        )


def make_multiseed_train_step(
    model: ActorCritic,
    tx,
    env_cfg: EnvConfig,
    ppo_cfg: PPOConfig,
    train_cfg: TrainConfig,
):
    """One PPO update for every seed replica: `jax.vmap` of the serial
    train step over the stacked state. Metrics leaves gain a leading (S,)
    axis."""
    _require_xla_path(ppo_cfg, train_cfg)
    return jax.vmap(make_train_step(model, tx, env_cfg, ppo_cfg, train_cfg))


def make_multiseed_train_loop(
    model: ActorCritic,
    tx,
    env_cfg: EnvConfig,
    ppo_cfg: PPOConfig,
    train_cfg: TrainConfig,
    inner: int,
):
    """`inner` stacked updates as one jitted program (lax.scan of the
    vmapped step; same host-dispatch amortization as agents.make_train_loop).
    Metrics come back with leading (inner, S) axes."""
    step = make_multiseed_train_step(model, tx, env_cfg, ppo_cfg, train_cfg)

    def train_loop(state: PPOTrainState):
        return jax.lax.scan(lambda s, _: step(s), state, None, length=inner)

    return train_loop


def make_multiseed_eval_fn(model: ActorCritic, env_cfg: EnvConfig, episodes: int):
    """Per-seed deterministic evaluation: vmap of agents.make_eval_fn over
    (stacked params, (S,) keys); every metric comes back as an (S,) array."""
    return jax.vmap(make_eval_fn(model, env_cfg, episodes))


def seed_slice(tree, i: int):
    """Extract seed replica i from any stacked pytree (state, params,
    metrics)."""
    return jax.tree.map(lambda x: x[i], tree)
