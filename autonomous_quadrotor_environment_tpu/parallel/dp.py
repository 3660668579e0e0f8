"""Data-parallel PPO training over a device mesh with `shard_map`.

Layout: params/optimizer state replicated (P()), env batch + per-device RNG
sharded over the ``dp`` axis (P('dp')). Gradients and metrics are `pmean`'d
over ICI inside the step, so the compiled program is identical on 1 chip or
a full pod slice; multi-host runs only need `jax.distributed.initialize`
before building the mesh.
"""

from __future__ import annotations

import inspect
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map as _shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map as _shard_map

# jax>=0.8 renamed check_rep -> check_vma; support both.
_REP_KW = (
    "check_vma" if "check_vma" in inspect.signature(_shard_map).parameters else "check_rep"
)


def shard_map(f=None, **kw):
    if "check_rep" in kw:
        kw[_REP_KW] = kw.pop("check_rep")
    if f is None:
        return lambda g: _shard_map(g, **kw)
    return _shard_map(f, **kw)

from ..config import EnvConfig, PPOConfig, TrainConfig
from ..envs import hover
from ..agents.ppo import PPOTrainState, make_optimizer, make_train_step
from ..agents.networks import ActorCritic


def make_dp_mesh(n_devices: int | None = None) -> Mesh:
    """1-D data-parallel mesh over the first `n_devices` devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), ("dp",))


def ppo_init_sharded(
    key: jax.Array,
    env_cfg: EnvConfig,
    ppo_cfg: PPOConfig,
    train_cfg: TrainConfig,
    mesh: Mesh,
    obs_dim: int = 75,
):
    """Build model/optimizer and a train state whose env batch and RNG are
    sharded over the mesh's ``dp`` axis.

    ``train_cfg.num_envs`` is the GLOBAL batch; it must divide evenly by the
    dp size. The RNG leaf carries one fold per device, shape (n_dp, 2).
    """
    n_dp = mesh.shape["dp"]
    if train_cfg.num_envs % n_dp != 0:
        raise ValueError(f"num_envs={train_cfg.num_envs} not divisible by dp={n_dp}")

    model = ActorCritic(
        hidden=train_cfg.network_size,
        action_std=ppo_cfg.action_std,
        learn_std=ppo_cfg.learn_std,
    )
    k_model, k_envs, k_state = jax.random.split(key, 3)
    params = model.init(k_model, jnp.zeros((1, obs_dim)))
    tx = make_optimizer(ppo_cfg)
    opt_state = tx.init(params)

    env_keys = jax.random.split(k_envs, train_cfg.num_envs)
    env_states = jax.jit(jax.vmap(lambda k: hover.reset(k, env_cfg)))(env_keys)
    # One independent RNG stream per device (raw uint32 key data so the leaf
    # shards like any other array).
    dev_keys = jax.random.key_data(jax.random.split(k_state, n_dp))

    state = PPOTrainState(
        params=params,
        opt_state=opt_state,
        env_states=env_states,
        key=dev_keys,
        update_i=jnp.zeros((), jnp.int32),
    )
    state = jax.device_put(state, _state_sharding(mesh))
    return model, tx, state


def _state_spec() -> PPOTrainState:
    """PartitionSpecs for PPOTrainState: replicated params/opt/counter,
    dp-sharded env batch and RNG."""
    return PPOTrainState(
        params=P(),
        opt_state=P(),
        env_states=P("dp"),
        key=P("dp"),
        update_i=P(),
    )


def _state_sharding(mesh: Mesh):
    spec = _state_spec()
    return PPOTrainState(
        params=jax.sharding.NamedSharding(mesh, spec.params),
        opt_state=jax.sharding.NamedSharding(mesh, spec.opt_state),
        env_states=jax.sharding.NamedSharding(mesh, spec.env_states),
        key=jax.sharding.NamedSharding(mesh, spec.key),
        update_i=jax.sharding.NamedSharding(mesh, spec.update_i),
    )


def make_parallel_train_step(
    model: ActorCritic,
    tx,
    env_cfg: EnvConfig,
    ppo_cfg: PPOConfig,
    train_cfg: TrainConfig,
    mesh: Mesh,
):
    """The fused rollout+update step, shard_mapped over the dp axis.

    Per-device: rollout num_envs/n_dp envs, compute local PPO grads, `pmean`
    them over ICI (the all-reduce the reference approximates by shipping
    pickled tensors through the parent process, ppo.py:371-388).
    """
    step = make_train_step(
        model,
        tx,
        env_cfg,
        ppo_cfg,
        train_cfg,
        grad_reduce=lambda g: jax.lax.pmean(g, "dp"),
        metric_reduce=lambda m: jax.lax.pmean(m, "dp"),
        # Fused-path eligibility must be judged on the per-device batch the
        # shard_mapped step actually sees, not the global one (ADVICE r3).
        local_envs=train_cfg.num_envs // mesh.devices.size,
    )

    spec = _state_spec()
    state_specs = PPOTrainState(
        params=spec.params,
        opt_state=spec.opt_state,
        env_states=spec.env_states,
        key=spec.key,
        update_i=spec.update_i,
    )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(state_specs,),
        out_specs=(state_specs, P()),
        check_rep=False,
    )
    def _sharded(state: PPOTrainState):
        # Each device sees its (1, 2) slice of the RNG leaf.
        local = PPOTrainState(
            params=state.params,
            opt_state=state.opt_state,
            env_states=state.env_states,
            key=jax.random.wrap_key_data(state.key[0]),
            update_i=state.update_i,
        )
        new, metrics = step(local)
        new = PPOTrainState(
            params=new.params,
            opt_state=new.opt_state,
            env_states=new.env_states,
            key=jax.random.key_data(new.key)[None],
            update_i=new.update_i,
        )
        return new, metrics

    return jax.jit(_sharded)


def make_parallel_train_loop(
    model: ActorCritic,
    tx,
    env_cfg: EnvConfig,
    ppo_cfg: PPOConfig,
    train_cfg: TrainConfig,
    mesh: Mesh,
    inner: int,
):
    """`inner` dp train steps as ONE jitted program — the shard_mapped step
    scanned in-program (see agents.make_train_loop for the rationale: host
    dispatch is paid once per `inner` updates). Semantics are identical to
    `inner` sequential `make_parallel_train_step` calls; per-update metrics
    come back as stacked rows."""
    step = make_parallel_train_step(model, tx, env_cfg, ppo_cfg, train_cfg, mesh)

    def loop(state: PPOTrainState):
        return jax.lax.scan(lambda s, _: step(s), state, None, length=inner)

    return jax.jit(loop)
