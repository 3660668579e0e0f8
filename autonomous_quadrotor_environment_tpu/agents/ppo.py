"""PPO trainer for the state controller — one compiled program per update.

Capability match for the reference's PPO
(reference: environment/controller/ppo.py:96-209 + the worker/main loop
:211-430), re-designed TPU-first:

  * The reference collects ~5000 steps/update with 2 multiprocessing workers
    that pickle the whole PPO object each round (ppo.py:359,369). Here the
    rollout is ``vmap`` over `num_envs` quadrotors x ``lax.scan`` over
    `rollout_steps`, fused with the K-epoch minibatched update into a single
    jitted `train_step` — zero host<->device traffic inside an update.
  * policy/policy_old bookkeeping (ppo.py:104-109,209) collapses: rollouts
    store logprobs under the sampling parameters, which *are* the "old"
    policy; the updated params take over at the next rollout. Semantics are
    identical (stale-free on-policy data).
  * Episode streams auto-reset inside the batch; GAE handles truncation with
    a bootstrap value (see gae.py) and per-step masks, replacing the
    reference's collect-until-done worker loop (ppo.py:233-266).

Loss (reference ppo.py:172-206): clipped surrogate on the joint (summed)
log-prob ratio, 0.5*MSE value loss against GAE returns, entropy bonus
``-coef * sum(entropy)``, Adam.

TPU-specific choices (measured, docs/PERF.md): minibatches are drawn by
permuting contiguous row BLOCKS of the env-major batch instead of single
rows (``PPOConfig.shuffle_block``; 3x end-to-end), full-batch updates skip
shuffling entirely, and auto-reset can draw from a per-rollout pool of
precomputed fresh episodes (``TrainConfig.reset_pool``; a win only when
resets are expensive — landing yes, hover no).
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config import EnvConfig, PPOConfig, TrainConfig
from ..envs import hover
from .gae import gae_advantages
from .networks import ActorCritic, DiagGaussian


class Rollout(NamedTuple):
    """On-policy experience, time-major (T, B, ...)."""

    obs: jnp.ndarray       # (T, B, obs_dim)
    actions: jnp.ndarray   # (T, B, 4)
    logprobs: jnp.ndarray  # (T, B, 4) per-dimension
    values: jnp.ndarray    # (T, B)
    rewards: jnp.ndarray   # (T, B)
    dones: jnp.ndarray     # (T, B)
    solved: jnp.ndarray    # (T, B)


@struct.dataclass
class PPOTrainState:
    params: dict
    opt_state: optax.OptState
    env_states: hover.EnvState   # batched (B, ...)
    key: jax.Array
    update_i: jnp.ndarray        # () int32


def make_optimizer(cfg: PPOConfig) -> optax.GradientTransformation:
    tx = optax.adam(cfg.lr, b1=cfg.adam_b1, b2=cfg.adam_b2)
    if cfg.max_grad_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm), tx)
    return tx


def ppo_init(
    key: jax.Array,
    env_cfg: EnvConfig,
    ppo_cfg: PPOConfig,
    train_cfg: TrainConfig,
    obs_dim: int = 75,
) -> tuple[ActorCritic, optax.GradientTransformation, PPOTrainState]:
    """Build the model, optimizer, and initial train state with a batch of
    freshly reset envs."""
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
    # jit the batched reset: un-jitted vmap dispatches the whole reset graph
    # op-by-op (pathological over a remote-TPU tunnel).
    env_states = jax.jit(jax.vmap(lambda k: hover.reset(k, env_cfg)))(env_keys)
    return model, tx, PPOTrainState(
        params=params,
        opt_state=opt_state,
        env_states=env_states,
        key=k_state,
        update_i=jnp.zeros((), jnp.int32),
    )


def _where_done(done: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Per-env select with `done` (B,) broadcast over trailing leaf dims.
    Typed PRNG-key leaves are selected on their raw uint32 data (jnp.where
    rejects the key dtype)."""
    if jnp.issubdtype(a.dtype, jax.dtypes.prng_key):
        raw = _where_done(done, jax.random.key_data(a), jax.random.key_data(b))
        return jax.random.wrap_key_data(raw)
    return jnp.where(done.reshape(done.shape + (1,) * (a.ndim - 1)), a, b)


def _match_key_repr(pool_leaf: jnp.ndarray, carry_leaf: jnp.ndarray) -> jnp.ndarray:
    """Downgrade typed PRNG-key leaves in a freshly built reset pool to raw
    uint32 when the rollout carry stores raw key data (the dp shard_map path
    keeps keys raw so they shard like any array); scan requires carry
    input/output types to match exactly."""
    typed_pool = jnp.issubdtype(pool_leaf.dtype, jax.dtypes.prng_key)
    typed_carry = jnp.issubdtype(carry_leaf.dtype, jax.dtypes.prng_key)
    if typed_pool and not typed_carry:
        return jax.random.key_data(pool_leaf)
    return pool_leaf


def rollout_batch(
    model: ActorCritic,
    params,
    env_states: hover.EnvState,
    key: jax.Array,
    env_cfg: EnvConfig,
    steps: int,
    reset_pool: int = 0,
) -> tuple[hover.EnvState, Rollout, jnp.ndarray]:
    """Collect `steps` transitions from every env in the batch.

    Returns (new_env_states, rollout, bootstrap_values). The observation the
    policy acts on is the env's history window *before* the step — the same
    (state_t, action_{t-1}) pairing the reference's `dl_input` produces
    (ppo.py:240). One deliberate divergence: the reference never resets its
    featurizer window between episodes (the `aux_dl.reset()` at ppo.py:236
    is commented out), leaking the previous episode's tail into the first
    observations; our window is zeroed at reset.

    Auto-reset pulls from a per-rollout POOL of `reset_pool` precomputed
    fresh episodes per env instead of recomputing a full reset — including
    its `warmup`-step scan — for every env at every step (which multiplied
    hot-path physics work ~(1+warmup)x; round-1 advisor finding). The pool
    states are i.i.d. draws from the same reset distribution, so training
    semantics are unchanged. If an env finishes more than `reset_pool`
    episodes in one rollout the pool wraps around: the initial state (and
    domain draw) repeats, but the env's RNG key is freshly split each time,
    so wind/noise — and the policy's sampling — still diverge.
    `reset_pool=0` falls back to exact per-step resets (`step_autoreset`).
    """
    if reset_pool <= 0:
        def body0(states, step_key):
            obs = states.hist
            mean, value, log_std = model.apply(params, obs)
            dist = DiagGaussian(mean, log_std)
            action = dist.sample(step_key)
            logprob = dist.log_prob(action)
            states, out = jax.vmap(lambda s, a: hover.step_autoreset(s, a, env_cfg))(
                states, action
            )
            return states, Rollout(
                obs=obs, actions=action, logprobs=logprob, values=value,
                rewards=out.reward, dones=out.done, solved=out.solved,
            )

        keys = jax.random.split(key, steps)
        env_states, roll = jax.lax.scan(body0, env_states, keys)
        _, bootstrap, _ = model.apply(params, env_states.hist)
        return env_states, roll, bootstrap

    b = env_states.i.shape[0]
    k_pool, k_steps = jax.random.split(key)
    pool_keys = jax.random.split(k_pool, (reset_pool, b))
    pool = jax.vmap(jax.vmap(lambda k: hover.reset(k, env_cfg)))(pool_keys)
    pool = jax.tree.map(_match_key_repr, pool, env_states)
    env_idx = jnp.arange(b)

    def body(carry, step_key):
        states, slot = carry
        obs = states.hist
        mean, value, log_std = model.apply(params, obs)
        dist = DiagGaussian(mean, log_std)
        action = dist.sample(step_key)
        logprob = dist.log_prob(action)
        stepped, out = jax.vmap(lambda s, a: hover.step(s, a, env_cfg))(states, action)
        split = jax.vmap(lambda k: jax.random.split(k))(stepped.key)  # (B, 2, 2)
        fresh = jax.tree.map(lambda p: p[slot % reset_pool, env_idx], pool)
        fresh = fresh.replace(key=split[:, 1])
        stepped = stepped.replace(key=split[:, 0])
        states = jax.tree.map(
            lambda a, c: _where_done(out.done, a, c), fresh, stepped
        )
        slot = slot + out.done.astype(jnp.int32)
        return (states, slot), Rollout(
            obs=obs,
            actions=action,
            logprobs=logprob,
            values=value,
            rewards=out.reward,
            dones=out.done,
            solved=out.solved,
        )

    keys = jax.random.split(k_steps, steps)
    (env_states, _slot), roll = jax.lax.scan(
        body, (env_states, jnp.zeros(b, jnp.int32)), keys
    )
    _, bootstrap, _ = model.apply(params, env_states.hist)
    return env_states, roll, bootstrap


def rollout_batch_fused_raw(
    model: ActorCritic,
    params,
    env_states: hover.EnvState,
    key: jax.Array,
    env_cfg: EnvConfig,
    steps: int,
    pool_size: int = 4,
    tile: int = 512,
    t_chunk: int = 16,
    interpret: bool | None = None,
):
    """`rollout_batch_fused` without materializing the (T, B, ...) Rollout:
    returns ``(new_env_states, obs_t (T,75,B), misc (T,16,B), bootstrap)``
    in the rollout kernel's transposed orientation, which the transposed
    update kernel (ops/ppo_fused_t.py) consumes directly — the fully fused
    train step never builds the row-major arrays."""
    from ..ops import rollout_fused as rf

    b = env_states.i.shape[0]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    k_noise, k_pool, k_next = jax.random.split(key, 3)
    noise = jax.random.normal(k_noise, (steps, 4, b))
    pool_keys = jax.random.split(k_pool, (pool_size, b))
    pool_states = jax.vmap(jax.vmap(lambda k: hover.reset(k, env_cfg)))(pool_keys)
    pool = jax.vmap(rf.pack_env_state)(pool_states)
    s0 = rf.pack_env_state(env_states)
    wT = rf.transpose_leaves(params)
    s_fin, obs_t, misc = rf.fused_rollout(
        s0, noise, pool, wT, env_cfg, model.action_std,
        tile=tile, t_chunk=t_chunk, interpret=interpret,
    )
    new_states = rf.unpack_env_state(s_fin, env_states)
    # Re-key: the kernel consumes no per-env randomness (noise/pool came
    # from `key`), so the envs get fresh independent streams for whatever
    # runs next (matching _where_done's raw-vs-typed key handling).
    fresh_keys = jax.random.split(k_next, b)
    if jnp.issubdtype(env_states.key.dtype, jax.dtypes.prng_key):
        new_states = new_states.replace(key=fresh_keys)
    else:
        new_states = new_states.replace(key=jax.random.key_data(fresh_keys))
    _, bootstrap, _ = model.apply(params, new_states.hist)
    return new_states, obs_t, misc, bootstrap


def rollout_batch_fused(
    model: ActorCritic,
    params,
    env_states: hover.EnvState,
    key: jax.Array,
    env_cfg: EnvConfig,
    steps: int,
    pool_size: int = 4,
    tile: int = 512,
    t_chunk: int = 16,
    interpret: bool | None = None,
) -> tuple[hover.EnvState, Rollout, jnp.ndarray]:
    """`rollout_batch` semantics via the whole-rollout Pallas kernel
    (ops/rollout_fused.py): the T-step scan — featurizer, policy forward,
    sampling, physics, reward, pool auto-reset — runs as ONE pallas_call
    instead of T sequential XLA micro-kernel rounds (measured 131.9 ms of
    the 8192x256 train step, runs/r3/perf_probe.json).

    Equivalent to the `reset_pool=pool_size` path of `rollout_batch` up to
    the RNG stream: action noise and the reset pool are pre-generated from
    `key` in one shot (same distributions), and the per-env RNG keys —
    which the no-randomization env consumes only for these two purposes —
    are re-split after the kernel. Eligibility is static:
    `ops.rollout_fused.supports` (direct control, randomization off,
    fixed std, 75-dim observations).
    """
    new_states, obs_t, misc, bootstrap = rollout_batch_fused_raw(
        model, params, env_states, key, env_cfg, steps,
        pool_size=pool_size, tile=tile, t_chunk=t_chunk, interpret=interpret,
    )
    roll = Rollout(
        obs=jnp.swapaxes(obs_t, 1, 2),
        actions=jnp.swapaxes(misc[:, 0:4], 1, 2),
        logprobs=jnp.swapaxes(misc[:, 4:8], 1, 2),
        values=misc[:, 8],
        rewards=misc[:, 9],
        dones=misc[:, 10] > 0.5,
        solved=misc[:, 11] > 0.5,
    )
    return new_states, roll, bootstrap


def ppo_loss(
    model: ActorCritic,
    params,
    obs: jnp.ndarray,
    actions: jnp.ndarray,
    old_logprobs: jnp.ndarray,
    returns: jnp.ndarray,
    advantages: jnp.ndarray,
    cfg: PPOConfig,
) -> tuple[jnp.ndarray, dict]:
    """Clipped-surrogate PPO loss (reference ppo.py:186-203)."""
    mean, values, log_std = model.apply(params, obs)
    dist = DiagGaussian(mean, log_std)
    logprobs = dist.log_prob(actions)
    ratios = jnp.exp(jnp.sum(logprobs, -1) - jnp.sum(old_logprobs, -1))
    surr1 = ratios * advantages
    surr2 = jnp.clip(ratios, 1.0 - cfg.clip_eps, 1.0 + cfg.clip_eps) * advantages
    actor_loss = -jnp.minimum(surr1, surr2)
    critic_loss = 0.5 * jnp.mean((values - returns) ** 2)
    entropy = jnp.sum(dist.entropy(), -1)
    loss = jnp.mean(actor_loss) + critic_loss - cfg.entropy_coef * jnp.mean(entropy)
    metrics = {
        "actor_loss": jnp.mean(actor_loss),
        "critic_loss": critic_loss,
        "entropy": jnp.mean(entropy),
        "ratio_max": jnp.max(ratios),
    }
    return loss, metrics


def ppo_update(
    model: ActorCritic,
    tx: optax.GradientTransformation,
    params,
    opt_state,
    roll: Rollout,
    bootstrap: jnp.ndarray,
    key: jax.Array,
    cfg: PPOConfig,
    grad_reduce: Callable[[jax.Array], jax.Array] | None = None,
) -> tuple[dict, optax.OptState, dict]:
    """K-epoch minibatched PPO update (reference ppo.py:172-209).

    `grad_reduce` hooks in the cross-device mean (psum over the data-parallel
    mesh axis) — identity when running single-chip.
    """
    returns, advantages = gae_advantages(
        roll.rewards, roll.values, roll.dones, bootstrap, cfg.gamma, cfg.gae_lambda
    )
    flat = lambda x: x.reshape((-1,) + x.shape[2:])
    obs, actions, old_lp = flat(roll.obs), flat(roll.actions), flat(roll.logprobs)
    rets, advs = flat(returns), flat(advantages)
    n = obs.shape[0]
    # Clamp like landing/ppo.py: minibatch_size > n must mean "full batch",
    # not an out-of-bounds permutation reshape below.
    mb = min(cfg.minibatch_size, n) if cfg.minibatch_size > 0 else n
    n_mb = max(n // mb, 1)
    # Block-granular shuffle (see PPOConfig.shuffle_block): permuting
    # contiguous row blocks turns the minibatch extraction into DMA-friendly
    # block gathers instead of 131072 random-row gathers (~5x on TPU). Rows
    # of the flattened (T, B) batch are different envs at one timestep, so
    # block members are i.i.d. samples.
    block = max(cfg.shuffle_block, 1)
    if n % block != 0 or mb % block != 0:
        block = 1
    # Full-batch updates (the reference's state PPO, minibatch_size=0) use
    # every row each step — shuffling is a no-op on the mean loss, skip it.
    full_batch = n_mb == 1 and mb >= n
    # Fused Pallas gradient kernel (ops/ppo_fused.py): eligible when the
    # model is the fixed-std ActorCritic and rows divide into shuffle
    # blocks. The kernel consumes the *block ids* directly — the minibatch
    # is never gathered — so it needs block > 1 (or a full batch, where the
    # identity block order streams rows in place).
    use_fused = (
        cfg.fused_update
        and not cfg.learn_std
        and actions.shape[1] == 4
        and (block > 1 or full_batch)
        and n % max(block, 1) == 0
    )
    if use_fused:
        from ..ops.ppo_fused import fused_ppo_grad, fused_ppo_grad_adam, pack_aux

        fused_tile = block if block > 1 else min(n, 512)
        use_fused = n % fused_tile == 0 and mb % fused_tile == 0
    # Fuse the optax.adam step into the kernel's last grid step
    # (ops/ppo_fused.py:fused_ppo_grad_adam): the Adam update between
    # kernel calls otherwise lowers to ~100 tiny XLA ops per minibatch,
    # measured at ~20% of the whole update (docs/PERF.md round-3 probes).
    # Requires plain Adam (no grad clipping), a constant lr, no cross-device
    # grad reduction (dp pmean needs the raw grads), and the standard optax
    # (ScaleByAdamState, ...) state tuple.
    use_fused_adam = (
        use_fused
        and cfg.fused_adam
        and grad_reduce is None
        and cfg.max_grad_norm == 0
        and isinstance(opt_state, tuple)
        and len(opt_state) >= 1
        and all(hasattr(opt_state[0], f) for f in ("count", "mu", "nu"))
    )
    if use_fused:
        aux = pack_aux(actions, old_lp, rets, advs)

    def epoch(carry, epoch_key):
        params, opt_state = carry
        perm = jax.random.permutation(epoch_key, n // block)

        def minibatch(carry, idx):
            params, opt_state = carry
            if use_fused_adam:
                if full_batch:
                    blocks = jnp.arange(n // fused_tile, dtype=jnp.int32)
                else:
                    blocks = idx.astype(jnp.int32)
                s0 = opt_state[0]
                loss, metrics, params, mu2, nu2, cnt = fused_ppo_grad_adam(
                    params, s0.mu, s0.nu, s0.count, obs, aux, blocks,
                    tile=fused_tile, action_std=cfg.action_std,
                    clip_eps=cfg.clip_eps, entropy_coef=cfg.entropy_coef,
                    lr=cfg.lr, adam_b1=cfg.adam_b1, adam_b2=cfg.adam_b2,
                    interpret=jax.default_backend() != "tpu",
                    compute_dtype=cfg.fused_compute,
                )
                opt_state = (s0._replace(count=cnt, mu=mu2, nu=nu2),) + tuple(
                    opt_state[1:]
                )
                return (params, opt_state), (loss, metrics)
            if use_fused:
                if full_batch:
                    blocks = jnp.arange(n // fused_tile, dtype=jnp.int32)
                else:
                    blocks = idx.astype(jnp.int32)
                loss, metrics, grads = fused_ppo_grad(
                    params, obs, aux, blocks,
                    tile=fused_tile, action_std=cfg.action_std,
                    clip_eps=cfg.clip_eps, entropy_coef=cfg.entropy_coef,
                    # Mosaic compiles only on TPU; the CPU suite interprets.
                    interpret=jax.default_backend() != "tpu",
                    compute_dtype=cfg.fused_compute,
                )
            else:
                if full_batch:
                    batch = lambda x: x
                elif block > 1:
                    batch = lambda x: x.reshape((n // block, block) + x.shape[1:])[
                        idx
                    ].reshape((mb,) + x.shape[1:])
                else:
                    batch = lambda x: jnp.take(x, idx, axis=0)
                (loss, metrics), grads = jax.value_and_grad(
                    lambda p: ppo_loss(
                        model, p, batch(obs), batch(actions), batch(old_lp),
                        batch(rets), batch(advs), cfg,
                    ),
                    has_aux=True,
                )(params)
            if grad_reduce is not None:
                grads = grad_reduce(grads)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), (loss, metrics)

        # Full-batch updates ignore idx entirely — scan over a dummy index
        # so no permutation gather is even built.
        if full_batch:
            idxs = jnp.zeros((1, 1), jnp.int32)
        else:
            idxs = perm[: n_mb * (mb // block)].reshape(n_mb, mb // block)
        (params, opt_state), (losses, metrics) = jax.lax.scan(
            minibatch, (params, opt_state), idxs
        )
        return (params, opt_state), (jnp.mean(losses), jax.tree.map(jnp.mean, metrics))

    keys = jax.random.split(key, cfg.k_epochs)
    (params, opt_state), (losses, metrics) = jax.lax.scan(epoch, (params, opt_state), keys)
    metrics = jax.tree.map(jnp.mean, metrics)
    metrics["loss"] = jnp.mean(losses)
    return params, opt_state, metrics


def update_t_tile(cfg: PPOConfig, steps: int, b: int) -> int:
    """Static lane-tile for the transposed update path, 0 if ineligible.

    A block is `tile` envs at one timestep (the same i.i.d. row blocks the
    shuffle permutes, agents/ppo.ppo_update); tile must divide the env
    batch and the minibatch row count."""
    n = steps * b
    mb = min(cfg.minibatch_size, n) if cfg.minibatch_size > 0 else n
    tile = cfg.shuffle_block if cfg.shuffle_block > 1 else 512
    tile = math.gcd(tile, b)
    if tile < 8 or n % tile or mb % tile:
        return 0
    return tile


def ppo_update_t(
    tx: optax.GradientTransformation,
    params,
    opt_state,
    obs_t: jnp.ndarray,    # (T, 75, B) — rollout-kernel orientation
    aux_t: jnp.ndarray,    # (T, 8, B): [action(4), old_lp_sum, ret, adv, 0]
    key: jax.Array,
    cfg: PPOConfig,
    grad_reduce: Callable[[jax.Array], jax.Array] | None = None,
) -> tuple[dict, optax.OptState, dict]:
    """K-epoch minibatched PPO update on transposed (features x rows) data
    via ops/ppo_fused_t.fused_ppo_grad_t — the fully fused train step's
    update half. Same epoch/minibatch/shuffle semantics as `ppo_update`'s
    fused path (reference ppo.py:172-209); equality is pinned in
    tests/test_ops_t.py."""
    from ..ops.ppo_fused_t import fused_ppo_grad_t
    from ..ops.rollout_fused import transpose_leaves

    steps, _, b = obs_t.shape
    n = steps * b
    mb = min(cfg.minibatch_size, n) if cfg.minibatch_size > 0 else n
    n_mb = max(n // mb, 1)
    tile = update_t_tile(cfg, steps, b)
    assert tile > 0, "caller must gate on update_t_tile"
    full_batch = n_mb == 1 and mb >= n
    interpret = jax.default_backend() != "tpu"

    def epoch(carry, epoch_key):
        params, opt_state = carry
        perm = jax.random.permutation(epoch_key, n // tile)

        def minibatch(carry, idx):
            params, opt_state = carry
            if full_batch:
                blocks = jnp.arange(n // tile, dtype=jnp.int32)
            else:
                blocks = idx.astype(jnp.int32)
            loss, metrics, grads = fused_ppo_grad_t(
                params, transpose_leaves(params), obs_t, aux_t, blocks,
                tile=tile, action_std=cfg.action_std, clip_eps=cfg.clip_eps,
                entropy_coef=cfg.entropy_coef, interpret=interpret,
                compute_dtype=cfg.fused_compute,
            )
            if grad_reduce is not None:
                grads = grad_reduce(grads)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), (loss, metrics)

        if full_batch:
            idxs = jnp.zeros((1, 1), jnp.int32)
        else:
            idxs = perm[: n_mb * (mb // tile)].reshape(n_mb, mb // tile)
        (params, opt_state), (losses, metrics) = jax.lax.scan(
            minibatch, (params, opt_state), idxs
        )
        return (params, opt_state), (jnp.mean(losses), jax.tree.map(jnp.mean, metrics))

    keys = jax.random.split(key, cfg.k_epochs)
    (params, opt_state), (losses, metrics) = jax.lax.scan(
        epoch, (params, opt_state), keys
    )
    metrics = jax.tree.map(jnp.mean, metrics)
    metrics["loss"] = jnp.mean(losses)
    return params, opt_state, metrics


def make_train_step(
    model: ActorCritic,
    tx: optax.GradientTransformation,
    env_cfg: EnvConfig,
    ppo_cfg: PPOConfig,
    train_cfg: TrainConfig,
    grad_reduce: Callable | None = None,
    metric_reduce: Callable | None = None,
    local_envs: int | None = None,
):
    """Build the fused rollout+update step (jit it, or shard_map it for
    multi-chip — see parallel/).

    ``local_envs``: the PER-DEVICE env count when the step will run inside
    shard_map (parallel/dp.py passes num_envs // n_dp). The transposed-update
    eligibility tile must be computed from the batch each device actually
    sees, or a dp config could pass the global gate here and then fail
    ppo_update_t's per-shard assert at trace time (ADVICE r3).
    """

    from ..ops.rollout_fused import supports as _fused_rollout_supports

    if local_envs is None:
        local_envs = train_cfg.num_envs
    # The fused rollout kernel samples with model.action_std while the fused
    # update kernels recompute logprobs from ppo_cfg.action_std; a mismatch
    # would silently train with wrong ratios (ADVICE r3) — refuse loudly.
    if train_cfg.fused_rollout or ppo_cfg.fused_update:
        if float(model.action_std) != float(ppo_cfg.action_std):
            raise ValueError(
                f"model.action_std={model.action_std} != "
                f"ppo_cfg.action_std={ppo_cfg.action_std}: the fused kernels "
                "take the policy std from both places and must agree"
            )
        if bool(model.learn_std) != bool(ppo_cfg.learn_std):
            raise ValueError(
                f"model.learn_std={model.learn_std} != "
                f"ppo_cfg.learn_std={ppo_cfg.learn_std}"
            )
    obs_dim = env_cfg.hist_t * 15
    use_fused_rollout = (
        train_cfg.fused_rollout
        and _fused_rollout_supports(env_cfg, ppo_cfg.learn_std, obs_dim)
        and train_cfg.rollout_steps % min(16, train_cfg.rollout_steps) == 0
    )
    # Fully fused path: rollout kernel -> GAE -> transposed update kernel,
    # with every batch array staying in the rollout kernel's (features x
    # rows) orientation — no (T*B, 75) transpose is ever materialized.
    use_fused_t = (
        use_fused_rollout
        and ppo_cfg.fused_update
        and not ppo_cfg.fused_adam
        and update_t_tile(ppo_cfg, train_cfg.rollout_steps, local_envs) > 0
    )

    def train_step(state: PPOTrainState) -> tuple[PPOTrainState, dict]:
        key, k_roll, k_upd = jax.random.split(state.key, 3)
        if use_fused_t:
            env_states, obs_t, misc, bootstrap = rollout_batch_fused_raw(
                model, state.params, state.env_states, k_roll, env_cfg,
                train_cfg.rollout_steps, pool_size=train_cfg.fused_pool,
            )
            rewards, dones = misc[:, 9], misc[:, 10] > 0.5
            solved = misc[:, 11] > 0.5
            returns, advs = gae_advantages(
                rewards, misc[:, 8], dones, bootstrap,
                ppo_cfg.gamma, ppo_cfg.gae_lambda,
            )
            old_lp_sum = jnp.sum(misc[:, 4:8], axis=1, keepdims=True)
            aux_t = jnp.concatenate(
                [misc[:, 0:4], old_lp_sum, returns[:, None], advs[:, None],
                 jnp.zeros_like(old_lp_sum)],
                axis=1,
            )
            params, opt_state, metrics = ppo_update_t(
                tx, state.params, state.opt_state, obs_t, aux_t, k_upd,
                ppo_cfg, grad_reduce,
            )
        else:
            if use_fused_rollout:
                env_states, roll, bootstrap = rollout_batch_fused(
                    model, state.params, state.env_states, k_roll, env_cfg,
                    train_cfg.rollout_steps, pool_size=train_cfg.fused_pool,
                )
            else:
                env_states, roll, bootstrap = rollout_batch(
                    model, state.params, state.env_states, k_roll, env_cfg,
                    train_cfg.rollout_steps, reset_pool=train_cfg.reset_pool,
                )
            params, opt_state, metrics = ppo_update(
                model, tx, state.params, state.opt_state, roll, bootstrap,
                k_upd, ppo_cfg, grad_reduce,
            )
            rewards, solved = roll.rewards, roll.solved
            dones = roll.dones
        done_f = dones.astype(jnp.float32)
        metrics["reward_per_step"] = jnp.mean(rewards)
        metrics["episodes"] = jnp.sum(done_f)
        metrics["solved_frac"] = jnp.sum(solved.astype(jnp.float32)) / jnp.maximum(
            jnp.sum(done_f), 1.0
        )
        if metric_reduce is not None:
            metrics = metric_reduce(metrics)
        return (
            PPOTrainState(
                params=params,
                opt_state=opt_state,
                env_states=env_states,
                key=key,
                update_i=state.update_i + 1,
            ),
            metrics,
        )

    return train_step


def make_train_loop(
    model: ActorCritic,
    tx: optax.GradientTransformation,
    env_cfg: EnvConfig,
    ppo_cfg: PPOConfig,
    train_cfg: TrainConfig,
    inner: int,
    grad_reduce: Callable | None = None,
    metric_reduce: Callable | None = None,
):
    """`inner` train steps as ONE jitted program (lax.scan over
    `make_train_step`), returning per-update stacked metrics.

    Why: the device trace (docs/profile/fused_full/) shows the fused step
    at 66.4 ms on device but 69.8 ms at the host loop — ~3.4 ms/update of
    dispatch latency over the axon tunnel that even async dispatch does
    not hide. Scanning N updates in-program pays that once per N and is
    how a production training loop should drive the chip. Semantics are
    identical to N sequential `train_step` calls (pinned bitwise in
    tests/test_ppo.py); callers that need per-update logging read the
    stacked metrics rows."""
    step = make_train_step(
        model, tx, env_cfg, ppo_cfg, train_cfg, grad_reduce, metric_reduce
    )

    def train_loop(state: PPOTrainState) -> tuple[PPOTrainState, dict]:
        return jax.lax.scan(lambda s, _: step(s), state, None, length=inner)

    return train_loop


def make_eval_fn(model: ActorCritic, env_cfg: EnvConfig, episodes: int, max_steps: int | None = None):
    """Deterministic evaluation: `episodes` parallel envs flown with the
    actor mean (reference `evaluate` ppo.py:272-295 + worker eval branch
    :243-245), reporting mean reward, mean length, and solved fraction."""
    max_steps = max_steps or env_cfg.max_steps

    settle_steps = max_steps // 5

    def eval_fn(params, key: jax.Array):
        keys = jax.random.split(key, episodes)
        env_states = jax.vmap(lambda k: hover.reset(k, env_cfg))(keys)

        def body(carry, i):
            states, finished, reward_sum, solved, length, v2_sum, v2_n = carry
            mean, _v, _s = model.apply(params, states.hist)
            states, out = jax.vmap(lambda s, a: hover.step(s, a, env_cfg))(states, mean)
            active = ~finished
            reward_sum = reward_sum + out.reward * active
            solved = jnp.logical_or(solved, jnp.logical_and(out.solved, active))
            length = length + active.astype(jnp.int32)
            # Station-keeping accumulator (robust criterion): |vel - target|^2
            # over active steps after the settling window (target is zero for
            # the hover task).
            late = jnp.logical_and(active, i >= settle_steps)
            vel2 = jnp.sum((states.x[:, 1:6:2] - states.vel_target) ** 2, axis=-1)
            v2_sum = v2_sum + vel2 * late
            v2_n = v2_n + late.astype(jnp.float32)
            finished = jnp.logical_or(finished, out.done)
            return (states, finished, reward_sum, solved, length, v2_sum, v2_n), None

        b = episodes
        init = (
            env_states,
            jnp.zeros(b, bool),
            jnp.zeros(b, jnp.float32),
            jnp.zeros(b, bool),
            jnp.zeros(b, jnp.int32),
            jnp.zeros(b, jnp.float32),
            jnp.zeros(b, jnp.float32),
        )
        (states, finished, reward_sum, solved, length, v2_sum, v2_n), _ = jax.lax.scan(
            body, init, jnp.arange(max_steps)
        )
        rms_vel = jnp.sqrt(v2_sum / jnp.maximum(v2_n, 1.0))
        # An episode "survives" if it solved or was never terminated early
        # (bounding-box exits end episodes before the step budget). The
        # env's step counter starts at `warmup` after reset, so its
        # timeout fires after max_steps - warmup ACTIVE eval steps —
        # round-5 fix: comparing against max_steps mislabeled every
        # timeout-without-solve episode as non-survived (and therefore
        # non-station-keeping), silently deflating the robust
        # station-keeping rates (runs/r5/robust_forensic.json exposed it:
        # "crashed" episodes with length == n_steps exactly).
        survive_cut = max_steps - env_cfg.warmup
        survived = jnp.logical_or(solved, length >= survive_cut)
        # Robust station-keeping solve (see apps/train_control --robust):
        # survive AND hold post-settle RMS velocity under 0.5 m/s.
        station = jnp.logical_and(survived, rms_vel < 0.5)
        return {
            "eval_reward": jnp.mean(reward_sum),
            "eval_length": jnp.mean(length.astype(jnp.float32)),
            "eval_solved": jnp.mean(solved.astype(jnp.float32)),
            "eval_survived": jnp.mean(survived.astype(jnp.float32)),
            "eval_rms_vel_late": jnp.mean(rms_vel),
            "eval_station_keeping": jnp.mean(station.astype(jnp.float32)),
        }

    return eval_fn


def make_forensic_eval_fn(
    model: ActorCritic, env_cfg: EnvConfig, episodes: int, max_steps: int | None = None
):
    """Per-EPISODE diagnostic evaluation (VERDICT r4 next #3: explain the
    ~57% robust-windy ceiling instead of averaging over it).

    Same deterministic protocol as `make_eval_fn`, but returns one record
    per episode instead of batch means: the episode's drawn severity and
    domain perturbations (EnvState.dom, core/randomization.py — the
    features the reference's robust_control randomizes,
    quadrotor_env.py:97-109), the peak gust-target magnitude seen during
    the episode, which criteria passed (strict solve / survival /
    station-keeping), post-settle RMS velocity, and the fraction of steps
    with the actor at its authority limit (any motor command |a| > 0.99 —
    the tanh head and the motor model both saturate at |a| = 1,
    core/dynamics.py:107).
    """
    max_steps = max_steps or env_cfg.max_steps
    settle_steps = max_steps // 5

    def eval_fn(params, key: jax.Array):
        keys = jax.random.split(key, episodes)
        env_states = jax.vmap(lambda k: hover.reset(k, env_cfg))(keys)
        severity = env_states.dom.gust_scale
        mass_factor = env_states.dom.mass_factor
        kf_mean = jnp.mean(env_states.dom.kf_degrade, axis=-1)

        def body(carry, i):
            (states, finished, reward_sum, solved, length, v2_sum, v2_n,
             sat_steps, peak_gust) = carry
            mean, _v, _s = model.apply(params, states.hist)
            active = ~finished
            sat = jnp.any(jnp.abs(mean) > 0.99, axis=-1)
            sat_steps = sat_steps + (sat & active).astype(jnp.float32)
            states, out = jax.vmap(lambda s, a: hover.step(s, a, env_cfg))(states, mean)
            peak_gust = jnp.maximum(
                peak_gust,
                jnp.linalg.norm(states.dom.gust_next, axis=-1) * active,
            )
            reward_sum = reward_sum + out.reward * active
            solved = jnp.logical_or(solved, jnp.logical_and(out.solved, active))
            length = length + active.astype(jnp.int32)
            late = jnp.logical_and(active, i >= settle_steps)
            vel2 = jnp.sum((states.x[:, 1:6:2] - states.vel_target) ** 2, axis=-1)
            v2_sum = v2_sum + vel2 * late
            v2_n = v2_n + late.astype(jnp.float32)
            finished = jnp.logical_or(finished, out.done)
            return (states, finished, reward_sum, solved, length, v2_sum, v2_n,
                    sat_steps, peak_gust), None

        b = episodes
        init = (
            env_states,
            jnp.zeros(b, bool),
            jnp.zeros(b, jnp.float32),
            jnp.zeros(b, bool),
            jnp.zeros(b, jnp.int32),
            jnp.zeros(b, jnp.float32),
            jnp.zeros(b, jnp.float32),
            jnp.zeros(b, jnp.float32),
            jnp.zeros(b, jnp.float32),
        )
        (states, finished, reward_sum, solved, length, v2_sum, v2_n,
         sat_steps, peak_gust), _ = jax.lax.scan(init=init, f=body, xs=jnp.arange(max_steps))
        rms_vel = jnp.sqrt(v2_sum / jnp.maximum(v2_n, 1.0))
        # Same warmup-adjusted survival cut as make_eval_fn (round-5 fix).
        survived = jnp.logical_or(solved, length >= max_steps - env_cfg.warmup)
        station = jnp.logical_and(survived, rms_vel < 0.5)
        return {
            "severity": severity,
            "mass_factor": mass_factor,
            "kf_mean": kf_mean,
            "peak_gust": peak_gust,
            "solved": solved,
            "survived": survived,
            "station": station,
            "rms_vel": rms_vel,
            "length": length,
            "reward": reward_sum,
            "sat_frac": sat_steps / jnp.maximum(length.astype(jnp.float32), 1.0),
        }

    return eval_fn


def evaluate(model, params, env_cfg: EnvConfig, episodes: int, key: jax.Array) -> dict:
    """Convenience one-shot (jitted) evaluation."""
    fn = jax.jit(make_eval_fn(model, env_cfg, episodes))
    return {k: float(v) for k, v in fn(params, key).items()}
