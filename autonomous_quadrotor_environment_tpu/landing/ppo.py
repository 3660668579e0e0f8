"""PPO trainer for the visual-landing CNN policy — one compiled program.

Capability match for the reference's landing PPO
(reference: visual_landing/ppo_trainer.py:28-204 + the mother/child data
collection rl_worker.py:267-342): lr 2e-5, K=5 epochs, minibatch 1536,
clipped surrogate on the joint MultivariateNormal log-prob (:216-231),
action-conditioned critic regressed on GAE returns, entropy coef 0.01,
learned scalar std. The mother/children file-IPC batch assembly becomes a
`vmap` over parallel landing envs inside a scanned rollout; data parallelism
over chips reuses parallel/dp.py's shard_map pattern via `grad_reduce`.
"""

from __future__ import annotations

import math
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..agents.gae import gae_advantages
from ..config import PPOConfig
from .env import LandingConfigs, LandingObs, landing_reset, landing_step, landing_step_autoreset
from .networks import LandingActorCritic


class LandingRollout(NamedTuple):
    images: jnp.ndarray    # (T, B, 84, 84, 3)
    sens: jnp.ndarray      # (T, B, 75)
    actions: jnp.ndarray   # (T, B, 3)
    logprobs: jnp.ndarray  # (T, B) joint log-prob
    values: jnp.ndarray    # (T, B)
    rewards: jnp.ndarray   # (T, B)
    dones: jnp.ndarray     # (T, B)
    solved: jnp.ndarray    # (T, B)


@struct.dataclass
class LandingTrainState:
    params: Any
    opt_state: optax.OptState
    env_states: Any               # batched LandingState
    obs: LandingObs               # batched current observation
    key: jax.Array
    update_i: jnp.ndarray


def landing_ppo_init(
    key: jax.Array,
    cfgs: LandingConfigs,
    ppo_cfg: PPOConfig,
    num_envs: int,
    ctrl_model: Any,
    ctrl_params: Any,
    conv_dtype=jnp.float32,
    conv_s2d: bool = False,
):
    """`conv_dtype=jnp.bfloat16` runs both conv trunks + heads in bf16
    compute (params stay f32; loss math upcasts at the model boundary) —
    the conv grad steps are MXU-bound at ~50% f32 MFU, so bf16 roughly
    doubles their ceiling (measured in runs/r3/landing_opt.json).
    `conv_s2d` folds 4x4 pixel blocks into channels before the first conv
    (isomorphic weights; see ConvTrunk.space_to_depth)."""
    model = LandingActorCritic(
        action_std=ppo_cfg.action_std, dtype=conv_dtype, conv_s2d=conv_s2d
    )
    k_model, k_envs, k_state = jax.random.split(key, 3)
    params = model.init(
        k_model, jnp.zeros((1, 84, 84, 3)), jnp.zeros((1, 75)), jnp.zeros((1, 3))
    )
    tx = optax.adam(ppo_cfg.lr, b1=ppo_cfg.adam_b1, b2=ppo_cfg.adam_b2)
    opt_state = tx.init(params)
    env_keys = jax.random.split(k_envs, num_envs)
    env_states, obs = jax.jit(
        jax.vmap(lambda k: landing_reset(k, cfgs, ctrl_model, ctrl_params))
    )(env_keys)
    return model, tx, LandingTrainState(
        params=params,
        opt_state=opt_state,
        env_states=env_states,
        obs=obs,
        key=k_state,
        update_i=jnp.zeros((), jnp.int32),
    )


def _dist_logprob(mean, log_std, action):
    """Joint diagonal-Gaussian log-prob (reference MultivariateNormal with
    cov = std^2 I, rl_nn_model_v2.py:216-221)."""
    std = jnp.exp(log_std)
    z = (action - mean) / std
    per_dim = -0.5 * z**2 - log_std - 0.5 * math.log(2.0 * math.pi)
    return jnp.sum(per_dim, axis=-1)


def _dist_entropy(log_std, dim=3):
    return dim * (0.5 + 0.5 * math.log(2.0 * math.pi) + log_std)


from ..agents.ppo import (  # shared done-select / key-repr helpers
    _match_key_repr,
    _where_done,
)


def landing_rollout(
    model, params, env_states, obs: LandingObs, key, cfgs: LandingConfigs,
    ctrl_model, ctrl_params, steps: int, reset_pool: int = 2,
    image_dtype=None,
):
    """Collect `steps` decisions from every env (autoreset).

    Auto-reset pulls from a per-rollout pool of `reset_pool` precomputed
    fresh episodes per env instead of recomputing `landing_reset` — a full
    hover warmup scan + 10-frame decision interval + render — for every env
    at every decision (which ~2.2x'd the hot path; round-1 advisor finding).
    Pool draws are i.i.d. from the reset distribution; on wrap-around the
    initial geometry repeats but the env RNG key is freshly split, so sensor
    noise and action sampling still diverge. `reset_pool=0` falls back to
    exact per-step resets.
    """

    if image_dtype is None:
        store_image = lambda x: x
    elif jnp.dtype(image_dtype) == jnp.dtype(jnp.uint8):
        # Quantized storage: pixels live in [0,1] (render/camera.py), so a
        # round-to-255 grid loses no more precision than bf16's 8-bit
        # mantissa while quartering the update's dominant HBM stream (the
        # per-epoch minibatch image gather). landing_loss dequantizes after
        # the gather.
        store_image = lambda x: jnp.clip(jnp.round(x * 255.0), 0, 255).astype(jnp.uint8)
    else:
        store_image = lambda x: x.astype(image_dtype)

    use_pool = reset_pool > 0
    if use_pool:
        b = env_states.done.shape[0]
        k_pool, key = jax.random.split(key)
        pool_keys = jax.random.split(k_pool, (reset_pool, b))
        pool_states, pool_obs = jax.vmap(
            jax.vmap(lambda k: landing_reset(k, cfgs, ctrl_model, ctrl_params))
        )(pool_keys)
        pool_states = jax.tree.map(_match_key_repr, pool_states, env_states)
        env_idx = jnp.arange(b)

    def body(carry, step_key):
        env_states, obs, slot = carry
        # Sampling/logprob math stays f32 even when the model computes bf16.
        mean = model.apply(params, obs.image, obs.control_in, method="actor")
        mean = mean.astype(jnp.float32)
        log_std = params["params"]["log_std"]
        action = mean + jnp.exp(log_std) * jax.random.normal(
            step_key, mean.shape, mean.dtype
        )
        logprob = _dist_logprob(mean, log_std, action)
        value = model.apply(
            params, obs.image, obs.control_in, action, method="critic"
        ).astype(jnp.float32)
        if use_pool:
            stepped, out = jax.vmap(
                lambda s, a: landing_step(s, a, cfgs, ctrl_model, ctrl_params)
            )(env_states, action)
            split = jax.vmap(lambda k: jax.random.split(k))(stepped.key)
            fresh = jax.tree.map(
                lambda p: p[slot % reset_pool, env_idx], pool_states
            ).replace(key=split[:, 1])
            stepped = stepped.replace(key=split[:, 0])
            env_states = jax.tree.map(
                lambda a, c: _where_done(out.done, a, c), fresh, stepped
            )
            fresh_obs = jax.tree.map(lambda p: p[slot % reset_pool, env_idx], pool_obs)
            next_obs = jax.tree.map(
                lambda a, c: _where_done(out.done, a, c), fresh_obs, out.obs
            )
            slot = slot + out.done.astype(jnp.int32)
        else:
            env_states, out = jax.vmap(
                lambda s, a: landing_step_autoreset(s, a, cfgs, ctrl_model, ctrl_params)
            )(env_states, action)
            next_obs = out.obs
        roll = LandingRollout(
            # Reduced-precision storage (bf16 halves, uint8 quarters) the
            # update loop's dominant HBM stream — the per-epoch minibatch
            # gather of the (T*B, 84, 84, 3) images.
            images=store_image(obs.image),
            sens=obs.control_in,
            actions=action,
            logprobs=logprob,
            values=value,
            rewards=out.reward,
            dones=out.done,
            solved=out.solved,
        )
        return (env_states, next_obs, slot), roll

    b0 = env_states.done.shape[0]
    keys = jax.random.split(key, steps)
    (env_states, obs, _slot), roll = jax.lax.scan(
        body, (env_states, obs, jnp.zeros(b0, jnp.int32)), keys
    )
    # Bootstrap: critic at the next observation with the deterministic action.
    mean = model.apply(params, obs.image, obs.control_in, method="actor")
    bootstrap = model.apply(
        params, obs.image, obs.control_in, mean, method="critic"
    ).astype(jnp.float32)
    return env_states, obs, roll, bootstrap


def landing_loss(model, params, images, sens, actions, old_lp, returns, advs, cfg: PPOConfig):
    # Model compute may be bf16 (landing_ppo_init conv_dtype); the surrogate
    # / ratio / MSE math is always f32.
    if images.dtype == jnp.uint8:
        # Dequantize AFTER the minibatch gather so the gather moves 1-byte
        # pixels; straight into the model's compute dtype.
        images = images.astype(model.dtype) * (1.0 / 255.0)
    mean = model.apply(params, images, sens, method="actor").astype(jnp.float32)
    log_std = params["params"]["log_std"]
    value = model.apply(
        params, images, sens, actions, method="critic"
    ).astype(jnp.float32)
    logprob = _dist_logprob(mean, log_std, actions)
    ratios = jnp.exp(logprob - old_lp)
    surr1 = ratios * advs
    surr2 = jnp.clip(ratios, 1.0 - cfg.clip_eps, 1.0 + cfg.clip_eps) * advs
    actor_loss = -jnp.minimum(surr1, surr2)
    critic_loss = 0.5 * jnp.mean((value - returns) ** 2)
    entropy = _dist_entropy(log_std)
    loss = jnp.mean(actor_loss) + critic_loss - cfg.entropy_coef * entropy
    return loss, {
        "actor_loss": jnp.mean(actor_loss),
        "critic_loss": critic_loss,
        "entropy": entropy,
    }


def make_landing_train_step(
    model,
    tx,
    cfgs: LandingConfigs,
    ppo_cfg: PPOConfig,
    ctrl_model,
    ctrl_params,
    rollout_steps: int,
    grad_reduce: Callable | None = None,
    metric_reduce: Callable | None = None,
    reset_pool: int = 2,
    image_dtype=None,
):
    def train_step(state: LandingTrainState):
        key, k_roll, k_upd = jax.random.split(state.key, 3)
        env_states, obs, roll, bootstrap = landing_rollout(
            model, state.params, state.env_states, state.obs, k_roll, cfgs,
            ctrl_model, ctrl_params, rollout_steps, reset_pool=reset_pool,
            image_dtype=image_dtype,
        )
        returns, advs = gae_advantages(
            roll.rewards, roll.values, roll.dones, bootstrap,
            ppo_cfg.gamma, ppo_cfg.gae_lambda,
        )
        flat = lambda x: x.reshape((-1,) + x.shape[2:])
        images, sens = flat(roll.images), flat(roll.sens)
        actions, old_lp = flat(roll.actions), flat(roll.logprobs)
        rets, adv = flat(returns), flat(advs)
        n = images.shape[0]
        mb = ppo_cfg.minibatch_size if ppo_cfg.minibatch_size > 0 else n
        mb = min(mb, n)
        n_mb = max(n // mb, 1)
        # Block-granular shuffle + full-batch fast path (see agents/ppo.py:
        # ppo_update — identical reasoning; rows are env-major i.i.d.).
        block = max(ppo_cfg.shuffle_block, 1)
        if n % block != 0 or mb % block != 0:
            block = 1
        full_batch = n_mb == 1 and mb >= n
        reshuffle = (
            getattr(ppo_cfg, "reshuffle_per_update", False) and not full_batch
        )
        reshuffle_epoch = (
            getattr(ppo_cfg, "reshuffle_per_epoch", False) and not full_batch
        )
        if not full_batch and block == mb and not (reshuffle or reshuffle_epoch):
            # ADVICE r4: with block == minibatch the per-row shuffle
            # degenerates to FIXED minibatch compositions whose order
            # permutes per epoch — a semantics change vs the reference's
            # per-row randperm (ppo_trainer.py:188-197) that makes the
            # gather a contiguous slice (the 42k dec/s mode). Gated at
            # 128x24/mb=1536 (runs/r4/landing_block_quality.json +
            # round-5 from-scratch retrain); other geometries hitting this
            # path inherit the semantics — hence this trace-time notice.
            print(
                f"landing PPO: shuffle_block == minibatch ({mb}) -> frozen "
                "minibatch composition (only block order permutes per epoch)",
                flush=True,
            )

        if reshuffle:
            # One full-batch row gather per UPDATE (fresh minibatch
            # composition each update; frozen only within this update's K
            # epochs). The K per-epoch gathers below then stay contiguous
            # block slices when block == minibatch.
            k_upd, k_shuf = jax.random.split(k_upd)
            perm0 = jax.random.permutation(k_shuf, n)
            images, sens, actions, old_lp, rets, adv = (
                jnp.take(x, perm0, axis=0)
                for x in (images, sens, actions, old_lp, rets, adv)
            )

        data0 = (images, sens, actions, old_lp, rets, adv)

        def epoch(carry, epoch_key):
            params, opt_state = carry
            if reshuffle_epoch:
                # The reference's exact shuffle semantics (per-epoch row
                # randperm, minibatches = contiguous chunks of it,
                # ppo_trainer.py:188-197) as ONE full-batch gather per
                # epoch; the minibatch takes below then slice contiguously
                # when block == minibatch.
                k_perm, epoch_key = jax.random.split(epoch_key)
                perm_rows = jax.random.permutation(k_perm, n)
                data = tuple(jnp.take(x, perm_rows, axis=0) for x in data0)
            else:
                data = data0
            perm = jax.random.permutation(epoch_key, n // block)

            def minibatch(carry, idx):
                params, opt_state = carry
                if full_batch:
                    take = lambda x: x
                elif block > 1:
                    take = lambda x: x.reshape((n // block, block) + x.shape[1:])[
                        idx
                    ].reshape((mb,) + x.shape[1:])
                else:
                    take = lambda x: jnp.take(x, idx, axis=0)
                (loss, metrics), grads = jax.value_and_grad(
                    lambda p: landing_loss(
                        model, p, *(take(x) for x in data), ppo_cfg
                    ),
                    has_aux=True,
                )(params)
                if grad_reduce is not None:
                    grads = grad_reduce(grads)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), (loss, metrics)

            idxs = perm[: n_mb * (mb // block)].reshape(n_mb, mb // block)
            (params, opt_state), (losses, metrics) = jax.lax.scan(
                minibatch, (params, opt_state), idxs
            )
            return (params, opt_state), (jnp.mean(losses), jax.tree.map(jnp.mean, metrics))

        keys = jax.random.split(k_upd, ppo_cfg.k_epochs)
        (params, opt_state), (losses, metrics) = jax.lax.scan(
            epoch, (state.params, state.opt_state), keys
        )
        metrics = jax.tree.map(jnp.mean, metrics)
        metrics["loss"] = jnp.mean(losses)
        done_f = roll.dones.astype(jnp.float32)
        metrics["reward_per_decision"] = jnp.mean(roll.rewards)
        metrics["episodes"] = jnp.sum(done_f)
        metrics["solved_frac"] = jnp.sum(roll.solved.astype(jnp.float32)) / jnp.maximum(
            jnp.sum(done_f), 1.0
        )
        if metric_reduce is not None:
            metrics = metric_reduce(metrics)
        return (
            LandingTrainState(
                params=params, opt_state=opt_state, env_states=env_states,
                obs=obs, key=key, update_i=state.update_i + 1,
            ),
            metrics,
        )

    return train_step


def make_landing_train_loop(
    model,
    tx,
    cfgs: LandingConfigs,
    ppo_cfg: PPOConfig,
    ctrl_model,
    ctrl_params,
    rollout_steps: int,
    inner: int,
    grad_reduce: Callable | None = None,
    metric_reduce: Callable | None = None,
    reset_pool: int = 2,
    image_dtype=None,
):
    """`inner` landing train steps as ONE jitted program (lax.scan over
    `make_landing_train_step`) — same rationale as agents.make_train_loop:
    host dispatch is paid once per `inner` updates. Same PRNG stream and
    update order as `inner` sequential calls; results agree to float32
    rounding (XLA schedules the conv-heavy scan body slightly differently
    than the standalone step, unlike the MLP state trainer where the loop
    is bitwise — pinned in tests/test_landing.py). Per-update metrics come
    back stacked."""
    step = make_landing_train_step(
        model, tx, cfgs, ppo_cfg, ctrl_model, ctrl_params, rollout_steps,
        grad_reduce, metric_reduce, reset_pool, image_dtype,
    )

    def train_loop(state: LandingTrainState):
        return jax.lax.scan(lambda s, _: step(s), state, None, length=inner)

    return train_loop


def make_landing_eval_fn(
    model, cfgs: LandingConfigs, ctrl_model, ctrl_params, episodes: int,
    max_decisions: int | None = None,
):
    """The 100-episode landing benchmark (reference rl_eval_worker.py:43,
    :350-354): deterministic policy, per-episode reward / solved / time."""
    lcfg = cfgs.landing
    max_decisions = max_decisions or (lcfg.total_steps // lcfg.task_interval + 2)

    def eval_fn(params, key):
        keys = jax.random.split(key, episodes)
        env_states, obs = jax.vmap(
            lambda k: landing_reset(k, cfgs, ctrl_model, ctrl_params)
        )(keys)

        def body(carry, _):
            env_states, obs, finished, reward_sum, solved, decisions = carry
            mean = model.apply(params, obs.image, obs.control_in, method="actor")
            env_states, out = jax.vmap(
                lambda s, a: landing_step(s, a, cfgs, ctrl_model, ctrl_params)
            )(env_states, mean)
            active = ~finished
            reward_sum = reward_sum + out.reward * active
            solved = jnp.logical_or(solved, jnp.logical_and(out.solved, active))
            decisions = decisions + active.astype(jnp.int32)
            finished = jnp.logical_or(finished, out.done)
            return (env_states, out.obs, finished, reward_sum, solved, decisions), None

        b = episodes
        init = (
            env_states, obs, jnp.zeros(b, bool), jnp.zeros(b, jnp.float32),
            jnp.zeros(b, bool), jnp.zeros(b, jnp.int32),
        )
        (env_states, obs, finished, reward_sum, solved, decisions), _ = jax.lax.scan(
            body, init, None, length=max_decisions
        )
        return {
            "eval_reward": jnp.mean(reward_sum),
            "eval_solved": jnp.mean(solved.astype(jnp.float32)),
            "eval_time_s": jnp.mean(
                decisions.astype(jnp.float32) * lcfg.task_interval * 0.01
            ),
            "eval_finished": jnp.mean(finished.astype(jnp.float32)),
        }

    return eval_fn


def landing_eval(model, params, cfgs, ctrl_model, ctrl_params, episodes, key):
    fn = jax.jit(make_landing_eval_fn(model, cfgs, ctrl_model, ctrl_params, episodes))
    return {k: float(v) for k, v in fn(params, key).items()}
