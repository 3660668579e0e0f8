"""Transposed fused PPO update kernel: features on sublanes, rows on lanes.

Why a second orientation of ops/ppo_fused.py: the row-major kernel is
VPU-bound, and the floor probes (runs/r3/{tanh,floor}_probe.json) showed
the bound is neither tanh (a 2-op clip changes nothing) nor the MXU (one
dot rides free behind the DMA) — it is the *narrow* elementwise chain.
Every (tile, 4) or (tile, 1) op — z, logprob, ratio, surrogate pair,
clip-tie select, value error, and their backward — occupies tile/8
sublane-tiles at 4/128 or 1/128 lane utilization, costing as many VPU
instructions as a full (tile, 128) op. Transposed, those ops are
(4, L)/(1, L): full lanes, 16x fewer instructions. The wide (128, L)
ops and all matmuls cost the same as before.

Second win: the whole-rollout kernel (ops/rollout_fused.py) already
EMITS observations in this orientation — (T, 75, B) — so the fully fused
train step feeds rollout outputs straight into this kernel with no
629 MB obs transpose, and the obs DMA pads 75->80 sublanes (6% waste)
instead of 75->128 lanes (41%).

Semantics identical to ops/ppo_fused.py `fused_ppo_grad` (same loss as
agents/ppo.ppo_loss, reference environment/controller/ppo.py:186-203,
clip-tie subgradient convention documented there); equality is pinned in
tests/test_ops_t.py against both the row-major kernel and the XLA path.

Minibatch blocks: a block is `tile` consecutive ENVS at one timestep of
the (T, B) batch — exactly the row blocks of the flattened (T*B, ...)
batch that ppo_update shuffles (block members are i.i.d. samples), so
the flat block id decomposes as (t, b_block) = divmod(id, B // tile).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ppo_fused import flatten_params, unflatten_grads

_LOG_2PI = math.log(2.0 * math.pi)


def _make_dots(cd):
    def fwd(wT, x):
        """(q, p) @ (p, L) -> (q, L)."""
        return jnp.dot(wT.astype(cd), x.astype(cd), preferred_element_type=jnp.float32)

    def contract_lanes(a, b):
        """(p, L) x (q, L) -> (p, q): the transposed gradient outer product."""
        return jax.lax.dot_general(
            a.astype(cd), b.astype(cd), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def left_t(wT, g):
        """(q, p) x (q, L) -> (p, L): backprop through fwd's weight."""
        return jax.lax.dot_general(
            wT.astype(cd), g.astype(cd), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    return fwd, contract_lanes, left_t


def _kernel_t(
    t_ids, b_ids,
    obs_ref, aux_ref,
    w1, b1, w2, b2, w3, b3, v1, c1b, v2, c2b, v3, c3b,
    gw1, gb1, gw2, gb2, gw3, gb3, gv1, gc1b, gv2, gc2b, gv3, gc3b,
    sums_ref, rmax_ref,
    *, inv_std: float, log_std: float, clip_eps: float, inv_n: float,
    compute_dtype=jnp.float32,
):
    _fwd, _cl, _lt = _make_dots(compute_dtype)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        for r in (gw1, gb1, gw2, gb2, gw3, gb3,
                  gv1, gc1b, gv2, gc2b, gv3, gc3b, sums_ref, rmax_ref):
            r[:] = jnp.zeros_like(r)

    x = obs_ref[0]                       # (obs_dim, L)
    aux = aux_ref[0]                     # (8, L)
    act = aux[0:4]
    old_lp = aux[4:5]
    ret = aux[5:6]
    adv = aux[6:7]

    # ---- forward
    a1 = jnp.tanh(_fwd(w1[:], x) + b1[:])
    a2 = jnp.tanh(_fwd(w2[:], a1) + b2[:])
    mean = jnp.tanh(_fwd(w3[:], a2) + b3[:])          # (4, L)
    k1 = jnp.tanh(_fwd(v1[:], x) + c1b[:])
    k2 = jnp.tanh(_fwd(v2[:], k1) + c2b[:])
    val = _fwd(v3[:], k2) + c3b[:]                    # (1, L)

    z = (act - mean) * inv_std
    lp = -0.5 * jnp.sum(z * z, axis=0, keepdims=True) - 4.0 * (
        log_std + 0.5 * _LOG_2PI
    )                                                  # (1, L)
    ratio = jnp.exp(lp - old_lp)
    in_band = jnp.logical_and(ratio > 1.0 - clip_eps, ratio < 1.0 + clip_eps)
    surr1 = ratio * adv
    surr2 = jnp.clip(ratio, 1.0 - clip_eps, 1.0 + clip_eps) * adv
    actor_row = -jnp.minimum(surr1, surr2)
    verr = val - ret

    # ---- backward (same clip-tie convention as ops/ppo_fused.py)
    g_ratio = (-inv_n) * adv * jnp.where(
        surr1 <= surr2, 1.0, in_band.astype(jnp.float32)
    )
    g_lp = g_ratio * ratio
    g_mean = (g_lp * z) * inv_std
    g_mraw = g_mean * (1.0 - mean * mean)              # (4, L)

    gw3[:] += _cl(g_mraw, a2)                          # (4, H)
    gb3[:] += jnp.sum(g_mraw, axis=1, keepdims=True)
    g_h2 = _lt(w3[:], g_mraw) * (1.0 - a2 * a2)        # (H, L)
    gw2[:] += _cl(g_h2, a1)
    gb2[:] += jnp.sum(g_h2, axis=1, keepdims=True)
    g_h1 = _lt(w2[:], g_h2) * (1.0 - a1 * a1)
    gw1[:] += _cl(g_h1, x)                             # (H, obs_dim)
    gb1[:] += jnp.sum(g_h1, axis=1, keepdims=True)

    g_val = verr * inv_n
    gv3[:] += _cl(g_val, k2)                           # (1, H)
    gc3b[:] += jnp.sum(g_val, axis=1, keepdims=True)
    g_k2 = _lt(v3[:], g_val) * (1.0 - k2 * k2)
    gv2[:] += _cl(g_k2, k1)
    gc2b[:] += jnp.sum(g_k2, axis=1, keepdims=True)
    g_k1 = _lt(v2[:], g_k2) * (1.0 - k1 * k1)
    gv1[:] += _cl(g_k1, x)
    gc1b[:] += jnp.sum(g_k1, axis=1, keepdims=True)

    s_actor = jnp.sum(actor_row)
    s_critic = 0.5 * jnp.sum(verr * verr)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    sums_ref[:] += (
        jnp.where(lane == 0, s_actor + s_critic, 0.0)
        + jnp.where(lane == 1, s_actor, 0.0)
        + jnp.where(lane == 2, s_critic, 0.0)
    )
    rmax_ref[:] = jnp.maximum(rmax_ref[:], jnp.full((1, 128), jnp.max(ratio)))


@partial(
    jax.jit,
    static_argnames=(
        "tile", "action_std", "clip_eps", "entropy_coef", "interpret",
        "compute_dtype",
    ),
)
def fused_ppo_grad_t(
    params,
    wT: list,                # 12 transposed leaves (rollout_fused.transpose_leaves)
    obs_t: jnp.ndarray,      # (T, obs_dim, B) f32 — rollout-kernel orientation
    aux_t: jnp.ndarray,      # (T, 8, B) f32: [action(4), old_lp_sum, ret, adv, 0]
    perm: jnp.ndarray,       # (n_blocks,) int32 flat block ids (t * B//tile + b)
    *,
    tile: int,
    action_std: float,
    clip_eps: float,
    entropy_coef: float,
    interpret: bool = False,
    compute_dtype: str = "f32",
):
    """Transposed-orientation `fused_ppo_grad`: same returns
    (loss, metrics, grads-in-the-params-pytree), rows indexed by
    (timestep, env-block)."""
    steps, obs_dim, b = obs_t.shape
    assert b % tile == 0, (b, tile)
    assert aux_t.shape == (steps, 8, b), aux_t.shape
    n_blocks = perm.shape[0]
    mb = n_blocks * tile
    blocks_per_t = b // tile
    t_ids = perm // blocks_per_t
    b_ids = perm % blocks_per_t
    hidden = wT[0].shape[0]
    log_std = math.log(action_std)

    const = lambda l: pl.BlockSpec(
        l.shape, lambda i, t_ids, b_ids: (0,) * l.ndim, memory_space=pltpu.VMEM
    )
    stat = pl.BlockSpec(
        (1, 128), lambda i, t_ids, b_ids: (0, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, obs_dim, tile),
                         lambda i, t_ids, b_ids: (t_ids[i], 0, b_ids[i]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, tile),
                         lambda i, t_ids, b_ids: (t_ids[i], 0, b_ids[i]),
                         memory_space=pltpu.VMEM),
        ] + [const(l) for l in wT],
        out_specs=[const(l) for l in wT] + [stat, stat],
    )
    kernel = partial(
        _kernel_t,
        inv_std=1.0 / action_std, log_std=log_std, clip_eps=clip_eps,
        inv_n=1.0 / mb,
        compute_dtype=jnp.bfloat16 if compute_dtype == "bf16" else jnp.float32,
    )
    flops_tile = 2 * tile * (2 * obs_dim * hidden + 2 * hidden * hidden + 5 * hidden) * 3
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(l.shape, jnp.float32) for l in wT]
        + [
            jax.ShapeDtypeStruct((1, 128), jnp.float32),
            jax.ShapeDtypeStruct((1, 128), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops_tile * n_blocks,
            bytes_accessed=(tile * (obs_dim + 8) * 4) * n_blocks,
            transcendentals=6 * tile * hidden * n_blocks,
        ),
        interpret=interpret,
    )(t_ids, b_ids, obs_t, aux_t, *wT)
    grads_t, sums, rmax = out[:-2], out[-2], out[-1]

    # Back to the parameter orientation: kernels (out,in)->(in,out),
    # biases (out,1)->(out,).
    orig = flatten_params(params)
    grads = [
        g.T if o.ndim == 2 else g.reshape(o.shape)
        for g, o in zip(grads_t, orig)
    ]
    entropy = 4.0 * (0.5 + 0.5 * _LOG_2PI + log_std)
    loss = sums[0, 0] / mb - entropy_coef * entropy
    metrics = {
        "actor_loss": sums[0, 1] / mb,
        "critic_loss": sums[0, 2] / mb,
        "entropy": jnp.asarray(entropy, jnp.float32),
        "ratio_max": rmax[0, 0],
    }
    return loss, metrics, unflatten_grads(grads, params)
