"""Fused Pallas kernel: PPO minibatch loss + gradients in one HBM pass.

Replaces (behind ``PPOConfig.fused_update``) the XLA `value_and_grad` of
`agents.ppo.ppo_loss` (reference loss: environment/controller/ppo.py:186-203)
for the state-controller ActorCritic (75 -> N -> N -> {4 actor, 1 critic}
tanh MLPs, fixed action std).

Why a kernel: docs/PERF.md measured ~2 ms per 131072-row minibatch gradient
step where the raw FLOPs cost ~0.2 ms. XLA materializes every layer's
activations (131072 x 128 f32 = 67 MB each) to HBM between the forward and
backward passes, plus a separate gather materializing the shuffled
minibatch. This kernel tiles the minibatch over rows, keeps a tile's
activations in VMEM, accumulates the (tiny, ~108 KB) weight gradients in
VMEM-resident outputs across grid steps, and uses scalar-prefetch block
indices so the *shuffle itself* becomes the kernel's DMA pattern — the
minibatch is never materialized at all. One streaming read of the row data
is the only HBM traffic per gradient step.

Layout contract (asserted in the wrapper):
  * obs  (n, obs_dim) f32, row-blocked by ``tile`` rows;
  * aux  (n, 8) f32 = [action(4), old_logprob_sum, return, advantage, 0];
  * perm (n_mb_blocks,) int32 — which row-block each grid step processes
    (the block-granular shuffle of agents/ppo.py with block = tile).

The backward math is hand-derived for the exact ppo_loss graph, including
the clip-tie case: for ratio inside the clip band surr1 == surr2 and both
branches have the same derivative, so `where(surr1 <= surr2, 1, in_band)`
reproduces jax.grad(jnp.minimum(...)) everywhere (ties carry equal grads).
Entropy is constant under fixed log_std and contributes no gradient; the
wrapper adds its (constant) loss term and metric outside the kernel.
All dots carry ``preferred_element_type=float32``; transposed products use
``dot_general`` contractions so no operand is ever transposed in VMEM.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LOG_2PI = math.log(2.0 * math.pi)

# Activation used inside the kernel. Module-level indirection so perf
# probes (scripts/r3_tanh_probe.py) can substitute cheaper approximations
# and measure the VPU-transcendental share of the kernel's runtime.
_tanh = jnp.tanh

# Fixed order of the 12 ActorCritic leaves (flax param tree
# params['params'][{actor,critic}][Dense_{0,1,2}][{kernel,bias}]).
_LEAVES = [
    ("actor", "Dense_0", "kernel"), ("actor", "Dense_0", "bias"),
    ("actor", "Dense_1", "kernel"), ("actor", "Dense_1", "bias"),
    ("actor", "Dense_2", "kernel"), ("actor", "Dense_2", "bias"),
    ("critic", "Dense_0", "kernel"), ("critic", "Dense_0", "bias"),
    ("critic", "Dense_1", "kernel"), ("critic", "Dense_1", "bias"),
    ("critic", "Dense_2", "kernel"), ("critic", "Dense_2", "bias"),
]


def flatten_params(params) -> list[jnp.ndarray]:
    p = params["params"]
    out = []
    for head, layer, leaf in _LEAVES:
        a = p[head][layer][leaf]
        out.append(a[None, :] if a.ndim == 1 else a)  # biases as (1, H)
    return out


def unflatten_grads(flat, params):
    p = params["params"]
    tree = {"params": {"actor": {}, "critic": {}}}
    for (head, layer, leaf), g in zip(_LEAVES, flat):
        ref = p[head][layer][leaf]
        tree["params"][head].setdefault(layer, {})[leaf] = (
            g[0] if ref.ndim == 1 else g
        ).astype(ref.dtype)
    return tree


def _make_dots(compute_dtype):
    """MXU dot helpers with f32 accumulation and ``compute_dtype`` operands.

    bf16 operands run the MXU at its native single-pass rate — ~4x the
    implicit-f32 rate Mosaic uses for f32 operands, which the round-3
    device trace measured as the kernel's actual bound (0.744 ms/call ~=
    50 TFLOP/s = the v5e f32 rate). Accumulation stays f32 either way;
    the elementwise math (tanh, ratios, clip logic) is always f32.
    """
    cd = compute_dtype

    def dot(a, b):
        return jnp.dot(a.astype(cd), b.astype(cd), preferred_element_type=jnp.float32)

    def dotT(a, b):
        """a^T @ b via contraction on rows: (T,H1)x(T,H2) -> (H1,H2)."""
        return jax.lax.dot_general(
            a.astype(cd), b.astype(cd), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def dot_bT(a, w):
        """a @ w^T via contraction on columns: (T,H2)x(H1,H2) -> (T,H1)."""
        return jax.lax.dot_general(
            a.astype(cd), w.astype(cd), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    return dot, dotT, dot_bT


def _body(
    obs_ref, aux_ref,
    w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
    v1_ref, c1b_ref, v2_ref, c2b_ref, v3_ref, c3b_ref,
    gw1_ref, gb1_ref, gw2_ref, gb2_ref, gw3_ref, gb3_ref,
    gv1_ref, gc1b_ref, gv2_ref, gc2b_ref, gv3_ref, gc3b_ref,
    sums_ref, rmax_ref,
    *, inv_std: float, log_std: float, clip_eps: float, inv_n: float,
    compute_dtype=jnp.float32,
):
    """One tile's forward+backward, accumulating into the g*/sums/rmax
    refs (which may be outputs or scratch — see the two wrappers)."""
    _dot, _dotT, _dot_bT = _make_dots(compute_dtype)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        for r in (gw1_ref, gb1_ref, gw2_ref, gb2_ref, gw3_ref, gb3_ref,
                  gv1_ref, gc1b_ref, gv2_ref, gc2b_ref, gv3_ref, gc3b_ref,
                  sums_ref, rmax_ref):
            r[:] = jnp.zeros_like(r)

    x = obs_ref[:]                       # (T, obs_dim)
    aux = aux_ref[:]                     # (T, 8)
    act = aux[:, 0:4]
    old_lp = aux[:, 4:5]                 # (T, 1)
    ret = aux[:, 5:6]
    adv = aux[:, 6:7]

    # ---- forward (activations never leave VMEM)
    a1 = _tanh(_dot(x, w1_ref[:]) + b1_ref[:])
    a2 = _tanh(_dot(a1, w2_ref[:]) + b2_ref[:])
    mean = _tanh(_dot(a2, w3_ref[:]) + b3_ref[:])   # (T, 4)

    c1 = _tanh(_dot(x, v1_ref[:]) + c1b_ref[:])
    c2 = _tanh(_dot(c1, v2_ref[:]) + c2b_ref[:])
    val = _dot(c2, v3_ref[:]) + c3b_ref[:]             # (T, 1)

    z = (act - mean) * inv_std
    lp = -0.5 * jnp.sum(z * z, axis=1, keepdims=True) - 4.0 * (
        log_std + 0.5 * _LOG_2PI
    )                                                   # (T, 1)
    ratio = jnp.exp(lp - old_lp)
    in_band = jnp.logical_and(ratio > 1.0 - clip_eps, ratio < 1.0 + clip_eps)
    surr1 = ratio * adv
    surr2 = jnp.clip(ratio, 1.0 - clip_eps, 1.0 + clip_eps) * adv
    actor_row = -jnp.minimum(surr1, surr2)              # (T, 1)
    verr = val - ret

    # ---- backward (module docstring: clip-tie handling)
    g_ratio = (-inv_n) * adv * jnp.where(
        surr1 <= surr2, 1.0, in_band.astype(jnp.float32)
    )
    g_lp = g_ratio * ratio                              # (T, 1)
    g_mean = (g_lp * z) * inv_std                       # dlp/dmean = z/std
    g_mraw = g_mean * (1.0 - mean * mean)

    gw3_ref[:] += _dotT(a2, g_mraw)
    gb3_ref[:] += jnp.sum(g_mraw, axis=0, keepdims=True)
    g_h2 = _dot_bT(g_mraw, w3_ref[:]) * (1.0 - a2 * a2)
    gw2_ref[:] += _dotT(a1, g_h2)
    gb2_ref[:] += jnp.sum(g_h2, axis=0, keepdims=True)
    g_h1 = _dot_bT(g_h2, w2_ref[:]) * (1.0 - a1 * a1)
    gw1_ref[:] += _dotT(x, g_h1)
    gb1_ref[:] += jnp.sum(g_h1, axis=0, keepdims=True)

    g_val = verr * inv_n                                # 0.5*mean((v-r)^2)
    gv3_ref[:] += _dotT(c2, g_val)
    gc3b_ref[:] += jnp.sum(g_val, axis=0, keepdims=True)
    g_k2 = _dot_bT(g_val, v3_ref[:]) * (1.0 - c2 * c2)
    gv2_ref[:] += _dotT(c1, g_k2)
    gc2b_ref[:] += jnp.sum(g_k2, axis=0, keepdims=True)
    g_k1 = _dot_bT(g_k2, v2_ref[:]) * (1.0 - c1 * c1)
    gv1_ref[:] += _dotT(x, g_k1)
    gc1b_ref[:] += jnp.sum(g_k1, axis=0, keepdims=True)

    # ---- stats, lane-aligned: sums in lanes {0: loss, 1: actor, 2: critic}
    s_actor = jnp.sum(actor_row)
    s_critic = 0.5 * jnp.sum(verr * verr)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    contrib = (
        jnp.where(lane == 0, s_actor + s_critic, 0.0)
        + jnp.where(lane == 1, s_actor, 0.0)
        + jnp.where(lane == 2, s_critic, 0.0)
    )
    sums_ref[:] += contrib
    rmax_ref[:] = jnp.maximum(rmax_ref[:], jnp.full((1, 128), jnp.max(ratio)))


def _kernel(perm_ref, *refs, **kw):
    """Grad-only kernel: refs = 2 data inputs, 12 param inputs, then the
    12 grad outputs + sums + rmax."""
    _body(*refs, **kw)


def _kernel_adam(
    perm_ref, *refs,
    b1: float, b2: float, eps: float, **kw,
):
    """Grad + fused-Adam kernel (optax.adam semantics, applied at the LAST
    grid step so the whole minibatch gradient step — including the
    optimizer — is one pallas_call).

    refs layout:
      inputs  [0:2]   obs, aux
              [2:14]  12 param leaves
              [14]    scalars (1, 128) f32: lane0 lr, lane1 1/(1-b1^t),
                      lane2 1/(1-b2^t) for the incremented count t
              [15:27] 12 Adam mu leaves
              [27:39] 12 Adam nu leaves
      outputs [39:51] 12 new param leaves
              [51:63] 12 new mu leaves
              [63:75] 12 new nu leaves
              [75]    sums, [76] rmax
      scratch [77:89] 12 grad accumulators (VMEM)
    """
    p_in = refs[2:14]
    scal_ref = refs[14]
    mu_in, nu_in = refs[15:27], refs[27:39]
    newp, newmu, newnu = refs[39:51], refs[51:63], refs[63:75]
    sums_ref, rmax_ref = refs[75], refs[76]
    gacc = refs[77:89]

    _body(refs[0], refs[1], *p_in, *gacc, sums_ref, rmax_ref, **kw)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _apply_adam():
        scal = scal_ref[:]
        lr = scal[0, 0]
        bc1inv = scal[0, 1]
        bc2inv = scal[0, 2]
        for k in range(12):
            g = gacc[k][:]
            mu = b1 * mu_in[k][:] + (1.0 - b1) * g
            nu = b2 * nu_in[k][:] + (1.0 - b2) * g * g
            newmu[k][:] = mu
            newnu[k][:] = nu
            newp[k][:] = p_in[k][:] - lr * (mu * bc1inv) / (
                jnp.sqrt(nu * bc2inv) + eps
            )


@partial(
    jax.jit,
    static_argnames=(
        "tile", "action_std", "clip_eps", "entropy_coef", "interpret",
        "compute_dtype",
    ),
)
def fused_ppo_grad(
    params,
    obs: jnp.ndarray,        # (n, obs_dim) f32
    aux: jnp.ndarray,        # (n, 8) f32: [action(4), old_lp_sum, ret, adv, 0]
    perm: jnp.ndarray,       # (n_blocks,) int32 row-block ids of this minibatch
    *,
    tile: int,
    action_std: float,
    clip_eps: float,
    entropy_coef: float,
    interpret: bool = False,
    compute_dtype: str = "f32",
):
    """Loss, metrics and parameter gradients of `agents.ppo.ppo_loss` over
    the minibatch formed by row blocks ``perm`` (block = ``tile`` rows).
    Returns ``(loss, metrics, grads)`` with the same pytree/metric structure
    as the XLA path.

    ``compute_dtype="bf16"`` casts matmul operands to bfloat16 (f32
    accumulation, elementwise math f32) — the mixed-precision MXU path,
    ~4x the dot throughput of f32 operands; gradients carry ~1e-2 relative
    bf16 rounding vs the f32 kernel (quality-gated in tests and the
    committed same-seed training comparison, runs/r3/).
    """
    n, obs_dim = obs.shape
    assert n % tile == 0, (n, tile)
    assert aux.shape == (n, 8), aux.shape
    n_blocks = perm.shape[0]
    mb = n_blocks * tile
    leaves = flatten_params(params)
    hidden = leaves[0].shape[1]
    log_std = math.log(action_std)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(
                (tile, obs_dim), lambda i, perm: (perm[i], 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile, 8), lambda i, perm: (perm[i], 0), memory_space=pltpu.VMEM
            ),
        ]
        + [
            pl.BlockSpec(l.shape, lambda i, perm: (0, 0), memory_space=pltpu.VMEM)
            for l in leaves
        ],
        out_specs=[
            pl.BlockSpec(l.shape, lambda i, perm: (0, 0), memory_space=pltpu.VMEM)
            for l in leaves
        ]
        + [
            pl.BlockSpec((1, 128), lambda i, perm: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i, perm: (0, 0), memory_space=pltpu.VMEM),
        ],
    )
    kernel = partial(
        _kernel,
        inv_std=1.0 / action_std,
        log_std=log_std,
        clip_eps=clip_eps,
        inv_n=1.0 / mb,
        compute_dtype=jnp.bfloat16 if compute_dtype == "bf16" else jnp.float32,
    )
    flops_tile = 2 * tile * (2 * obs_dim * hidden + 2 * hidden * hidden + 5 * hidden) * 3
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(l.shape, jnp.float32) for l in leaves]
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
    )(perm, obs, aux, *leaves)
    grads, sums, rmax = out[:-2], out[-2], out[-1]

    # Entropy is a constant under fixed std: H = 4*(0.5 + 0.5*log(2pi) + log_std)
    entropy = 4.0 * (0.5 + 0.5 * _LOG_2PI + log_std)
    loss = sums[0, 0] / mb - entropy_coef * entropy
    metrics = {
        "actor_loss": sums[0, 1] / mb,
        "critic_loss": sums[0, 2] / mb,
        "entropy": jnp.asarray(entropy, jnp.float32),
        "ratio_max": rmax[0, 0],
    }
    return loss, metrics, unflatten_grads(grads, params)


@partial(
    jax.jit,
    static_argnames=(
        "tile", "action_std", "clip_eps", "entropy_coef", "interpret",
        "compute_dtype", "lr", "adam_b1", "adam_b2", "adam_eps",
    ),
)
def fused_ppo_grad_adam(
    params,
    mu,
    nu,
    count: jnp.ndarray,      # () int32 — optax ScaleByAdamState.count
    obs: jnp.ndarray,
    aux: jnp.ndarray,
    perm: jnp.ndarray,
    *,
    tile: int,
    action_std: float,
    clip_eps: float,
    entropy_coef: float,
    lr: float,
    adam_b1: float,
    adam_b2: float,
    adam_eps: float = 1e-8,
    interpret: bool = False,
    compute_dtype: str = "f32",
):
    """One COMPLETE minibatch gradient step — loss, metrics, gradients AND
    the optax.adam parameter update — in a single pallas_call.

    Motivation (docs/PERF.md round-3 probes): the grad-only kernel runs
    0.74-0.92 ms/call but the full fused update measured ~8 ms/update more
    than 40x that — the optax Adam step between kernel calls lowers to
    ~100 tiny XLA ops per minibatch. Here Adam (exact `optax.adam`
    semantics: biased first/second moments, bias correction by incremented
    count, eps outside the sqrt) runs at the kernel's LAST grid step on the
    VMEM-resident gradient accumulators, so params/mu/nu round-trip HBM
    once per minibatch step (~324 KB) and no separate XLA ops remain.

    Returns ``(loss, metrics, new_params, new_mu, new_nu, new_count)``.
    Gradients are consumed in-kernel (use `fused_ppo_grad` when raw grads
    are needed, e.g. for the dp pmean path).
    """
    n, obs_dim = obs.shape
    assert n % tile == 0, (n, tile)
    assert aux.shape == (n, 8), aux.shape
    n_blocks = perm.shape[0]
    mb = n_blocks * tile
    leaves = flatten_params(params)
    mu_leaves = flatten_params(mu)
    nu_leaves = flatten_params(nu)
    hidden = leaves[0].shape[1]
    log_std = math.log(action_std)

    # lane0 lr, lane1 1/(1-b1^t), lane2 1/(1-b2^t) with t = count+1 —
    # matches optax.scale_by_adam's bias correction exactly.
    t = (count + 1).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    scalars = (
        jnp.where(lane == 0, jnp.float32(lr), 0.0)
        + jnp.where(lane == 1, 1.0 / (1.0 - adam_b1 ** t), 0.0)
        + jnp.where(lane == 2, 1.0 / (1.0 - adam_b2 ** t), 0.0)
    )

    const = lambda l: pl.BlockSpec(
        l.shape, lambda i, perm: (0, 0), memory_space=pltpu.VMEM
    )
    stat = pl.BlockSpec((1, 128), lambda i, perm: (0, 0), memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((tile, obs_dim), lambda i, perm: (perm[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 8), lambda i, perm: (perm[i], 0),
                         memory_space=pltpu.VMEM),
        ]
        + [const(l) for l in leaves]
        + [stat]
        + [const(l) for l in mu_leaves]
        + [const(l) for l in nu_leaves],
        out_specs=[const(l) for l in leaves] * 3 + [stat, stat],
        scratch_shapes=[pltpu.VMEM(l.shape, jnp.float32) for l in leaves],
    )
    kernel = partial(
        _kernel_adam,
        b1=adam_b1, b2=adam_b2, eps=adam_eps,
        inv_std=1.0 / action_std, log_std=log_std, clip_eps=clip_eps,
        inv_n=1.0 / mb,
        compute_dtype=jnp.bfloat16 if compute_dtype == "bf16" else jnp.float32,
    )
    flops_tile = 2 * tile * (2 * obs_dim * hidden + 2 * hidden * hidden + 5 * hidden) * 3
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(l.shape, jnp.float32) for l in leaves] * 3
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
    )(perm, obs, aux, *leaves, scalars, *mu_leaves, *nu_leaves)
    newp, newmu, newnu = out[0:12], out[12:24], out[24:36]
    sums, rmax = out[36], out[37]

    entropy = 4.0 * (0.5 + 0.5 * _LOG_2PI + log_std)
    loss = sums[0, 0] / mb - entropy_coef * entropy
    metrics = {
        "actor_loss": sums[0, 1] / mb,
        "critic_loss": sums[0, 2] / mb,
        "entropy": jnp.asarray(entropy, jnp.float32),
        "ratio_max": rmax[0, 0],
    }
    return (
        loss, metrics,
        unflatten_grads(newp, params),
        unflatten_grads(newmu, mu),
        unflatten_grads(newnu, nu),
        count + 1,
    )


def pack_aux(actions, old_logprobs, returns, advantages) -> jnp.ndarray:
    """Row-aligned per-sample scalars for the kernel: (n, 8) f32
    [action(4), sum(old_logprobs), return, advantage, 0]."""
    n = actions.shape[0]
    return jnp.concatenate(
        [
            actions.astype(jnp.float32),
            jnp.sum(old_logprobs, -1, keepdims=True).astype(jnp.float32),
            returns[:, None].astype(jnp.float32),
            advantages[:, None].astype(jnp.float32),
            jnp.zeros((n, 1), jnp.float32),
        ],
        axis=1,
    )
