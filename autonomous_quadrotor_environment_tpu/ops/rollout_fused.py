"""Whole-rollout Pallas kernel: T env steps x policy forward in ONE launch.

Round-3 profile (runs/r3/perf_probe.json): the scanned XLA rollout at
8192x256 costs 131.9 ms — 56% of the train step — and is NOT compute
bound. Each of the 256 sequential scan steps lowers to ~30 small XLA
kernels whose intermediates (policy activations, RK4 stages, reward
terms; ~tens of MB per step) round-trip HBM, plus per-kernel dispatch
latency. This kernel runs the ENTIRE rollout — featurizer window, actor
+ critic forward, Gaussian sampling, RK4 physics, reward, termination,
and pool-based auto-reset — inside one `pallas_call`, so per-step state
never leaves VMEM and HBM traffic collapses to the rollout outputs
(obs/actions/rewards) plus the one-time inputs (noise, reset pool,
weights).

Reference behavior being accelerated: the rollout worker loop
(reference: environment/controller/ppo.py:233-266) over
quadrotor_env.py:458-509; semantics identical to
`agents/ppo.rollout_batch` with `reset_pool=P` (envs/hover.py:283-299 for
the auto-reset convention: StepOut reports the terminal transition, the
carried state is the fresh episode's).

Design notes (docs/PERF.md round 3):

* TRANSPOSED layout: every per-env quantity is (features, envs) with envs
  on the 128-wide lane axis — physics formulas touch (3, B)/(4, B)
  arrays that fill whole lanes, where the natural (B, 3) layout would
  waste 125/128 lanes per VPU op (measured-by-construction: ~16x fewer
  VPU instructions). The MLP runs transposed too:
  h = tanh(W^T @ x_T + b), all MXU.
* The grid is (env_tiles, time_chunks), both sequential; the running env
  state lives in the `state_out` block (same block index for every time
  chunk of a tile -> the VMEM buffer persists, the standard accumulator
  pattern) so the only cross-chunk traffic is the final copy-out.
* All randomness is PRECOMPUTED outside: action noise eps ~ N(0,1) with
  shape (T, 4, B) and a P-deep pool of fresh reset states (built by the
  existing jitted `hover.reset`). The kernel is then bit-deterministic
  given its inputs, and `rollout_twin` — the same step math run as a
  plain XLA `lax.scan` — is an executable spec the kernel is tested
  against (tests/test_rollout_fused.py). Sampling uses
  action = mean + std * eps, so logprob per dim is
  -0.5*eps^2 - log_std - 0.5*log(2pi) exactly.
* Supported (statically checked) config envelope: direct control, no
  domain randomization (the robust trainer keeps the XLA path),
  fixed-std policy, hist_t*15 == 75 observations. Auto-reset pulls
  pool[slot % P] per env (P-way unrolled lane select); pool wrap-around
  repeats initial states exactly like the reset_pool path
  (agents/ppo.py:rollout_batch docstring).

Packed state rows (ROWS=128, B) — kernel-internal layout, NOT the
reference's interleaved [x, vx, y, ...] (pack/unpack convert):
    0:3    pos          3:6    vel         6:10  quat        10:13 omega
    13:88  hist (75)    88:91  prev_ang    91:94 vel_target
    94:98  last_action  98     i           99    prev_shaping
    100    has_shaping  101    abs_sum     102   pool slot
    103    done         104    solved      105:108 ang_vel   rest zeros
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import BB_ANG, BB_VEL, EnvConfig
from .ppo_fused import flatten_params

ROWS = 128
_LOG_2PI = math.log(2.0 * math.pi)

# Row offsets in the packed state (see module docstring).
_POS, _VEL, _QUAT, _OMEGA = 0, 3, 6, 10
_HIST = 13
_PREV_ANG = 88
_VEL_TGT = 91
_LAST_ACT = 94
_I, _PREV_SHAPING, _HAS_SHAPING, _ABS_SUM, _SLOT, _DONE, _SOLVED = (
    98, 99, 100, 101, 102, 103, 104,
)
_ANG_VEL = 105


def supports(env_cfg: EnvConfig, learn_std: bool, obs_dim: int) -> bool:
    """Static eligibility check for the fused rollout path."""
    return (
        env_cfg.direct_control
        and not env_cfg.randomization.enabled
        and not learn_std
        and obs_dim == 75
        and env_cfg.hist_t * 15 == 75
        and _HIST + env_cfg.hist_t * 15 <= _PREV_ANG
    )


# ---------------------------------------------------------------------------
# Pack / unpack between the EnvState pytree and the (ROWS, B) matrix
# ---------------------------------------------------------------------------


def pack_env_state(states) -> jnp.ndarray:
    """Batched EnvState pytree (leaves (B, ...)) -> packed (ROWS, B) f32.

    The physics state is de-interleaved (reference layout
    [x,vx,y,vy,z,vz,q,w], envs/hover.py:16) into contiguous pos/vel/quat/
    omega row groups so the kernel never strided-slices sublanes.
    """
    x = states.x.T.astype(jnp.float32)  # (13, B)
    b = x.shape[1]
    f32 = lambda v: v.astype(jnp.float32)
    rows = [
        x[0:5:2],                       # pos
        x[1:6:2],                       # vel
        x[6:10],                        # quat
        x[10:13],                       # omega
        states.hist.T.astype(jnp.float32),
        states.prev_ang.T.astype(jnp.float32),
        states.vel_target.T.astype(jnp.float32),
        states.last_action.T.astype(jnp.float32),
        f32(states.i)[None],
        f32(states.prev_shaping)[None],
        f32(states.has_shaping)[None],
        f32(states.abs_sum)[None],
        jnp.zeros((1, b), jnp.float32),  # slot
        f32(states.done)[None],
        f32(states.solved)[None],
        states.ang_vel.T.astype(jnp.float32),
    ]
    s = jnp.concatenate(rows, axis=0)
    return jnp.concatenate(
        [s, jnp.zeros((ROWS - s.shape[0], b), jnp.float32)], axis=0
    )


def unpack_env_state(s: jnp.ndarray, template):
    """Packed (ROWS, B) -> EnvState pytree shaped like ``template``.

    `ang` is recomputed from the quaternion (the step stores the euler of
    the post-step state in both `ang` and `prev_ang`, envs/hover.py:224-225).
    Keys/dom are taken from the template: randomization is statically off
    on this path, and the caller re-keys the envs (the kernel consumes no
    per-env randomness — see module docstring).
    """
    from ..core.quaternion import quat_euler, quat_normalize

    b = s.shape[1]
    x = jnp.zeros((13, b), jnp.float32)
    x = x.at[0:5:2].set(s[_POS:_POS + 3])
    x = x.at[1:6:2].set(s[_VEL:_VEL + 3])
    x = x.at[6:10].set(s[_QUAT:_QUAT + 4])
    x = x.at[10:13].set(s[_OMEGA:_OMEGA + 3])
    ang = quat_euler(quat_normalize(s[_QUAT:_QUAT + 4].T))
    return template.replace(
        x=x.T.astype(template.x.dtype),
        i=s[_I].astype(template.i.dtype),
        prev_shaping=s[_PREV_SHAPING].astype(template.prev_shaping.dtype),
        has_shaping=s[_HAS_SHAPING] > 0.5,
        prev_ang=s[_PREV_ANG:_PREV_ANG + 3].T.astype(template.prev_ang.dtype),
        ang=ang.astype(template.ang.dtype),
        ang_vel=s[_ANG_VEL:_ANG_VEL + 3].T.astype(template.ang_vel.dtype),
        done=s[_DONE] > 0.5,
        solved=s[_SOLVED] > 0.5,
        abs_sum=s[_ABS_SUM].astype(template.abs_sum.dtype),
        hist=s[_HIST:_HIST + 75].T.astype(template.hist.dtype),
        last_action=s[_LAST_ACT:_LAST_ACT + 4].T.astype(template.last_action.dtype),
        vel_target=s[_VEL_TGT:_VEL_TGT + 3].T.astype(template.vel_target.dtype),
    )


# ---------------------------------------------------------------------------
# Static per-config scalars
# ---------------------------------------------------------------------------


def _scalars(env_cfg: EnvConfig) -> dict:
    """Every env constant the transposed step math needs, as Python floats
    (static under jit; mirrors config.py / envs/hover.py:74-91)."""
    p = env_cfg.physics
    r = env_cfg.reward
    c8 = p.t2wr * p.mass * p.gravity / 8.0
    area = p.area
    zc = 2.0 / p.t2wr - 1.0  # hover_action_direct
    arm_coef = p.rho * p.c_d * p.beam_thickness * (p.d_arm / 10.0) * p.arm_drag_sum
    lim = [
        env_cfg.bb_vel, env_cfg.bb_vel, env_cfg.bb_vel,
        env_cfg.bb_ang_rp, env_cfg.bb_ang_rp, env_cfg.bb_ang_psi,
        env_cfg.bb_ang_vel, env_cfg.bb_ang_vel, env_cfg.bb_ang_vel,
    ]
    return dict(
        dt=env_cfg.dt,
        substeps=env_cfg.rk_substeps,
        c8=c8,
        inv_kf=1.0 / p.k_f,
        km_over_kf=p.k_m / p.k_f,
        d_arm=p.d_arm,
        i_r=p.i_r,
        drag=[-0.5 * p.rho * p.c_d * a for a in area],
        arm_coef=arm_coef,
        inv_mass=1.0 / p.mass,
        gravity=p.gravity,
        inv_j=[1.0 / p.j_xx, 1.0 / p.j_yy, 1.0 / p.j_zz],
        j=[p.j_xx, p.j_yy, p.j_zz],
        bb=[l * env_cfg.bb_scale for l in lim],
        coefs=list(r.shaping_coefs),
        tr=list(r.tr),
        tr_p=list(r.tr_p),
        n_gate=math.sqrt(3.0) if r.cascade_ang_all3 else math.sqrt(2.0),
        ang_all3=r.cascade_ang_all3,
        ang_factor=r.cascade_ang_factor,
        p_c=r.p_c,
        solved_reward=r.solved_reward,
        broken_reward=r.broken_reward,
        terminal_replaces=r.terminal_replaces,
        zero_ctrl=zc,
        max_steps=env_cfg.max_steps,
        training=env_cfg.training,
        hist=env_cfg.hist_t * 15,
    )


# ---------------------------------------------------------------------------
# Transcendentals Mosaic cannot lower (atan2 / asin): implemented from
# primitives it can. Cephes-style f32 arctan on [0,1] (odd minimax
# polynomial after the (a-1)/(a+1) range reduction; max err ~1 ulp f32),
# extended to full atan2 by quadrant logic, asin via atan2(t, sqrt(1-t^2)).
# Used by step_math, so the XLA twin evaluates the SAME approximation and
# stays bit-comparable to the kernel.
# ---------------------------------------------------------------------------


def _atan_01(a):
    """arctan for a in [0, 1]."""
    big = a > 0.41421356
    x = jnp.where(big, (a - 1.0) / (a + 1.0), a)
    z = x * x
    p = (
        ((8.05374449538e-2 * z - 1.38776856032e-1) * z + 1.99777106478e-1) * z
        - 3.33329491539e-1
    ) * z * x + x
    return p + jnp.where(big, math.pi / 4.0, 0.0)


def _atan2(y, x):
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    mx = jnp.maximum(ax, ay)
    a = jnp.minimum(ax, ay) / jnp.maximum(mx, 1e-30)
    r = _atan_01(a)
    r = jnp.where(ay > ax, math.pi / 2.0 - r, r)
    r = jnp.where(x < 0.0, math.pi - r, r)
    return jnp.where(y < 0.0, -r, r)


def _asin(t):
    t = jnp.clip(t, -1.0, 1.0)
    return _atan2(t, jnp.sqrt(jnp.maximum(1.0 - t * t, 0.0)))


# ---------------------------------------------------------------------------
# Transposed step math (shared by the kernel and the XLA twin)
# ---------------------------------------------------------------------------


def _deriv(pos, vel, q, omega, thrust, moment, omega_r, C):
    """drone_eq (core/dynamics.py:134-194) on (3|4, B) row groups,
    randomization identity, wind zero."""
    qn = q * jax.lax.rsqrt(jnp.sum(q * q, axis=0, keepdims=True))
    a, b, c, d = qn[0:1], qn[1:2], qn[2:3], qn[3:4]
    # rot rows (body->inertial), each (1, B)
    r00 = a * a + b * b - c * c - d * d
    r01 = 2 * (b * c - a * d)
    r02 = 2 * (b * d + a * c)
    r10 = 2 * (b * c + a * d)
    r11 = a * a - b * b + c * c - d * d
    r12 = 2 * (c * d - a * b)
    r20 = 2 * (b * d - a * c)
    r21 = 2 * (c * d + a * b)
    r22 = a * a - b * b - c * c + d * d

    vx, vy, vz = vel[0:1], vel[1:2], vel[2:3]
    # v_body = rot.T @ vel (wind = 0 on this path)
    vb0 = r00 * vx + r10 * vy + r20 * vz
    vb1 = r01 * vx + r11 * vy + r21 * vz
    vb2 = r02 * vx + r12 * vy + r22 * vz
    fd0 = C["drag"][0] * jnp.abs(vb0) * vb0
    fd1 = C["drag"][1] * jnp.abs(vb1) * vb1
    fd2 = C["drag"][2] * jnp.abs(vb2) * vb2 + thrust

    # f_inertial = rot @ f_body; accel = f/m - g z
    ax = (r00 * fd0 + r01 * fd1 + r02 * fd2) * C["inv_mass"]
    ay = (r10 * fd0 + r11 * fd1 + r12 * fd2) * C["inv_mass"]
    az = (r20 * fd0 + r21 * fd1 + r22 * fd2) * C["inv_mass"] - C["gravity"]

    w0, w1, w2 = omega[0:1], omega[1:2], omega[2:3]
    # m_drag (z doubled) + m_gyro + moment - omega x (J omega)
    m0 = (
        moment[0]
        - C["arm_coef"] * jnp.abs(w0) * w0
        - w0 * omega_r
        - (w1 * C["j"][2] * w2 - w2 * C["j"][1] * w1)
    )
    m1 = (
        moment[1]
        - C["arm_coef"] * jnp.abs(w1) * w1
        + w1 * omega_r
        - (w2 * C["j"][0] * w0 - w0 * C["j"][2] * w2)
    )
    m2 = (
        moment[2]
        - 2.0 * C["arm_coef"] * jnp.abs(w2) * w2
        - (w0 * C["j"][1] * w1 - w1 * C["j"][0] * w0)
    )
    dw = jnp.concatenate(
        [m0 * C["inv_j"][0], m1 * C["inv_j"][1], m2 * C["inv_j"][2]], axis=0
    )

    # dq = 0.5 * Omega(w) q (core/quaternion.py:56-73)
    q0, q1, q2, q3 = qn[0:1], qn[1:2], qn[2:3], qn[3:4]
    dq = 0.5 * jnp.concatenate(
        [
            -w0 * q1 - w1 * q2 - w2 * q3,
            w0 * q0 + w2 * q2 - w1 * q3,
            w1 * q0 - w2 * q1 + w0 * q3,
            w2 * q0 + w1 * q1 - w0 * q2,
        ],
        axis=0,
    )
    accel = jnp.concatenate([ax, ay, az], axis=0)
    return vel, accel, dq, dw


def step_math(s: jnp.ndarray, a_raw: jnp.ndarray, C: dict):
    """One full env step on the packed (ROWS, B) state, action (4, B).

    Transposed re-statement of envs/hover.py:143-242 (direct control, no
    randomization). Returns (s_next_packed_before_reset, reward (1,B),
    done (1,B), solved (1,B)).
    """
    pos, vel = s[_POS:_POS + 3], s[_VEL:_VEL + 3]
    q, omega = s[_QUAT:_QUAT + 4], s[_OMEGA:_OMEGA + 3]
    nh = C["hist"]

    # f2F (core/dynamics.py:96-120)
    a = jnp.clip(a_raw, -1.0, 1.0)
    f = (a + 1.0) * C["c8"]
    thrust = jnp.sum(f, axis=0, keepdims=True)
    moment = [
        (f[2:3] - f[0:1]) * C["d_arm"],
        (f[1:2] - f[3:4]) * C["d_arm"],
        (-f[0:1] + f[1:2] - f[2:3] + f[3:4]) * C["km_over_kf"],
    ]
    w = jnp.sqrt(f * C["inv_kf"])
    omega_r = (-w[0:1] + w[1:2] - w[2:3] + w[3:4]) * C["i_r"]

    # RK4 (core/dynamics.py:197-212)
    h = C["dt"] / C["substeps"]
    for _ in range(C["substeps"]):
        k1 = _deriv(pos, vel, q, omega, thrust, moment, omega_r, C)
        k2 = _deriv(
            pos + 0.5 * h * k1[0], vel + 0.5 * h * k1[1],
            q + 0.5 * h * k1[2], omega + 0.5 * h * k1[3],
            thrust, moment, omega_r, C,
        )
        k3 = _deriv(
            pos + 0.5 * h * k2[0], vel + 0.5 * h * k2[1],
            q + 0.5 * h * k2[2], omega + 0.5 * h * k2[3],
            thrust, moment, omega_r, C,
        )
        k4 = _deriv(
            pos + h * k3[0], vel + h * k3[1],
            q + h * k3[2], omega + h * k3[3],
            thrust, moment, omega_r, C,
        )
        c = h / 6.0
        pos = pos + c * (k1[0] + 2 * k2[0] + 2 * k3[0] + k4[0])
        vel = vel + c * (k1[1] + 2 * k2[1] + 2 * k3[1] + k4[1])
        q = q + c * (k1[2] + 2 * k2[2] + 2 * k3[2] + k4[2])
        omega = omega + c * (k1[3] + 2 * k2[3] + 2 * k3[3] + k4[3])
    q = q * jax.lax.rsqrt(jnp.sum(q * q, axis=0, keepdims=True))

    # Euler angles (core/quaternion.py:42-53) via the in-kernel atan2/asin
    q0, q1, q2, q3 = q[0:1], q[1:2], q[2:3], q[3:4]
    phi = _atan2(2 * (q0 * q1 + q2 * q3), 1 - 2 * (q1 * q1 + q2 * q2))
    theta = _asin(2 * (q0 * q2 - q3 * q1))
    psi = _atan2(2 * (q0 * q3 + q1 * q2), 1 - 2 * (q2 * q2 + q3 * q3))
    ang = jnp.concatenate([phi, theta, psi], axis=0)
    i_new = s[_I:_I + 1] + 1.0
    ang_vel = (ang - s[_PREV_ANG:_PREV_ANG + 3]) * (1.0 / C["dt"])

    # Bounding box on |vel(3), ang(3), omega(3)| (envs/hover.py:174-176).
    # Scalar limits (pallas kernels cannot capture array constants).
    bb = C["bb"]
    bb_done = (
        jnp.any(jnp.abs(vel) >= bb[0], axis=0, keepdims=True)
        | (jnp.abs(phi) >= bb[3])
        | (jnp.abs(theta) >= bb[4])
        | (jnp.abs(psi) >= bb[5])
        | jnp.any(jnp.abs(omega) >= bb[6], axis=0, keepdims=True)
    )

    # hover_reward (envs/rewards.py:28-105) on the velocity error
    verr = vel - s[_VEL_TGT:_VEL_TGT + 3]
    ssq = lambda v: jnp.sum(v * v, axis=0, keepdims=True)
    c0, c1, c2 = C["coefs"]
    shaping = -(
        c0 * jnp.sqrt(ssq(verr)) * (1.0 / BB_VEL)
        + c1 * jnp.abs(psi) * 0.25
        + c2 * jnp.sqrt(ssq(ang[0:2])) * (1.0 / BB_ANG)
    )
    r_norm = jnp.sqrt(ssq(verr) + psi * psi)
    ang_norm = jnp.sqrt(ssq(ang) if C["ang_all3"] else ssq(ang[0:2]))
    taken = jnp.zeros_like(bb_done)
    bonus = jnp.zeros_like(shaping)
    for tr_i, trp_i in zip(C["tr"], C["tr_p"]):
        hit = jnp.logical_and(~taken, r_norm < 2.0 * tr_i)
        inner = ang_norm < C["n_gate"] * tr_i * C["ang_factor"]
        bonus = bonus + jnp.where(
            hit, trp_i * (1.0 + inner.astype(s.dtype)), 0.0
        )
        taken = jnp.logical_or(taken, hit)
    shaping = shaping + bonus

    has_prev = s[_HAS_SHAPING:_HAS_SHAPING + 1] > 0.5
    reward = jnp.where(has_prev, shaping - s[_PREV_SHAPING:_PREV_SHAPING + 1], 0.0)
    da = a - C["zero_ctrl"]
    reward = reward - C["p_c"] * jnp.sum(da * da, axis=0, keepdims=True)

    solved = (ssq(verr) + ssq(ang) + ssq(omega)) < 9.0 * C["tr"][0] ** 2
    timeout = i_new >= C["max_steps"]
    if C["terminal_replaces"]:
        solved_r = jnp.full_like(reward, C["solved_reward"])
        broken_r = jnp.full_like(reward, C["broken_reward"])
    else:
        solved_r = reward + C["solved_reward"]
        broken_r = reward + C["broken_reward"]
    reward = jnp.where(
        solved, solved_r, jnp.where(timeout, reward, jnp.where(bb_done, broken_r, reward))
    )
    done = jnp.logical_or(bb_done, timeout)
    if C["training"]:
        done = jnp.logical_or(done, solved)

    # Effort accumulation (envs/hover.py:204-207; effort = clipped action)
    abs_sum = s[_ABS_SUM:_ABS_SUM + 1] + jnp.sqrt(ssq(a))

    # hist push (envs/featurizer.py:33-42): [raw action, vel-obs, q, dq]
    dq_new = 0.5 * jnp.concatenate(
        [
            -omega[0:1] * q1 - omega[1:2] * q2 - omega[2:3] * q3,
            omega[0:1] * q0 + omega[2:3] * q2 - omega[1:2] * q3,
            omega[1:2] * q0 - omega[2:3] * q1 + omega[0:1] * q3,
            omega[2:3] * q0 + omega[1:2] * q1 - omega[0:1] * q2,
        ],
        axis=0,
    )
    feat = jnp.concatenate([a_raw, verr, q, dq_new], axis=0)
    hist = jnp.concatenate([s[_HIST + 15:_HIST + nh], feat], axis=0)

    f1 = lambda v: v.astype(s.dtype)
    s_next = jnp.concatenate(
        [
            pos, vel, q, omega, hist,
            ang,                                   # prev_ang
            s[_VEL_TGT:_VEL_TGT + 3],
            a,                                     # last_action (clipped)
            i_new,
            shaping,
            jnp.ones_like(shaping),                # has_shaping
            abs_sum,
            s[_SLOT:_SLOT + 1],
            f1(done),
            f1(solved),
            ang_vel,
            s[_ANG_VEL + 3:],                      # padding rows
        ],
        axis=0,
    )
    return s_next, reward, f1(done), f1(solved)


def _policy(hist, wT, eps, action_std, log_std):
    """Transposed actor+critic forward + reparameterized sample.

    hist (75, B); wT = 12 transposed leaves [w1,b1,w2,b2,w3,b3, critic...];
    eps (4, B) standard normals. action = mean + std*eps, so the per-dim
    logprob is -0.5*eps^2 - log_std - log(2pi)/2 exactly
    (agents/networks.py:116-123). Returns (action, logprob, value (1,B)).
    """
    w1, b1, w2, b2, w3, b3, v1, c1, v2, c2, v3, c3 = wT
    dot = partial(jnp.dot, preferred_element_type=jnp.float32)
    h1 = jnp.tanh(dot(w1, hist) + b1)
    h2 = jnp.tanh(dot(w2, h1) + b2)
    mean = jnp.tanh(dot(w3, h2) + b3)
    g1 = jnp.tanh(dot(v1, hist) + c1)
    g2 = jnp.tanh(dot(v2, g1) + c2)
    value = dot(v3, g2) + c3
    action = mean + action_std * eps
    logprob = -0.5 * eps * eps - (log_std + 0.5 * _LOG_2PI)
    return action, logprob, value


def _pool_select(pool, slot, p_size):
    """fresh[r, l] = pool[slot[l] % P, r, l] as a P-way unrolled lane select."""
    m = jnp.mod(slot, float(p_size))
    fresh = jnp.zeros_like(pool[0])
    for p_i in range(p_size):
        fresh = fresh + jnp.where(m == float(p_i), pool[p_i], 0.0)
    return fresh


def _merge_reset(s_next, fresh, done):
    """where(done, fresh-episode, stepped), with the pool-slot counter row
    advanced by `done`. Row surgery is a sublane concat (Mosaic has no
    scatter lowering for .at[row].set)."""
    merged = jnp.where(done > 0.5, fresh, s_next)
    slot_row = s_next[_SLOT:_SLOT + 1] + done
    return jnp.concatenate(
        [merged[:_SLOT], slot_row, merged[_SLOT + 1:]], axis=0
    )


def transpose_leaves(params):
    """Flax param tree -> 12 transposed leaves for the transposed forward:
    kernels (in, out) -> (out, in); biases (out,) -> (out, 1)."""
    out = []
    for leaf in flatten_params(params):
        if leaf.ndim == 2:
            out.append(leaf.T)
        else:
            out.append(leaf.reshape(-1, 1))
    return out


# ---------------------------------------------------------------------------
# XLA twin (executable spec; also the CPU-test oracle)
# ---------------------------------------------------------------------------


def rollout_twin(s0, noise, pool, wT, C: dict, action_std: float):
    """`lax.scan` of exactly the kernel's per-step body. Same math, same
    order; the Pallas kernel must match this to float-reassociation."""
    log_std = math.log(action_std)

    def body(s, eps_t):
        obs = s[_HIST:_HIST + 75]
        action, logprob, value = _policy(obs, wT, eps_t, action_std, log_std)
        s_next, reward, done, solved = step_math(s, action, C)
        fresh = _pool_select(pool, s_next[_SLOT:_SLOT + 1], pool.shape[0])
        s_next = _merge_reset(s_next, fresh, done)
        return s_next, (obs, action, logprob, value, reward, done, solved)

    s_final, outs = jax.lax.scan(body, s0, noise)
    return s_final, outs


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


def _kernel(
    noise_ref, pool_ref, s0_ref,
    w1, b1, w2, b2, w3, b3, v1, c1, v2, c2, v3, c3,
    obs_ref, misc_ref, state_ref,
    *, t_chunk: int, p_size: int, action_std: float, C: dict,
):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        state_ref[:] = s0_ref[:]

    s = state_ref[:]
    wT = [w1[:], b1[:], w2[:], b2[:], w3[:], b3[:],
          v1[:], c1[:], v2[:], c2[:], v3[:], c3[:]]
    pool = pool_ref[:]
    log_std = math.log(action_std)
    for k in range(t_chunk):  # static unroll: static output indices
        obs = s[_HIST:_HIST + 75]
        action, logprob, value = _policy(obs, wT, noise_ref[k], action_std, log_std)
        s_next, reward, done, solved = step_math(s, action, C)
        obs_ref[k] = obs
        misc_ref[k] = jnp.concatenate(
            [
                action, logprob, value, reward, done, solved,
                jnp.zeros((4,) + done.shape[1:], s.dtype),
            ],
            axis=0,
        )
        fresh = _pool_select(pool, s_next[_SLOT:_SLOT + 1], p_size)
        s = _merge_reset(s_next, fresh, done)
    state_ref[:] = s


@partial(
    jax.jit,
    static_argnames=("steps", "tile", "t_chunk", "action_std", "interpret", "env_cfg"),
)
def _run_kernel(
    s0, noise, pool, wT, *, steps, tile, t_chunk, action_std, interpret, env_cfg
):
    C = _scalars(env_cfg)
    b = s0.shape[1]
    hidden = wT[0].shape[0]
    p_size = pool.shape[0]
    n_tiles = b // tile
    n_tchunks = steps // t_chunk
    grid = (n_tiles, n_tchunks)
    const = lambda l: pl.BlockSpec(l.shape, lambda i, t: (0, 0), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((t_chunk, 4, tile), lambda i, t: (t, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((p_size, ROWS, tile), lambda i, t: (0, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((ROWS, tile), lambda i, t: (0, i), memory_space=pltpu.VMEM),
    ] + [const(l) for l in wT]
    out_specs = [
        pl.BlockSpec((t_chunk, 75, tile), lambda i, t: (t, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((t_chunk, 16, tile), lambda i, t: (t, 0, i), memory_space=pltpu.VMEM),
        # Running state: same block for every t -> persistent accumulator.
        pl.BlockSpec((ROWS, tile), lambda i, t: (0, i), memory_space=pltpu.VMEM),
    ]
    flops_step = 2 * tile * 2 * (75 * hidden + hidden * hidden + hidden * 4) + tile * 600
    return pl.pallas_call(
        partial(
            _kernel, t_chunk=t_chunk, p_size=p_size, action_std=action_std, C=C
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((steps, 75, b), jnp.float32),
            jax.ShapeDtypeStruct((steps, 16, b), jnp.float32),
            jax.ShapeDtypeStruct((ROWS, b), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops_step * steps * n_tiles,
            bytes_accessed=(steps * b * (75 + 16 + 4) + p_size * ROWS * b * 2) * 4,
            transcendentals=steps * b * (6 * hidden + 16),
        ),
        interpret=interpret,
    )(noise, pool, s0, *wT)


def fused_rollout(
    s0: jnp.ndarray,           # (ROWS, B) packed
    noise: jnp.ndarray,        # (T, 4, B) standard normals
    pool: jnp.ndarray,         # (P, ROWS, B) packed fresh episodes
    wT: list,                  # 12 transposed leaves
    env_cfg: EnvConfig,
    action_std: float,
    *,
    tile: int = 256,
    t_chunk: int = 16,
    interpret: bool = False,
):
    """Run the whole rollout in one pallas_call.

    Returns (s_final (ROWS,B), obs (T,75,B), misc (T,16,B)) where misc rows
    are [action(4), logprob(4), value, reward, done, solved, pad(4)].
    """
    steps, _, b = noise.shape
    tile = min(tile, b)
    if b % tile != 0:
        tile = math.gcd(b, tile)
    t_chunk = min(t_chunk, steps)
    assert b % tile == 0 and steps % t_chunk == 0, (b, tile, steps, t_chunk)
    obs, misc, s_final = _run_kernel(
        s0, noise, pool, wT,
        steps=steps, tile=tile, t_chunk=t_chunk, action_std=action_std,
        interpret=interpret, env_cfg=env_cfg,
    )
    return s_final, obs, misc
