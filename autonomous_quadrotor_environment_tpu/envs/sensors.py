"""Simulated sensor suite: accelerometer, gyro, magnetometer, GPS, TRIAD, INS.

Functional re-design of the reference's `sensor` class
(reference: environment/quadrotor_env.py:579-724 for the primary variant and
environment/quadrotor_env_opt.py:486-618 for the opt variant used by the
visual-landing worker). Differences in *how*, not *what*:

  * All random state is explicit — bias drifts accumulate in a ``SensorState``
    pytree and every read consumes a PRNG key, so the whole pipeline `vmap`s
    over a batch of quadrotors and runs inside a scanned rollout on TPU.
  * The fused read ``sensor_fused`` reproduces the exact call sequence of the
    landing worker's ``sensor_sp`` (reference visual_landing/rl_worker.py:
    164-175), including its repeated bias advancement: one fused read calls
    accel once, triad twice, gyro twice — so per fused step the biases drift
    a_b_accel x1, a_b_grav x2, m_b x2, g_b x2, exactly like the reference.

Variant differences replicated deliberately:
  * primary accel: returns the env's `accelerometer_read` (which carries the
    reference's double-gravity quirk, quadrotor_env.py:371) plus noise;
    opt accel: body-frame true acceleration `mat_rot.T @ accel` plus noise
    (quadrotor_env_opt.py:517-522).
  * primary triad: gravity direction recovered by subtracting the *induced*
    acceleration `f_in/M - R_est @ g` using the previous TRIAD estimate
    (quadrotor_env.py:657-658); opt triad: direct noisy observation of the
    rotated gravity/magnet vectors (quadrotor_env_opt.py:563-567).
  * primary accel_int adds +G back after rotating to inertial
    (quadrotor_env.py:705); opt does not (quadrotor_env_opt.py:601).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from ..config import PhysicsConfig, SensorConfig
from ..core.quaternion import deriv_quat, rot_mat_quat


@struct.dataclass
class SensorState:
    """Bias drifts + INS dead-reckoning carry (reference sensor.reset
    :630-639 and bias_reset :600-608)."""

    a_b_accel: jnp.ndarray  # () accumulated accelerometer bias
    a_b_grav: jnp.ndarray   # () accumulated gravity-read bias (opt triad)
    g_b: jnp.ndarray        # () accumulated gyro bias
    m_b: jnp.ndarray        # () accumulated magnetometer bias (opt triad)
    a_b_d: jnp.ndarray      # () accel bias drift rate, U(-d, d)
    g_b_d: jnp.ndarray      # () gyro bias drift rate
    m_b_d: jnp.ndarray      # () magnetometer bias drift rate
    pos_ins: jnp.ndarray    # (3,) dead-reckoned position
    vel_ins: jnp.ndarray    # (3,) dead-reckoned velocity
    quat_ins: jnp.ndarray   # (4,) dead-reckoned attitude
    r_est: jnp.ndarray      # (3,3) previous TRIAD rotation estimate (primary)


class QuadReads(NamedTuple):
    """The true quantities the sensors observe — extracted from the env so
    this module has no dependency on the env state layout."""

    pos: jnp.ndarray                 # (3,)
    vel: jnp.ndarray                 # (3,)
    quat: jnp.ndarray                # (4,)
    omega: jnp.ndarray               # (3,) body rates (state[-3:])
    accel: jnp.ndarray               # (3,) inertial acceleration
    accelerometer_read: jnp.ndarray  # (3,) primary-env accelerometer model
    mat_rot: jnp.ndarray             # (3,3) body->inertial rotation
    f_in_z: jnp.ndarray              # ()   body-z thrust


class FusedOut(NamedTuple):
    """Everything `sensor_sp` produces (reference rl_worker.py:164-175)."""

    states_sens: jnp.ndarray     # (14,) [pos/vel interleaved, quat, quat_dot]
    pos_accel: jnp.ndarray       # (3,) INS position
    velocity_accel: jnp.ndarray  # (3,) INS velocity
    quaternion_gyro: jnp.ndarray  # (4,) gyro-integrated attitude
    ang_vel: jnp.ndarray         # (3,) gyro read
    pos_gps: jnp.ndarray         # (3,)
    vel_gps: jnp.ndarray         # (3,)
    quaternion_triad: jnp.ndarray  # (4,)


def reads_from_env(x: jnp.ndarray, aux) -> QuadReads:
    """Build QuadReads from a 13-state and a `StepAux` (core/dynamics.py)."""
    return QuadReads(
        pos=x[0:5:2],
        vel=x[1:6:2],
        quat=x[6:10],
        omega=x[10:13],
        accel=aux.accel,
        accelerometer_read=aux.accelerometer_read,
        mat_rot=aux.mat_rot,
        f_in_z=aux.f_in_z,
    )


def sensor_reset(key: jax.Array, reads: QuadReads, cfg: SensorConfig, dtype=jnp.float32) -> SensorState:
    """Zero the biases, resample drift rates, seed the INS with the true
    state (reference quadrotor_env.py:600-639)."""
    err = 1.0 if cfg.enabled else 0.0
    k1, k2, k3 = jax.random.split(key, 3)
    u = lambda k: (jax.random.uniform(k, (), dtype) - 0.5) * 2.0
    z = jnp.zeros((), dtype)
    return SensorState(
        a_b_accel=z,
        a_b_grav=z,
        g_b=z,
        m_b=z,
        a_b_d=u(k1) * cfg.accel_bias_drift * err,
        g_b_d=u(k2) * cfg.gyro_bias_drift * err,
        m_b_d=u(k3) * cfg.magnet_bias_drift * err,
        pos_ins=reads.pos.astype(dtype),
        vel_ins=reads.vel.astype(dtype),
        quat_ins=reads.quat.astype(dtype),
        r_est=jnp.eye(3, dtype=dtype),
    )


def _std(cfg: SensorConfig, base: float) -> float:
    return base if cfg.enabled else 0.0


def accel_read(
    s: SensorState, reads: QuadReads, key: jax.Array, cfg: SensorConfig, dt: float,
    primary: bool = False,
) -> tuple[SensorState, jnp.ndarray]:
    """Accelerometer (reference quadrotor_env.py:611-619 primary,
    quadrotor_env_opt.py:517-522 opt). Advances the accel bias."""
    a_b = s.a_b_accel + s.a_b_d * dt
    read_error = a_b + jax.random.normal(key, (3,), s.a_b_accel.dtype) * _std(cfg, cfg.accel_std)
    if primary:
        body = reads.accelerometer_read
    else:
        body = reads.mat_rot.T @ reads.accel
    return s.replace(a_b_accel=a_b), body + read_error


def gyro_read(
    s: SensorState, reads: QuadReads, key: jax.Array, cfg: SensorConfig, dt: float
) -> tuple[SensorState, jnp.ndarray]:
    """Rate gyro (reference quadrotor_env.py:622-628). Advances gyro bias."""
    g_b = s.g_b + s.g_b_d * dt
    read_error = g_b + jax.random.normal(key, (3,), s.g_b.dtype) * _std(cfg, cfg.gyro_std)
    return s.replace(g_b=g_b), reads.omega + read_error


def gps_read(
    reads: QuadReads, key: jax.Array, cfg: SensorConfig
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """GPS position/velocity (reference quadrotor_env.py:642-647)."""
    kp, kv = jax.random.split(key)
    dtype = reads.pos.dtype
    pos = reads.pos + jax.random.normal(kp, (3,), dtype) * _std(cfg, cfg.gps_std_p)
    vel = reads.vel + jax.random.normal(kv, (3,), dtype) * _std(cfg, cfg.gps_std_v)
    return pos, vel


def _triad_from_body(gravity_body, magnet_body, gravity_vec, magnet_vec):
    """Shared TRIAD construction (reference quadrotor_env.py:670-693)."""
    norm = lambda v: v / jnp.linalg.norm(v)
    t1b = norm(gravity_body)
    t2b = norm(jnp.cross(gravity_body, magnet_body))
    t3b = norm(jnp.cross(t1b, t2b))
    tb = jnp.stack([t1b, t2b, t3b], axis=-1)  # == vstack(...).T
    t1i = norm(gravity_vec)
    t2i = norm(jnp.cross(gravity_vec, magnet_vec))
    t3i = norm(jnp.cross(t1i, t2i))
    ti = jnp.stack([t1i, t2i, t3i], axis=-1)
    return tb @ ti.T


def triad_read(
    s: SensorState,
    reads: QuadReads,
    key: jax.Array,
    cfg: SensorConfig,
    phys: PhysicsConfig,
    dt: float,
    primary: bool = False,
) -> tuple[SensorState, jnp.ndarray, jnp.ndarray]:
    """TRIAD attitude determination from gravity + magnetic observations.

    Primary (reference quadrotor_env.py:649-697): gravity direction is the
    accelerometer read minus the induced acceleration estimated with the
    *previous* TRIAD rotation; returns (q, R) with R = tb @ ti.T carried as
    the next estimate. Opt (quadrotor_env_opt.py:552-596): direct noisy
    observation of rotated gravity/magnet; returns (q, R.T) and advances the
    a_b_grav / m_b biases.
    """
    dtype = s.a_b_grav.dtype
    gravity_vec = jnp.asarray([0.0, 0.0, -phys.gravity], dtype)
    magnet_vec = jnp.asarray(cfg.magnet_vec, dtype)

    if primary:
        k_acc, k_mag = jax.random.split(key)
        s, accel_body = accel_read(s, reads, k_acc, cfg, dt, primary=True)
        f_in = jnp.stack([jnp.zeros((), dtype), jnp.zeros((), dtype), reads.f_in_z])
        induced = f_in / phys.mass - s.r_est @ gravity_vec
        gravity_body = accel_body - induced
        gravity_body = gravity_body / jnp.linalg.norm(gravity_body)
        magnet_obs = magnet_vec + jax.random.normal(k_mag, (3,), dtype) * _std(cfg, cfg.magnet_std)
        magnet_body = reads.mat_rot.T @ magnet_obs
        magnet_body = magnet_body / jnp.linalg.norm(magnet_body)
        r = _triad_from_body(gravity_body, magnet_body, gravity_vec, magnet_vec)
        q = rot_mat_quat(r.T)
        return s.replace(r_est=r), q, r
    # opt variant
    k1, k2, k3, k4 = jax.random.split(key, 4)
    a_b_grav = s.a_b_grav + s.a_b_d * dt
    m_b = s.m_b + s.m_b_d * dt
    g_noise = jax.random.uniform(k1, (3,), dtype) * a_b_grav + jax.random.normal(
        k2, (3,), dtype
    ) * _std(cfg, cfg.accel_std)
    m_noise = jax.random.uniform(k3, (3,), dtype) * m_b + jax.random.normal(
        k4, (3,), dtype
    ) * _std(cfg, cfg.magnet_std)
    gravity_body = reads.mat_rot.T @ gravity_vec + g_noise
    magnet_body = reads.mat_rot.T @ magnet_vec + m_noise
    r = _triad_from_body(gravity_body, magnet_body, gravity_vec, magnet_vec)
    q = rot_mat_quat(r.T)
    return s.replace(a_b_grav=a_b_grav, m_b=m_b), q, r.T


def accel_int(
    s: SensorState,
    reads: QuadReads,
    key: jax.Array,
    cfg: SensorConfig,
    phys: PhysicsConfig,
    dt: float,
    primary: bool = False,
) -> tuple[SensorState, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Dead-reckoning INS update (reference quadrotor_env.py:700-715 primary,
    quadrotor_env_opt.py:598-608 opt): Euler-integrate the TRIAD-rotated
    accelerometer into velocity and position."""
    k_acc, k_triad = jax.random.split(key)
    s, accel_body = accel_read(s, reads, k_acc, cfg, dt, primary=primary)
    s, _q, r = triad_read(s, reads, k_triad, cfg, phys, dt, primary=primary)
    if primary:
        acceleration = r.T @ accel_body + jnp.asarray([0.0, 0.0, phys.gravity], accel_body.dtype)
    else:
        acceleration = r @ accel_body
    velocity = s.vel_ins + acceleration * dt
    position = s.pos_ins + velocity * dt
    s = s.replace(vel_ins=velocity, pos_ins=position)
    return s, acceleration, velocity, position


def gyro_int(
    s: SensorState, reads: QuadReads, key: jax.Array, cfg: SensorConfig, dt: float
) -> tuple[SensorState, jnp.ndarray]:
    """Gyro attitude integration (reference quadrotor_env.py:717-724).

    Returns the *unnormalized* post-step quaternion while carrying the
    normalized one — replicating the reference, whose return value aliases
    the pre-normalization array.
    """
    s, w = gyro_read(s, reads, key, cfg, dt)
    q = s.quat_ins
    v_q = deriv_quat(w, q)
    q_new = q + v_q * dt
    s = s.replace(quat_ins=q_new / jnp.linalg.norm(q_new))
    return s, q_new


def sensor_fused(
    s: SensorState,
    reads: QuadReads,
    key: jax.Array,
    cfg: SensorConfig,
    phys: PhysicsConfig,
    dt: float,
    primary: bool = False,
) -> tuple[SensorState, FusedOut]:
    """The landing worker's full fusion read `sensor_sp`
    (reference visual_landing/rl_worker.py:164-175), exact call order:
    accel_int, gyro_int, gyro, deriv_quat, gps, triad."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    s, _acc, velocity_accel, pos_accel = accel_int(s, reads, k1, cfg, phys, dt, primary)
    s, quaternion_gyro = gyro_int(s, reads, k2, cfg, dt)
    s, ang_vel = gyro_read(s, reads, k3, cfg, dt)
    quaternion_vel = deriv_quat(ang_vel, quaternion_gyro)
    pos_gps, vel_gps = gps_read(reads, k4, cfg)
    s, quaternion_triad, _r = triad_read(s, reads, k5, cfg, phys, dt, primary)
    pos_vel = jnp.stack(
        [
            pos_accel[0],
            velocity_accel[0],
            pos_accel[1],
            velocity_accel[1],
            pos_accel[2],
            velocity_accel[2],
        ]
    )
    states_sens = jnp.concatenate([pos_vel, quaternion_gyro, quaternion_vel])
    return s, FusedOut(
        states_sens=states_sens,
        pos_accel=pos_accel,
        velocity_accel=velocity_accel,
        quaternion_gyro=quaternion_gyro,
        ang_vel=ang_vel,
        pos_gps=pos_gps,
        vel_gps=vel_gps,
        quaternion_triad=quaternion_triad,
    )
