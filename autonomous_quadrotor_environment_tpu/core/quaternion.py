"""Quaternion / Euler utilities, batched and JAX-traceable.

Functional counterparts of the reference's quaternion helpers
(reference: environment/quaternion_euler_utility.py:17-80), written for the
TPU: every function operates on the *last* axis so it composes with `vmap`
and broadcasting, uses no data-dependent control flow, and is dtype
polymorphic (float32 on TPU, float64 in x64 test mode).

Conventions (identical to the reference):
  * quaternion layout: ``[w, x, y, z]`` (scalar first)
  * Euler sequence: 3-2-1 (yaw-pitch-roll), angles ``[phi, theta, psi]``
  * ``quat_rot_mat`` maps body-frame vectors to the inertial frame
"""

from __future__ import annotations

import jax.numpy as jnp


def euler_quat(ang: jnp.ndarray) -> jnp.ndarray:
    """3-2-1 Euler angles ``[..., 3]`` -> unit quaternion ``[..., 4]``.

    Matches reference environment/quaternion_euler_utility.py:17-36.
    """
    half = ang * 0.5
    phi, theta, psi = half[..., 0], half[..., 1], half[..., 2]
    cp, sp = jnp.cos(phi), jnp.sin(phi)
    ct, st = jnp.cos(theta), jnp.sin(theta)
    cps, sps = jnp.cos(psi), jnp.sin(psi)
    q = jnp.stack(
        [
            cp * ct * cps + sp * st * sps,
            sp * ct * cps - cp * st * sps,
            cp * st * cps + sp * ct * sps,
            cp * ct * sps - sp * st * cps,
        ],
        axis=-1,
    )
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_euler(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion ``[..., 4]`` -> 3-2-1 Euler angles ``[..., 3]``.

    Matches reference environment/quaternion_euler_utility.py:39-48. The
    arcsin argument is clipped to [-1, 1] instead of printing a divergence
    warning (the reference's NaN guard at :46-47).
    """
    q0, q1, q2, q3 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    phi = jnp.arctan2(2 * (q0 * q1 + q2 * q3), 1 - 2 * (q1**2 + q2**2))
    theta = jnp.arcsin(jnp.clip(2 * (q0 * q2 - q3 * q1), -1.0, 1.0))
    psi = jnp.arctan2(2 * (q0 * q3 + q1 * q2), 1 - 2 * (q2**2 + q3**2))
    return jnp.stack([phi, theta, psi], axis=-1)


def deriv_quat(w: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion kinematics ``q_dot = 1/2 * Omega(w) @ q``.

    ``w``: body angular rates ``[..., 3]``; ``q``: quaternion ``[..., 4]``.
    Matches reference environment/quaternion_euler_utility.py:58-69, written
    component-wise (no 4x4 matmul — cheaper on the VPU and batchable).
    """
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    q0, q1, q2, q3 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return 0.5 * jnp.stack(
        [
            -wx * q1 - wy * q2 - wz * q3,
            wx * q0 + wz * q2 - wy * q3,
            wy * q0 - wz * q1 + wx * q3,
            wz * q0 + wy * q1 - wx * q2,
        ],
        axis=-1,
    )


def quat_rot_mat(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion ``[..., 4]`` -> body-to-inertial rotation matrix ``[..., 3, 3]``.

    Matches reference environment/quaternion_euler_utility.py:71-80.
    """
    a, b, c, d = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = a**2 + b**2 - c**2 - d**2
    r01 = 2 * (b * c - a * d)
    r02 = 2 * (b * d + a * c)
    r10 = 2 * (b * c + a * d)
    r11 = a**2 - b**2 + c**2 - d**2
    r12 = 2 * (c * d - a * b)
    r20 = 2 * (b * d - a * c)
    r21 = 2 * (c * d + a * b)
    r22 = a**2 - b**2 - c**2 + d**2
    row0 = jnp.stack([r00, r01, r02], axis=-1)
    row1 = jnp.stack([r10, r11, r12], axis=-1)
    row2 = jnp.stack([r20, r21, r22], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def quat_normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Normalize quaternion(s) along the last axis."""
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def rot_mat_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix ``[..., 3, 3]`` -> quaternion ``[w, x, y, z]``.

    Branch-free Shepperd-style extraction: computes all four candidate
    quaternions and selects the numerically best one with `where`, so it is
    traceable and vmappable (used by the TRIAD sensor, reference
    quadrotor_env.py:695-697, which goes through scipy Rotation).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each scaled by 4*q_i^2 >= 0.
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    # Pick the candidate whose pivot (diagonal term) is largest.
    pivots = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22],
        axis=-1,
    )
    best = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # [..., 4, 4]
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32), axis=-2)
    q = q[..., 0, :]
    q = quat_normalize(q)
    # Canonical sign: scalar part non-negative.
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quat_mul(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of two ``[w, x, y, z]`` quaternions (broadcasting)."""
    pw, px, py, pz = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            pw * qw - px * qx - py * qy - pz * qz,
            pw * qx + px * qw + py * qz - pz * qy,
            pw * qy - px * qz + py * qw + pz * qx,
            pw * qz + px * qy - py * qx + pz * qw,
        ],
        axis=-1,
    )
