"""Quaternion math vs scipy.spatial.transform.Rotation ground truth."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from autonomous_quadrotor_environment_tpu.core import (
    deriv_quat,
    euler_quat,
    quat_euler,
    quat_normalize,
    quat_rot_mat,
    rot_mat_quat,
)

RNG = np.random.default_rng(0)


def random_euler(n):
    # keep pitch away from +-pi/2 singularities
    ang = RNG.uniform(-1.2, 1.2, size=(n, 3))
    return ang.astype(np.float32)


def to_scipy(q):
    """[w,x,y,z] -> scipy's [x,y,z,w]."""
    return np.concatenate([q[..., 1:], q[..., :1]], axis=-1)


def test_euler_quat_matches_scipy():
    ang = random_euler(64)
    q = np.asarray(euler_quat(ang))
    # 3-2-1 (zyx intrinsic) with angles [phi(roll), theta(pitch), psi(yaw)]
    r = Rotation.from_euler("ZYX", ang[:, ::-1])
    q_ref = r.as_quat()  # [x,y,z,w]
    q_ref = np.concatenate([q_ref[:, 3:], q_ref[:, :3]], axis=-1)
    # sign-align
    sign = np.sign(np.sum(q * q_ref, axis=-1, keepdims=True))
    np.testing.assert_allclose(q * sign, q_ref, atol=1e-6)


def test_quat_euler_roundtrip():
    ang = random_euler(64)
    back = np.asarray(quat_euler(euler_quat(ang)))
    np.testing.assert_allclose(back, ang, atol=1e-5)


def test_quat_rot_mat_matches_scipy():
    ang = random_euler(32)
    q = np.asarray(euler_quat(ang))
    R = np.asarray(quat_rot_mat(q))
    R_ref = Rotation.from_quat(to_scipy(q)).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_rot_mat_quat_roundtrip():
    ang = random_euler(128)
    q = np.asarray(quat_normalize(euler_quat(ang)))
    q2 = np.asarray(rot_mat_quat(quat_rot_mat(q)))
    sign = np.sign(np.sum(q * q2, axis=-1, keepdims=True))
    np.testing.assert_allclose(q2 * sign, q, atol=1e-5)


def test_deriv_quat_preserves_norm():
    """d/dt |q|^2 = 2 q . qdot = 0 for the kinematic equation."""
    ang = random_euler(32)
    q = np.asarray(euler_quat(ang))
    w = RNG.normal(0, 3, size=(32, 3)).astype(np.float32)
    dq = np.asarray(deriv_quat(w, q))
    np.testing.assert_allclose(np.sum(q * dq, axis=-1), 0.0, atol=1e-5)


def test_deriv_quat_matches_finite_difference():
    """Integrating qdot for a small dt matches scipy's rotvec composition."""
    q0 = np.array([1.0, 0, 0, 0], np.float64)
    w = np.array([0.3, -0.2, 0.5])
    dt = 1e-5
    q1 = q0 + np.asarray(deriv_quat(w, q0)) * dt
    q1 /= np.linalg.norm(q1)
    r_ref = Rotation.from_rotvec(w * dt)  # body rates, world-frame here equal at identity
    q_ref = r_ref.as_quat()
    q_ref = np.concatenate([q_ref[3:], q_ref[:3]])
    np.testing.assert_allclose(q1, q_ref, atol=1e-9)


@pytest.mark.parametrize("axis", range(3))
def test_rotation_direction(axis):
    """Positive Euler angle about each axis rotates body->inertial correctly."""
    ang = np.zeros(3, np.float32)
    ang[axis] = 0.5
    R = np.asarray(quat_rot_mat(euler_quat(ang)))
    order = "ZYX"
    R_ref = Rotation.from_euler(order, ang[::-1]).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-6)
