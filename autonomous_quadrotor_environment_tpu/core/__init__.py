from .quaternion import (
    deriv_quat,
    euler_quat,
    quat_euler,
    quat_mul,
    quat_normalize,
    quat_rot_mat,
    rot_mat_quat,
)
from .dynamics import (
    MotorOutput,
    StepAux,
    allocation_matrix,
    drone_eq,
    f2F,
    f2w,
    physics_step,
    rk4,
    rotor_gyro_speed,
)
from .randomization import DomainParams, sample_domain, wind_update, zeros_domain

__all__ = [
    "DomainParams",
    "MotorOutput",
    "StepAux",
    "allocation_matrix",
    "deriv_quat",
    "drone_eq",
    "euler_quat",
    "f2F",
    "f2w",
    "physics_step",
    "quat_euler",
    "quat_mul",
    "quat_normalize",
    "quat_rot_mat",
    "rk4",
    "rot_mat_quat",
    "rotor_gyro_speed",
    "sample_domain",
    "wind_update",
    "zeros_domain",
]
