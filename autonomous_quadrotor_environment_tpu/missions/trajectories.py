"""Reference trajectory generation for mission tracking.

Capability match for the reference's `mission` class
(reference: mission_control/mission_control.py:3-83), as precomputed
position/velocity tables indexed on-device:

  * the per-step Python loops building trajectory/velocity become vectorized
    closed forms (identical tables);
  * the stateful `get_error` cursor (reference :68-83) becomes
    ``mission_target(traj, i)`` — a pure lookup usable inside `scan`, with
    the reference's past-the-end semantics preserved: after the table is
    exhausted the target keeps drifting by ``velocity[-1] * dt`` per step
    (the reference mutates ``trajectory[-1]`` in place each call :70-71).

The 14-dim target layout matches the reference: [x, vx, y, vy, z, vz, 0*8].
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class Trajectory(NamedTuple):
    positions: jnp.ndarray  # (N, 3)
    velocities: jnp.ndarray  # (N, 3)
    dt: float


def gen_trajectory(
    total_timesteps: int,
    steps: int,
    position: np.ndarray,
    velocity: np.ndarray | None = None,
    additive: np.ndarray | None = None,
    dt: float = 0.01,
) -> Trajectory:
    """Point-to-point linear ramp then hold (reference :7-31).

    With `velocity` given, ramps velocity linearly and integrates position
    instead (reference :26-31).
    """
    init = np.zeros(14) if additive is None else np.asarray(additive, np.float64)
    traj = np.zeros((total_timesteps, 3))
    vel = np.zeros((total_timesteps, 3))
    if velocity is None:
        for i in range(3):
            traj[:steps, i] = np.linspace(init[i], position[i] + init[i], steps)
            traj[steps:, i] = position[i]
        if steps > 1:
            vel[1:steps] = np.diff(traj[:steps], axis=0) / dt
    else:
        for i in range(3):
            vel[:, i] = np.linspace(0.0, velocity[i], steps)
        traj[1:steps] = np.cumsum(vel[: steps - 1] * dt, axis=0)
        traj[steps:] = traj[steps - 1]
    return Trajectory(jnp.asarray(traj, jnp.float32), jnp.asarray(vel, jnp.float32), dt)


def sin_trajectory(
    steps: int,
    circular_rate: float,
    ascent_rate: float,
    center: np.ndarray,
    axis: np.ndarray,
    dt: float = 0.01,
) -> Trajectory:
    """Sinusoidal sweep along `axis` with constant ascent (reference :33-45).

    The reference's z is built recursively as ``z[k] = z[k-1] + ascent*dt``
    where the k=0 read aliases the still-zero last row, so
    ``z[k] = (k+1)*ascent*dt`` — center_z is overwritten (replicated).
    """
    t = np.arange(steps) * dt
    center = np.asarray(center, np.float64)
    axis = np.asarray(axis, np.float64)
    traj = center[None, :] + np.sin(t * circular_rate)[:, None] * axis[None, :]
    traj[:, 2] = np.arange(1, steps + 1) * ascent_rate * dt
    vel = np.zeros((steps, 3))
    vel[1:] = np.diff(traj, axis=0) / dt
    return Trajectory(jnp.asarray(traj, jnp.float32), jnp.asarray(vel, jnp.float32), dt)


def spiral_trajectory(
    zsteps: int,
    steps: int,
    rate: float,
    circular_rate: float,
    radius: float,
    center: np.ndarray,
    dt: float = 0.01,
) -> Trajectory:
    """Helical spiral: circle in xy, linear climb capped at `zsteps`
    (reference :48-64). Starts at `center` (the -[radius,0,0] offset)."""
    step = np.arange(steps)
    a = step * circular_rate * dt
    center = np.asarray(center, np.float64)
    x = np.cos(a) * radius - radius
    y = np.sin(a) * radius
    z = np.minimum(step, zsteps) * rate * dt
    traj = center[None, :] + np.stack([x, y, z], axis=1)
    vel = np.zeros((steps, 3))
    vel[1:] = np.diff(traj, axis=0) / dt
    return Trajectory(jnp.asarray(traj, jnp.float32), jnp.asarray(vel, jnp.float32), dt)


def mission_target(traj: Trajectory, i: jnp.ndarray) -> jnp.ndarray:
    """14-dim target state at step ``i`` (reference get_error :68-83),
    including the past-the-end drift by ``velocity[-1]*dt`` per extra call.
    Pure function of ``i`` — `scan`- and `vmap`-safe."""
    n = traj.positions.shape[0]
    idx = jnp.minimum(i, n - 1)
    overshoot = jnp.maximum(i - (n - 1), 0).astype(traj.positions.dtype)
    pos = traj.positions[idx] + traj.velocities[n - 1] * traj.dt * overshoot
    vel = traj.velocities[idx]
    pv = jnp.stack([pos[0], vel[0], pos[1], vel[1], pos[2], vel[2]])
    return jnp.concatenate([pv, jnp.zeros(8, pv.dtype)])
