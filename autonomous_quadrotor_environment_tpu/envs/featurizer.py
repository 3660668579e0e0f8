"""Rolling state/action history featurizer for the neural controllers.

Functional re-design of the reference's `dl_in_gen`
(reference: environment/controller/dl_auxiliary.py:15-32): a fixed
``(T*15,)`` ring buffer carried inside the environment state instead of a
stateful Python object, so the whole featurization lives on-device inside
the scanned rollout.

Per-step feature layout (hist_size = (13-3) + 4 + 1 = 15):
    [action(4), vel(3), quat(4), quat_dot(4)]
built from the 14-dim quat_state ``[x,vx,y,vy,z,vz,q0..q3,dq0..dq3]`` by
dropping position (targets are injected by subtracting a reference state
from the observation, exactly like the reference's mission offsets).
"""

from __future__ import annotations

import jax.numpy as jnp

HIST_FEATS = 15


def feat_size(t: int) -> int:
    """Network input width for a T-step window (75 for T=5)."""
    return HIST_FEATS * t


def init_hist(t: int, dtype=jnp.float32) -> jnp.ndarray:
    """Zeroed history buffer (reference dl_auxiliary.py:22-23)."""
    return jnp.zeros(feat_size(t), dtype)


def push_hist(hist: jnp.ndarray, quat_state: jnp.ndarray, action: jnp.ndarray) -> jnp.ndarray:
    """Shift the window left by one step and append the newest features
    (reference dl_auxiliary.py:25-32: roll(-15) then overwrite the tail).

    ``quat_state``: (14,) — [pos/vel interleaved(6), quat(4), quat_dot(4)].
    ``action``: (4,).
    """
    feat = jnp.concatenate([action, quat_state[1:6:2], quat_state[6:14]])
    hist = jnp.roll(hist, -HIST_FEATS)
    return hist.at[-HIST_FEATS:].set(feat)
