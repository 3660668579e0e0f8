"""Parameter checkpointing.

Capability match for the reference's torch.save/load checkpoint discipline
(reference: ppo.py:399-400, 428-429 and ppo_trainer.py:202-204, where the
saved .pth doubles as the cross-process parameter broadcast). On TPU the
broadcast is the replicated sharding (parallel/dp.py); files remain for
crash-resume and fixtures. Format: flax msgpack (framework-native, no
pickle).
"""

from __future__ import annotations

import os

import jax
from flax import serialization


def save_params(path: str, params) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    params = jax.device_get(params)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))


def load_params(path: str, template):
    """Load into the structure of ``template`` (shape/dtype validated)."""
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())
