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


def save_params(path: str, params, half: bool = False) -> None:
    """``half=True`` stores float leaves as float16 — used for shipped
    fixtures (halves the repo artifact size; eval-equivalent, validated in
    tests/test_apps.py)."""
    import numpy as np

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    params = jax.device_get(params)
    if half:
        params = jax.tree.map(
            lambda x: x.astype(np.float16)
            if hasattr(x, "dtype") and x.dtype == np.float32
            else x,
            params,
        )
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))


def load_params(path: str, template):
    """Load into the structure of ``template``; float16-stored leaves are
    cast back up to the template's dtype."""
    import numpy as np

    with open(path, "rb") as f:
        data = f.read()
    half_tmpl = jax.tree.map(
        lambda x: jax.numpy.asarray(x, np.float16)
        if hasattr(x, "dtype") and x.dtype == np.float32
        else x,
        template,
    )
    try:
        loaded = serialization.from_bytes(template, data)
    except (ValueError, TypeError):
        loaded = serialization.from_bytes(half_tmpl, data)
    return jax.tree.map(
        lambda x, t: jax.numpy.asarray(x, t.dtype)
        if hasattr(t, "dtype") and hasattr(x, "dtype") and x.dtype != t.dtype
        else x,
        loaded,
        template,
    )
