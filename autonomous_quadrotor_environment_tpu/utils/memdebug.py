"""Device-memory introspection.

Capability match for the reference's GPU-leak helper
(reference: visual_landing/memory_leak.py:4-13 — counts live torch tensors
via gc): on TPU the equivalent signals are the per-device allocator stats
and the set of live arrays the runtime tracks.
"""

from __future__ import annotations

import jax


def device_memory_stats(device=None) -> dict:
    """Allocator stats for one device (bytes in use, peak, limit) — empty
    dict if the backend doesn't expose them (CPU)."""
    device = device or jax.devices()[0]
    stats = device.memory_stats()
    return dict(stats) if stats else {}


def live_array_summary() -> dict:
    """Count and total size of live device arrays (the torch-tensor census
    of the reference, memory_leak.py:8-13)."""
    arrays = jax.live_arrays()
    total = sum(a.size * a.dtype.itemsize for a in arrays)
    return {"count": len(arrays), "bytes": int(total)}
