"""Pallas TPU kernels for hot ops."""

from .ppo_fused import fused_ppo_grad, pack_aux
from .render_kernel import render_nadir_batch_pallas

__all__ = ["fused_ppo_grad", "pack_aux", "render_nadir_batch_pallas"]
