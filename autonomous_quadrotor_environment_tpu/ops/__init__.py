"""Pallas TPU kernels for hot ops."""

from .render_kernel import render_nadir_batch_pallas

__all__ = ["render_nadir_batch_pallas"]
