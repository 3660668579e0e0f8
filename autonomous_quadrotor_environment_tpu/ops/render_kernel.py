"""Fused batched nadir-camera render as a Pallas TPU kernel.

The jnp renderer (render/scene.py) materializes several (B, H, W, 3)
intermediates (rays, plane hits, checker/ground/marker layers) in HBM; this
kernel computes the final image directly from two scalars per env
(camera position, marker position) — output-only HBM traffic, pure VPU
elementwise math in VMEM. Grid = one program per env; every program writes
one (H, W, 3) image.

Mathematically identical to `render/scene.py:render_nadir` for the nadir
camera (plane z=0, optical axis -z, +u=+x, +v=-y) — tested elementwise
against it in interpret mode; compiled on TPU the VPU's fast transcendental
approximations introduce up to ~0.07 absolute pixel error in the procedural
ground shading (sin/cos-heavy), visually indistinguishable.

MEASURED (TPU v5e, B=256): pallas 5.4 ms vs fused-XLA jnp 0.9 ms — XLA's
fusion of the elementwise pipeline plus its (8,128)-friendly layout beats
this kernel's (84, 3)-blocked per-env grid, so `render/scene.py` remains
the production path; this kernel stays as the Pallas reference
implementation and a starting point for a layout-optimized rewrite
(planar HW-padded output, multi-env programs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import CameraConfig, MarkerConfig
from ..render.scene import BORDER_RGB, DARK, GROUND_RGB, LIGHT


def _render_kernel(
    pos_ref,      # (B, 4) [cam_x, cam_y, height, brightness] scalar-prefetch (SMEM)
    marker_ref,   # (B, 2) marker xy scalar-prefetch (SMEM)
    out_ref,      # (1, H, W, 3) VMEM block for this program's env
    *,
    cam: CameraConfig,
    marker: MarkerConfig,
):
    h, w = cam.height, cam.width
    dtype = out_ref.dtype
    cx = (w - 1) / 2.0
    cy = (h - 1) / 2.0

    i = pl.program_id(0)
    cam_x = pos_ref[i, 0]
    cam_y = pos_ref[i, 1]
    height = jnp.maximum(pos_ref[i, 2], 1e-3)
    brightness = pos_ref[i, 3]
    mx = marker_ref[i, 0]
    my = marker_ref[i, 1]

    # tpu.iota only yields integers — cast after (Mosaic verification rule).
    uu = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(jnp.float32)
    vv = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(jnp.float32)

    # Nadir ray-plane intersection (render_pinhole with R = nadir_rotation):
    # dirs_w = ((u-cx)/fx, -(v-cy)/fy, -1); t = height; hit = cam + t*dirs.
    x_w = cam_x + (uu - cx) / cam.fx * height
    y_w = cam_y - (vv - cy) / cam.fy * height
    footprint = height / cam.fx

    s = marker.square
    nx, ny = marker.cols + 1, marker.rows + 1
    half_w = nx * s / 2.0
    half_h = ny * s / 2.0
    border = s

    rel_x = x_w - mx
    rel_y = y_w - my

    def square_wave(x):
        t = x / s
        cell = jnp.floor(t)
        parity = jnp.mod(cell, 2.0)
        frac = t - cell
        dist = jnp.minimum(frac, 1.0 - frac) * s
        wgt = jnp.clip(0.5 + (dist / jnp.maximum(footprint, 1e-6)) * 0.5, 0.0, 1.0)
        return parity * wgt + (1.0 - parity) * (1.0 - wgt)

    px = square_wave(rel_x + half_w)
    py = square_wave(rel_y + half_h)
    checker = px * (1.0 - py) + py * (1.0 - px)
    val = DARK + (LIGHT - DARK) * checker

    soft = jnp.maximum(footprint, 1e-6)
    on_board = jnp.clip((half_w - jnp.abs(rel_x)) / soft + 0.5, 0.0, 1.0) * jnp.clip(
        (half_h - jnp.abs(rel_y)) / soft + 0.5, 0.0, 1.0
    )
    coverage = jnp.clip((half_w + border - jnp.abs(rel_x)) / soft + 0.5, 0.0, 1.0) * jnp.clip(
        (half_h + border - jnp.abs(rel_y)) / soft + 0.5, 0.0, 1.0
    )

    wave = (
        0.06 * jnp.sin(x_w * 1.7) * jnp.cos(y_w * 1.3)
        + 0.04 * jnp.sin(x_w * 5.1 + y_w * 3.7)
    )

    for c in range(3):
        board_c = val * on_board + BORDER_RGB[c] * (1.0 - on_board)
        ground_c = jnp.clip(GROUND_RGB[c] + wave, 0.0, 1.0)
        rgb_c = board_c * coverage + ground_c * (1.0 - coverage)
        out_ref[0, :, :, c] = jnp.clip(rgb_c * brightness, 0.0, 1.0).astype(dtype)


@functools.partial(jax.jit, static_argnames=("cam", "marker", "interpret"))
def render_nadir_batch_pallas(
    quad_pos_env: jnp.ndarray,  # (B, 3) env-frame quad positions
    marker_xy: jnp.ndarray,     # (B, 2)
    cam: CameraConfig = CameraConfig(),
    marker: MarkerConfig = MarkerConfig(),
    ground_z_env: float = -5.0,
    brightness: jnp.ndarray | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """(B, H, W, 3) images. `interpret` defaults to True off-TPU."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    b = quad_pos_env.shape[0]
    if brightness is None:
        brightness = jnp.ones((b,), jnp.float32)
    height = quad_pos_env[:, 2] - ground_z_env
    pos = jnp.stack(
        [quad_pos_env[:, 0], quad_pos_env[:, 1], height, brightness], axis=-1
    ).astype(jnp.float32)

    kernel = functools.partial(_render_kernel, cam=cam, marker=marker)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[],
        out_specs=pl.BlockSpec(
            (1, cam.height, cam.width, 3),
            lambda i, *_prefetch: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, cam.height, cam.width, 3), jnp.float32),
        interpret=interpret,
    )(pos, marker_xy.astype(jnp.float32))
