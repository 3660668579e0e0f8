"""Chessboard corner detection as batched JAX image ops.

Replaces the reference's FAST prefilter + `cv.findChessboardCorners`
(reference: computer_vision/quadrotor_cv.py:64-68, detector_setup.py:4-15)
with a ChESS-style saddle response: an inner chessboard corner is an
X-crossing where the two diagonal quadrant pairs agree with each other and
disagree across pairs. The response is four shifted box sums — pure
elementwise/VPU work that `vmap`s over the env batch (no data-dependent
shapes: we return a fixed (rows*cols, 2) corner array plus a validity flag,
the XLA-friendly analogue of OpenCV's ret/None).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _box_sum(img: jnp.ndarray, r: int) -> jnp.ndarray:
    """(2r+1)^2 box filter via separable cumulative sums, 'same' padding."""
    pad = jnp.pad(img, ((r + 1, r), (r + 1, r)))
    c = jnp.cumsum(pad, axis=0)
    rows = c[2 * r + 1 :, :] - c[: -(2 * r + 1), :]
    c = jnp.cumsum(rows, axis=1)
    return c[:, 2 * r + 1 :] - c[:, : -(2 * r + 1)]


def corner_response(gray: jnp.ndarray, radius: int = 2) -> jnp.ndarray:
    """Saddle (X-crossing) response map, same shape as ``gray``.

    For each pixel, mean intensities of the four diagonal quadrants A..D
    (A=up-left, B=up-right, C=down-right, D=down-left):
        response = |A + C - B - D| - |A - C| - |B - D|
    X-crossings score high; edges and L-corners are suppressed by the
    consistency terms. Multi-scale: max over radii {radius, radius+2} to
    cover the altitude-dependent square size.
    """
    out = None
    for r in (radius, radius + 2):
        s = _box_sum(gray, r) / float((2 * r + 1) ** 2)
        d = r + 1
        a = jnp.roll(s, (d, d), (0, 1))      # quadrant centered up-left
        b = jnp.roll(s, (d, -d), (0, 1))
        c = jnp.roll(s, (-d, -d), (0, 1))
        e = jnp.roll(s, (-d, d), (0, 1))
        resp = jnp.abs(a + c - b - e) - jnp.abs(a - c) - jnp.abs(b - e)
        out = resp if out is None else jnp.maximum(out, resp)
    # kill the wrap-around borders introduced by roll
    h, w = gray.shape
    rmax = radius + 3
    mask = jnp.zeros_like(out).at[rmax : h - rmax, rmax : w - rmax].set(1.0)
    return jnp.maximum(out, 0.0) * mask


def _nms(resp: jnp.ndarray, radius: int = 2) -> jnp.ndarray:
    """Non-maximum suppression: keep pixels that are the max of their
    (2r+1)^2 neighborhood."""
    m = resp
    for axis in (0, 1):
        for shift in range(1, radius + 1):
            m = jnp.maximum(m, jnp.roll(resp, shift, axis))
            m = jnp.maximum(m, jnp.roll(resp, -shift, axis))
    # diagonal neighbors
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            if dy == 0 or dx == 0:
                continue
            m = jnp.maximum(m, jnp.roll(resp, (dy, dx), (0, 1)))
    return jnp.where(resp >= m, resp, 0.0)


def count_corners(gray: jnp.ndarray, threshold: float = 0.05) -> jnp.ndarray:
    """Number of NMS corner peaks above threshold — the analogue of the
    reference's FAST-prefilter gate `len(corner_good) > 50`
    (quadrotor_cv.py:64-66)."""
    peaks = _nms(corner_response(gray))
    return jnp.sum(peaks > threshold)


def _subpixel_refine(resp: jnp.ndarray, yx: jnp.ndarray) -> jnp.ndarray:
    """Quadratic 1-D fits along y and x around integer peaks -> float (y, x)."""
    y = yx[..., 0]
    x = yx[..., 1]
    h, w = resp.shape
    yc = jnp.clip(y, 1, h - 2)
    xc = jnp.clip(x, 1, w - 2)
    c = resp[yc, xc]
    dy = (resp[yc + 1, xc] - resp[yc - 1, xc]) / 2.0
    dyy = resp[yc + 1, xc] - 2 * c + resp[yc - 1, xc]
    dx = (resp[yc, xc + 1] - resp[yc, xc - 1]) / 2.0
    dxx = resp[yc, xc + 1] - 2 * c + resp[yc, xc - 1]
    off_y = jnp.where(jnp.abs(dyy) > 1e-9, -dy / dyy, 0.0)
    off_x = jnp.where(jnp.abs(dxx) > 1e-9, -dx / dxx, 0.0)
    off_y = jnp.clip(off_y, -0.5, 0.5)
    off_x = jnp.clip(off_x, -0.5, 0.5)
    return jnp.stack([yc + off_y, xc + off_x], axis=-1)


def chessboard_corners_nadir(
    gray: jnp.ndarray, cols: int = 9, rows: int = 6, threshold: float = 0.02
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Detect and ORDER the rows*cols inner corners for the nadir camera.

    The landing camera never rotates (reference rl_worker.py:128), so the
    board appears axis-aligned: sort all peaks into `rows` bands by v
    (descending, so the first row is the board's smallest world-y row under
    the nadir convention v = -world y), then each band by u ascending —
    matching `board_object_points` row-major order. Returns
    (corners (rows*cols, 2) as (u, v), ok flag). ``ok`` is False when the
    (rows*cols)-th strongest peak is below threshold (board not found).
    """
    n = rows * cols
    resp = corner_response(gray)
    peaks = _nms(resp)
    flat = peaks.reshape(-1)
    vals, idx = jax.lax.top_k(flat, n)
    ok = vals[-1] > threshold
    w = gray.shape[1]
    yx = jnp.stack([idx // w, idx % w], axis=-1)
    yx = _subpixel_refine(resp, yx)

    # order: rows by v descending, then within each row by u ascending
    order_v = jnp.argsort(-yx[:, 0])
    yx = yx[order_v]
    yx = yx.reshape(rows, cols, 2)
    order_u = jnp.argsort(yx[..., 1], axis=1)
    yx = jnp.take_along_axis(yx, order_u[..., None], axis=1)
    uv = jnp.stack([yx[..., 1], yx[..., 0]], axis=-1).reshape(n, 2)
    return uv, ok
