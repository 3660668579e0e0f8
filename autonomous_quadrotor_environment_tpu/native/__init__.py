"""ctypes bindings for the native host-side preview renderer.

The shared library is built on demand with the in-tree Makefile (g++, no
external deps). `preview_available()` gates callers so the TPU training
path never depends on it — it exists for humans (manual flight, replays),
the role Panda3D played in the reference (SURVEY.md §2 native table).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libpreview.so")
_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _DIR, "libpreview.so"],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.render_preview.argtypes = [
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.render_trajectory.argtypes = [
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    _lib = lib
    return lib


def preview_available() -> bool:
    return _load() is not None


def render_preview(
    quad_state: np.ndarray,
    marker_xy=(0.0, 0.0),
    cam_offset=(3.0, 3.0, 2.0),
    width: int = 640,
    height: int = 480,
) -> np.ndarray:
    """One chase-cam frame, (H, W, 3) uint8."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libpreview.so unavailable (g++/make failed?)")
    state = np.ascontiguousarray(quad_state, np.float64)
    marker = np.ascontiguousarray(marker_xy, np.float64)
    off = np.ascontiguousarray(cam_offset, np.float64)
    img = np.zeros((height, width, 3), np.uint8)
    lib.render_preview(
        state.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        marker.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        off.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        width,
        height,
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return img


def render_trajectory(
    states: np.ndarray,
    marker_xy=(0.0, 0.0),
    cam_offset=(3.0, 3.0, 2.0),
    width: int = 640,
    height: int = 480,
) -> np.ndarray:
    """(T, 13) states -> (T, H, W, 3) uint8 frames, one ctypes crossing."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libpreview.so unavailable (g++/make failed?)")
    states = np.ascontiguousarray(states, np.float64)
    t = states.shape[0]
    marker = np.ascontiguousarray(marker_xy, np.float64)
    off = np.ascontiguousarray(cam_offset, np.float64)
    imgs = np.zeros((t, height, width, 3), np.uint8)
    lib.render_trajectory(
        states.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        t,
        marker.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        off.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        width,
        height,
        imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return imgs


def save_ppm(path: str, img: np.ndarray) -> None:
    """Dependency-free frame dump."""
    h, w, _ = img.shape
    with open(path, "wb") as f:
        f.write(f"P6 {w} {h} 255\n".encode())
        f.write(img.tobytes())
