"""Flight replay viewer: render a trajectory through the native preview.

Capability match for the reference's interactive inspection rig
(reference: models/camera_control.py:3-127 — orbit/chase cameras with
WASD/QE movement and hotkeys — and the plotter's 3D view): renders a saved
trajectory (T, 13) .npy log to an image sequence with a chase camera or an
orbiting camera, via the C++ preview renderer. Headless-friendly (frames to
PPM/PNG); a display is not required.

Example:
    python -m autonomous_quadrotor_environment_tpu.apps.replay \
        --log runs/flight.npy --mode orbit --out runs/frames
"""

from __future__ import annotations

import argparse
import math
import os

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--log", type=str, required=True, help="(T, 13) state .npy")
    p.add_argument("--marker", type=float, nargs=2, default=(0.0, 0.0))
    p.add_argument("--mode", choices=("chase", "orbit"), default="chase")
    p.add_argument("--orbit-radius", type=float, default=4.0)
    p.add_argument("--orbit-period", type=float, default=8.0, help="seconds/rev")
    p.add_argument("--chase-offset", type=float, nargs=3, default=(3.0, 3.0, 2.0))
    p.add_argument("--every", type=int, default=10, help="render every Nth state")
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--dt", type=float, default=0.01)
    p.add_argument("--out", type=str, default="runs/replay")
    return p


def main(argv=None) -> dict:
    args = build_parser().parse_args(argv)
    from ..native import preview_available, render_preview, save_ppm

    if not preview_available():
        raise SystemExit("native preview renderer unavailable (needs g++/make)")

    states = np.load(args.log)
    os.makedirs(args.out, exist_ok=True)
    frames = []
    for n, t in enumerate(range(0, len(states), args.every)):
        if args.mode == "orbit":
            a = 2 * math.pi * (t * args.dt) / args.orbit_period
            offset = (
                args.orbit_radius * math.cos(a),
                args.orbit_radius * math.sin(a),
                2.0,
            )
        else:
            offset = tuple(args.chase_offset)
        img = render_preview(
            states[t], tuple(args.marker), offset, args.width, args.height
        )
        path = f"{args.out}/frame_{n:05d}.ppm"
        save_ppm(path, img)
        frames.append(path)
    print(f"{len(frames)} frames -> {args.out}")
    return {"frames": frames}


if __name__ == "__main__":
    main()
