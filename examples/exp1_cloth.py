"""exp1 cloth: mass-spring cloth simulation.

Equivalent of /root/reference/exp1/cloth_simulation/main.py.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np

from fem_simulation_tpu.config import ClothConfig
from fem_simulation_tpu.sim.cloth import ClothSim


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--gif", default="/tmp/cloth.gif")
    args = ap.parse_args()

    cfg = ClothConfig(res_x=args.res, res_y=args.res)
    sim = ClothSim(cfg, pins=[0, args.res])   # pin two corners
    frames = []
    for i in range(args.frames):
        st = sim.frame()
        if i % 4 == 0:
            frames.append(np.asarray(st.x).copy())
    print("cloth:", st.x.shape, "final y-range",
          float(st.x[:, 1].min()), float(st.x[:, 1].max()))

    # triangles of the grid for rendering
    rx = args.res
    tris = []
    for i in range(rx):
        for j in range(rx):
            a, b = i * (rx + 1) + j, i * (rx + 1) + j + 1
            c, d = (i + 1) * (rx + 1) + j, (i + 1) * (rx + 1) + j + 1
            tris += [[a, b, c], [b, d, c]]
    from fem_simulation_tpu.utils.viz import render_gif
    render_gif(frames, np.asarray(tris, np.int32), args.gif)
    print(f"wrote {args.gif}")


if __name__ == "__main__":
    main()
