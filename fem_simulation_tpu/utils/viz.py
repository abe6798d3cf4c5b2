"""Headless visualization: surface rendering to PNG/GIF, convergence plots.

Replaces the reference's OpenGL/GLFW interactive viewer + CUDA-GL interop
(/root/reference/render/window.py, object.py:82-113) with host-side matplotlib
rendering — on TPU there is no GL interop; frames are exported offline. The
convergence plots mirror `Object.show` / `compare` (object.py:1866-1901,
:1601-1628).
"""
from __future__ import annotations

import numpy as np


def _tri_shade(x, tris, light=(0.4, 0.8, 0.45)):
    """Flat shading: two-tone diffuse like the reference phong.frag."""
    v0, v1, v2 = x[tris[:, 0]], x[tris[:, 1]], x[tris[:, 2]]
    n = np.cross(v1 - v0, v2 - v0)
    nn = n / (np.linalg.norm(n, axis=1, keepdims=True) + 1e-12)
    light = np.asarray(light) / np.linalg.norm(light)
    lam = np.abs(nn @ light)
    return 0.25 + 0.7 * lam


def render_surface(x_mesh_order: np.ndarray, tris: np.ndarray, path: str,
                   elev: float = 15.0, azim: float = -60.0, title: str = ""):
    """Render the surface mesh to a PNG file."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from mpl_toolkits.mplot3d.art3d import Poly3DCollection

    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(projection="3d")
    polys = x_mesh_order[tris]
    shade = _tri_shade(x_mesh_order, tris)
    colors = np.outer(shade, np.array([0.55, 0.65, 0.9]))
    pc = Poly3DCollection(polys, facecolors=np.clip(colors, 0, 1),
                          edgecolor="none")
    ax.add_collection3d(pc)
    lo, hi = x_mesh_order.min(0), x_mesh_order.max(0)
    c = (lo + hi) / 2
    r = (hi - lo).max() / 2 * 1.1
    ax.set_xlim(c[0] - r, c[0] + r)
    ax.set_ylim(c[1] - r, c[1] + r)
    ax.set_zlim(c[2] - r, c[2] + r)
    ax.view_init(elev=elev, azim=azim)
    ax.set_title(title)
    ax.axis("off")
    fig.savefig(path, dpi=110, bbox_inches="tight")
    plt.close(fig)


def render_gif(frames_mesh_order, tris, path: str, fps: int = 15):
    """Render a list of vertex arrays to an animated GIF (replaces the
    reference result/dynamic.gif workflow)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.animation import FuncAnimation, PillowWriter
    from mpl_toolkits.mplot3d.art3d import Poly3DCollection

    frames = [np.asarray(f) for f in frames_mesh_order]
    fig = plt.figure(figsize=(5, 5))
    ax = fig.add_subplot(projection="3d")
    allx = np.concatenate(frames)
    lo, hi = allx.min(0), allx.max(0)
    c = (lo + hi) / 2
    r = (hi - lo).max() / 2 * 1.1

    def draw(i):
        ax.clear()
        x = frames[i]
        shade = _tri_shade(x, tris)
        colors = np.outer(shade, np.array([0.55, 0.65, 0.9]))
        ax.add_collection3d(Poly3DCollection(x[tris],
                                             facecolors=np.clip(colors, 0, 1)))
        ax.set_xlim(c[0] - r, c[0] + r)
        ax.set_ylim(c[1] - r, c[1] + r)
        ax.set_zlim(c[2] - r, c[2] + r)
        ax.axis("off")

    anim = FuncAnimation(fig, draw, frames=len(frames))
    anim.save(path, writer=PillowWriter(fps=fps))
    plt.close(fig)


def plot_convergence(series: dict, path: str, ylog: bool = True,
                     xlabel: str = "iteration", title: str = ""):
    """Overlay ||f||_inf (or energy) series — the `compare` harness plot
    (reference object.py:1601-1628)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 4))
    for name, ys in series.items():
        ax.plot(np.arange(1, len(ys) + 1), ys, label=name)
    if ylog:
        ax.set_yscale("log")
    ax.set_xlabel(xlabel)
    ax.legend()
    ax.set_title(title)
    ax.grid(True, alpha=0.3)
    fig.savefig(path, dpi=110, bbox_inches="tight")
    plt.close(fig)


def render_level(scene, level: int, path: str, x=None, title=None):
    """Render one multigrid level's hex mesh surface (reference show_layer,
    object.py:1854-1864)."""
    from .. import mesh as meshlib
    lvl = scene.level(level)
    tris = meshlib.surface_triangles(np.asarray(lvl.hexes))
    if x is None:
        xs = np.asarray(lvl.x0)
    else:
        xs = np.asarray(x)
    render_surface(xs, tris, path,
                   title=title or f"level {level}: {lvl.n_hexes} hexes")


def show(scene, sim, energy, f_inf, out_prefix: str):
    """Energy/inf-norm series + deformed mesh (reference `show`,
    object.py:1866-1901). Writes {prefix}_conv.png and {prefix}_mesh.png."""
    from .. import mesh as meshlib
    plot_convergence({"energy": np.asarray(energy)},
                     out_prefix + "_energy.png", ylog=False)
    plot_convergence({"||f||_inf": np.asarray(f_inf)},
                     out_prefix + "_conv.png")
    tris = meshlib.surface_triangles(scene.mesh.hexes)
    render_surface(scene.to_mesh_order(sim.x), tris, out_prefix + "_mesh.png")
