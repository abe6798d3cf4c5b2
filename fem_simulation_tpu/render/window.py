"""Simulation driver loop: headless window + frame capture.

TPU replacement for the reference's GLFW/OpenGL window + CUDA-GL interop
(/root/reference/exp1/quasi_simulation/render/window.py:14-120, object.py:
82-113): there is no GL surface in a TPU pod, so `HeadlessWindow` drives the
same `loop(render_fn)` / `setSelect(select, move, clear)` contract but
captures frames to PNG/GIF via utils.viz instead of swapping GL buffers.
Interaction (pause, drag) is scriptable through `inject_*` methods, mirroring
the key/mouse callbacks (Space toggles pause, window.py:66-70).
"""
from __future__ import annotations

import numpy as np

from .camera import Camera


class HeadlessWindow:
    """Drives render_fn(pause) per frame; optionally captures frames.

    render_fn is called with the pause flag, exactly like the reference loop
    (window.py:54-64); the sim reads/writes its own state. Register a
    frame_source() -> (x_mesh_order, tris) to enable capture.
    """

    def __init__(self, width: int = 1920, height: int = 1080,
                 title: str = "fem_simulation_tpu"):
        self.width = width
        self.height = height
        self.title = title
        self.camera = Camera(aspect=width / height)
        self.paused = False
        self.frames = []
        self._frame_source = None
        self._select_cbs = None
        self._should_close = False

    # -- reference API ------------------------------------------------------
    def set_frame_source(self, fn):
        self._frame_source = fn

    def setSelect(self, select, move, clear):
        """Reference window.py:49-52: register picking callbacks."""
        self._select_cbs = (select, move, clear)

    def loop(self, render_fn, max_frames: int = 120, capture_every: int = 0):
        for i in range(max_frames):
            if self._should_close:
                break
            render_fn(self.paused)
            if capture_every and self._frame_source and i % capture_every == 0:
                x, tris = self._frame_source()
                self.frames.append(np.asarray(x).copy())
                self._tris = tris

    # -- scripted interaction (keyboard/mouse equivalents) -------------------
    def inject_pause_toggle(self):
        self.paused = not self.paused      # Space (window.py:66-68)

    def inject_close(self):
        self._should_close = True          # Esc

    def inject_click(self, sx: float, sy: float):
        """LMB press in select mode -> select callback with the pick ray."""
        if self._select_cbs:
            o, d = self.camera.unproject(sx, sy, self.width, self.height)
            self._select_cbs[0](o, d)

    def inject_drag(self, sx: float, sy: float):
        if self._select_cbs:
            o, d = self.camera.unproject(sx, sy, self.width, self.height)
            self._select_cbs[1](o, d)

    def inject_release(self):
        if self._select_cbs:
            self._select_cbs[2]()

    # -- output --------------------------------------------------------------
    def save_gif(self, path: str, fps: int = 15):
        from ..utils.viz import render_gif
        if not self.frames:
            raise RuntimeError("no frames captured; pass capture_every>0 and "
                               "set_frame_source(...)")
        render_gif(self.frames, self._tris, path, fps=fps)

    def save_png(self, path: str, frame: int = -1):
        from ..utils.viz import render_surface
        render_surface(self.frames[frame], self._tris, path)


# Alias matching the reference class name (`Window(1920, 1080, "Test")`).
Window = HeadlessWindow
