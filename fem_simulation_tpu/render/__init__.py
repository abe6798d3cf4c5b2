from .camera import Camera  # noqa: F401
from .window import HeadlessWindow, Window  # noqa: F401
