from .scene import Scene  # noqa: F401
from .quasistatic import QuasiStaticSim  # noqa: F401
