from . import smoothers, cg  # noqa: F401
