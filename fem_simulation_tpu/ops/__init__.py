from . import elastic, ell, spring  # noqa: F401
