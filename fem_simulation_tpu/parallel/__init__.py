from .dist import make_device_mesh, make_batched_step  # noqa: F401
