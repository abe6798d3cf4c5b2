from .dist import make_device_mesh, make_batched_step  # noqa: F401
from .lattice_mg_dist import (DistLatticeMG,  # noqa: F401
                              make_dist_mg_quasistatic, make_dist_mg_step)
