"""Multi-chip sharding for the FEM simulator.

The reference is strictly single-GPU (SURVEY.md section 2.3: every allocation
pins 'cuda:0', no communication backend exists). The TPU distributed story is
therefore new design, not a port:

* **dp** (data parallel): a batch of independent scenes/episodes, sharded
  across one mesh axis. Physics of different scenes never communicates, so dp
  traffic is zero (pure throughput axis — DCN-friendly).
* **sp** (spatial): the vertex/element axes of each scene sharded across the
  other mesh axis. Gathers (x[nbr], x[hexes]) and scatter-adds along sharded
  axes become XLA-inserted collectives riding ICI. This is GSPMD-style domain
  decomposition: we annotate shardings and let XLA place halo exchanges.

Entry points:
  make_device_mesh(n, dp) -> jax.sharding.Mesh over ('dp', 'sp')
  make_batched_step(scene, mesh, batch) -> (jitted step, params, state0)
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import DynamicsConfig
from ..sim.scene import Scene
from ..sim import dynamic


def make_device_mesh(n_devices: int | None = None, dp: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if dp is None:
        dp = 2 if (n % 2 == 0 and n >= 2) else 1
    sp = n // dp
    assert dp * sp == n, f"{dp}x{sp} != {n}"
    return Mesh(np.array(devs).reshape(dp, sp), ("dp", "sp"))


def make_batched_step(scene: Scene, mesh: Mesh, batch: int,
                      dyn: DynamicsConfig = DynamicsConfig()):
    """Batched + sharded dynamic step.

    State arrays are (B, N, ...): B sharded over 'dp', N (vertices) over 'sp'.
    Scene params are replicated (topology tables are shared by every scene;
    they are small relative to state at scale).
    Returns (step_fn, params, state0) with shardings applied.
    """
    repl = NamedSharding(mesh, P())
    s_x = NamedSharding(mesh, P("dp", "sp", None))     # (B, N, 3)
    s_m = NamedSharding(mesh, P("dp", "sp"))           # (B, N)

    params = jax.device_put(scene.params, repl)

    st = dynamic.init_state(scene)
    state0 = dynamic.DynState(
        x=jax.device_put(jnp.broadcast_to(st.x, (batch,) + st.x.shape), s_x),
        v=jax.device_put(jnp.zeros((batch,) + st.v.shape, st.v.dtype), s_x),
        drag_mask=jax.device_put(
            jnp.zeros((batch,) + st.drag_mask.shape, st.drag_mask.dtype), s_m),
        drag_pos=jax.device_put(jnp.broadcast_to(st.drag_pos,
                                                 (batch,) + st.drag_pos.shape), s_x),
    )

    def one(p, s):
        return dynamic.step(scene, p, s, dyn)

    vstep = jax.vmap(one, in_axes=(None, 0))
    step_fn = jax.jit(
        vstep,
        in_shardings=(repl, dynamic.DynState(x=s_x, v=s_x,
                                             drag_mask=s_m, drag_pos=s_x)),
        out_shardings=dynamic.DynState(x=s_x, v=s_x, drag_mask=s_m, drag_pos=s_x),
    )
    return step_fn, params, state0
