"""Device mesh construction and sharding strategies.

The reference has no distributed layer (SURVEY §2.3); this is the TPU-native
scale-out design:

- ``data`` axis: ray batches (and diffusion candidate batches) are sharded
  across devices; parameters are replicated along it.  XLA inserts the
  gradient all-reduce over ICI.
- ``model`` axis: appearance factor channels and the basis matrix rows are
  sharded (tensor parallelism); the basis matmul produces partial sums that
  XLA reduces over the axis.

Usage: build a mesh, shard params/batch with :func:`shard_params` /
:func:`shard_batch`, and call the ordinary jitted train step — GSPMD
propagates shardings and emits the collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence] = None,
    data: Optional[int] = None,
    model: int = 1,
) -> Mesh:
    """Build a ('data', 'model') mesh over the given (or all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"{data}x{model} != {n} devices"
    arr = np.array(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Shard leading (ray) dimension over the 'data' axis."""
    s = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def param_sharding_spec(params, mesh: Mesh):
    """Per-leaf NamedShardings: appearance channels + basis rows over
    'model'; everything else replicated.

    Plane leaves are (H, W, C) → P(None, None, 'model'); lines (L, C) →
    P(None, 'model'); basis (3C, app_dim) → P('model', None).  The partial
    products concat over the channel axis stay sharded and the basis matmul
    reduces over 'model'.
    """
    rep = NamedSharding(mesh, P())

    def spec_for(path_key, leaf):
        if mesh.shape["model"] == 1:
            return rep
        name = path_key[0].key if path_key else ""
        if name in ("app_planes",):
            return NamedSharding(mesh, P(None, None, "model"))
        if name in ("app_lines",):
            return NamedSharding(mesh, P(None, "model"))
        if name == "basis":
            return NamedSharding(mesh, P("model", None))
        return rep

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params, mesh: Mesh):
    specs = param_sharding_spec(params, mesh)
    return jax.tree.map(jax.device_put, params, specs)
