"""Device mesh + sharding helpers.

The TPU answer to the reference's DDP/NCCL layer (ref distillation/nnunetv2/run/
run_training.py:101-113 and utilities/ddp_allgather.py): a ``jax.sharding.Mesh``
with a ``data`` axis for batch parallelism and a ``space`` axis for sharding the
sliding-window tile grid / volume slabs at inference. Gradient and metric
reductions are XLA collectives inserted by pjit from the shardings — no explicit
all_reduce calls, no process groups, no barriers.
"""
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_space: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """(data, space) mesh. Default: all visible devices on the data axis."""
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_space
    assert n_data * n_space <= len(devices), \
        f"mesh {n_data}x{n_space} needs {n_data * n_space} devices, have {len(devices)}"
    dev_array = np.array(devices[: n_data * n_space]).reshape(n_data, n_space)
    return Mesh(dev_array, axis_names=("data", "space"))


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis, replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def space_sharding(mesh: Mesh, ndim: int, axis: int = 0) -> NamedSharding:
    spec = [None] * ndim
    spec[axis] = "space"
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch) -> Tuple:
    """Place a host batch (pytree of arrays with leading batch axis) onto the mesh
    sharded over 'data'."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, data_sharding(mesh, x.ndim)), batch)


def replicate(mesh: Mesh, tree):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, replicated_sharding(mesh)), tree)
