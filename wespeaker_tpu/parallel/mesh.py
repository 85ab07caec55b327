"""Device mesh construction and sharding helpers.

The reference's parallelism story is torchrun + DDP/NCCL
(wespeaker/bin/train.py:49-54,179; SURVEY.md §2.10). The TPU-native
replacement: a jax.sharding.Mesh over all chips with a 'data' axis for DP
(grad psum inserted by XLA under jit) and an optional 'model' axis for
tensor-sharding large SSL frontends. Multi-host init goes through
jax.distributed.initialize; host-local data loading shards the global batch
by process the way DistributedSampler strides by rank
(wespeaker/dataset/dataset.py:54-100).
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """Multi-host bring-up (replaces torchrun c10d rendezvous). No-op when
    single-process or when jax.distributed is already initialized."""
    if num_processes is None or num_processes <= 1:
        return
    from jax._src import distributed as _dist
    if getattr(_dist.global_state, "client", None) is not None:
        return  # already initialized (e.g. two entry points in-process)
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a ('data', 'model') mesh. Default: all devices on the data axis
    (pure DP, the reference's only mode); model>1 carves a tensor-parallel
    axis for SSL frontends that exceed one chip's HBM."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model == n, (data, model, n)
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis split across 'data'."""
    return NamedSharding(mesh, P("data"))


def process_data_stripe(mesh: Mesh):
    """(stripe_index, num_stripes) for a P('data') batch: which contiguous
    row-stripe of the global batch this process must LOAD.

    Rows split over 'data' only; this process holds the rows of the
    data-axis coordinates its devices cover. A model axis spanning hosts
    means several hosts share the same data coordinates and must load the
    SAME stripe, so num_stripes is the number of distinct data-coordinate
    groups — NOT process_count. Trainers load global_batch // num_stripes
    rows per process and stride their data list by (stripe, num_stripes)."""
    if jax.process_count() == 1:
        return 0, 1
    pidx = np.vectorize(lambda d: d.process_index)(mesh.devices)
    mine = (pidx == jax.process_index()).any(
        axis=tuple(range(1, pidx.ndim)))
    coords = np.nonzero(mine)[0]
    local = len(coords)
    assert local > 0 and coords[-1] - coords[0] + 1 == local, (
        "process's data coordinates must be contiguous", coords)
    num = mesh.shape["data"] // local
    return int(coords[0]) // local, num


def process_batch_factor(mesh: Mesh) -> int:
    """global batch rows / per-process local rows (see
    process_data_stripe)."""
    return process_data_stripe(mesh)[1]


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch with the batch axis sharded over 'data'.

    Single process: a plain sharded device_put. Multi-process: each host
    holds only its rank-striped slice of the global batch (the DDP data
    contract, dataset.py rank striding), so the global array is assembled
    from per-process local rows — device_put cannot address other hosts'
    devices."""
    s = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)
    factor = process_batch_factor(mesh)

    def put(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * factor,) + x.shape[1:]
        return jax.make_array_from_process_local_data(
            s, x, global_shape=global_shape)

    return jax.tree_util.tree_map(put, batch)
