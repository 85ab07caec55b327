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
    if num_processes is not None and num_processes > 1:
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

    def put(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(
            s, x, global_shape=global_shape)

    return jax.tree_util.tree_map(put, batch)
