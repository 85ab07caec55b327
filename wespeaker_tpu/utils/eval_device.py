"""Eval-time device placement shared by the batch-eval CLIs (extract,
diarize): bf16 weight cast, weight residency, and single-process
multi-chip data parallelism (replicated weights + batch-dim sharding —
the TPU-native form of the reference's file-split + CUDA_VISIBLE_DEVICES
process parallelism, tools/extract_embedding.sh:40-66)."""

import logging

import numpy as np

import jax
import jax.numpy as jnp


def prepare_eval_placement(variables, bf16: bool = False,
                           data_parallel: bool = False,
                           batch_size: int = 1):
    """Returns (variables, compute_dtype, batch_sharding, batch_size).

    bf16 casts float32 weights to bfloat16. data_parallel replicates the
    weights over every local device and returns a NamedSharding for the
    batch dim (batch_size is rounded up to a device multiple); otherwise
    batch_sharding is None and the weights are simply made device-resident.
    """
    compute_dtype = jnp.bfloat16 if bf16 else jnp.float32
    if bf16:
        variables = jax.tree_util.tree_map(
            lambda a: (a.astype(jnp.bfloat16)
                       if a.dtype == jnp.float32 else a), variables)
    batch_sharding = None
    n_dev = len(jax.devices()) if data_parallel else 1
    if n_dev > 1:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        mesh = Mesh(np.asarray(jax.devices()), ("data",))
        variables = jax.device_put(variables, NamedSharding(mesh, P()))
        batch_sharding = NamedSharding(mesh, P("data"))
        if batch_size % n_dev:
            batch_size = -(-batch_size // n_dev) * n_dev
            logging.info(f"data_parallel: batch_size rounded up to "
                         f"{batch_size} ({n_dev} devices)")
    else:
        variables = jax.device_put(variables)  # weight residency
    return variables, compute_dtype, batch_sharding, batch_size
