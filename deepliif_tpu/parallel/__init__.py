"""Device mesh and sharding helpers.

Replaces the reference's three parallelism code paths — DataParallel,
DistributedDataParallel+NCCL, and Dask net-to-GPU placement (SURVEY.md
section 2.3) — with one: a jax.sharding.Mesh over all devices with the batch
(tiles or training examples) sharded along a ``data`` axis. Parameters are
replicated; gradient psums ride ICI inside the jitted step.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(n_devices=None, axis='data', devices=None):
    devs = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def replicated(mesh):
    return NamedSharding(mesh, P())


def batch_sharded(mesh, axis='data'):
    """Shard the leading (batch) dim across the mesh."""
    return NamedSharding(mesh, P(axis))


def shard_batch(mesh, batch, axis='data'):
    """Place a host array (or pytree) with its leading dim sharded.
    Leading dim must be divisible by the mesh size; pad first if not."""
    sh = batch_sharded(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def pad_to_multiple(n, m):
    return ((n + m - 1) // m) * m


def make_sharded_forward(fn, mesh, axis='data'):
    """Jit ``fn(params, x)`` with params replicated and x batch-sharded.
    XLA inserts the collectives; outputs stay batch-sharded."""
    in_shardings = (replicated(mesh), batch_sharded(mesh, axis))
    return jax.jit(fn, in_shardings=in_shardings)


def make_data_parallel_train_step(step_fn, mesh, axis='data'):
    """Jit a train step with state replicated and batch sharded; the loss
    mean over the sharded batch makes XLA emit the gradient all-reduce
    (the DDP replacement)."""
    in_shardings = (replicated(mesh), batch_sharded(mesh, axis), replicated(mesh))
    return jax.jit(step_fn, in_shardings=in_shardings, donate_argnums=(0,))
