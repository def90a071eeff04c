"""Device mesh and sharding helpers.

Replaces the reference's three parallelism code paths — DataParallel,
DistributedDataParallel+NCCL, and Dask net-to-GPU placement (SURVEY.md
section 2.3) — with one: a jax.sharding.Mesh over all devices with the batch
(tiles or training examples) sharded along a ``data`` axis. Parameters are
replicated; gradient psums ride ICI inside the jitted step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
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


def spatial_halo_apply(fn, x, mesh, halo, axis='data'):
    """Apply a local spatial op over a width-sharded image with
    collective-permute halo exchange (the 'long-context' spatial analog,
    SURVEY 2.3/5.7: conv-family ops over one large ROI sharded across the
    mesh instead of tiled through the host).

    ``x`` is (H, W, C) with W divisible by the mesh size. Each device
    receives its width shard plus ``halo`` columns from each neighbor via
    ``lax.ppermute`` (edge shards see zeros — zero-pad semantics), then
    ``fn`` maps the haloed block (H, W/n + 2*halo, C) to the shard's
    outputs (H, W/n, C). For any op whose receptive radius is <= halo
    (e.g. a stack of 3x3 convs or min-propagation sweeps), the result is
    bit-identical to running fn on the whole image on one device.
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    n = mesh.shape[axis]
    H, W, C = x.shape
    if W % n != 0:
        raise ValueError(f'width {W} not divisible by mesh size {n}')

    def local(xl):
        # xl: (H, W/n, C) local shard
        to_right = [(i, i + 1) for i in range(n - 1)]
        to_left = [(i + 1, i) for i in range(n - 1)]
        from_left = jax.lax.ppermute(xl[:, -halo:], axis, to_right)
        from_right = jax.lax.ppermute(xl[:, :halo], axis, to_left)
        xp = jnp.concatenate([from_left, xl, from_right], axis=1)
        return fn(xp)

    return shard_map(local, mesh=mesh,
                     in_specs=P(None, axis, None),
                     out_specs=P(None, axis, None))(x)
