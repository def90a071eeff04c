"""Native checkpointing: parameter pytrees <-> npz files.

Mirrors the reference's per-net ``{epoch}_net_{name}.pth`` naming
(reference base_model.py:190-212) with ``{epoch}_net_{name}.npz`` holding the
stacked group pytree flattened by key path. A ``latest`` alias is always
written. Orbax is available in the environment and can be layered on later;
npz keeps checkpoints dependency-free and diffable.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree):
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = '/'.join(
            str(getattr(k, 'key', getattr(k, 'idx', k))) for k in path)
        flat[key] = np.asarray(leaf)
    return flat


def save_pytree(path, tree):
    """Atomic write (temp + os.replace): a crash or preemption mid-save
    must never truncate the 'latest' alias that resume depends on."""
    tmp = f'{path}.tmp-{os.getpid()}'
    try:
        np.savez(tmp, **_flatten(tree))
        # np.savez appends .npz when the name lacks it
        written = tmp if os.path.exists(tmp) else tmp + '.npz'
        os.replace(written, path)
    finally:
        for cand in (tmp, tmp + '.npz'):
            if os.path.exists(cand):
                os.remove(cand)


def load_pytree(path, like):
    """Load an npz into the structure of ``like`` (same flatten order)."""
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(like)
    flat_paths = ['/'.join(str(getattr(k, 'key', getattr(k, 'idx', k)))
                           for k in p)
                  for p, _ in jax.tree_util.tree_flatten_with_path(like)[0]]
    new_leaves = []
    for key, leaf in zip(flat_paths, leaves):
        if key not in data:
            raise KeyError(f'checkpoint missing key {key} in {path}')
        arr = data[key]
        if arr.shape != np.shape(leaf):
            raise ValueError(f'{key}: checkpoint shape {arr.shape} != model '
                             f'shape {np.shape(leaf)}')
        new_leaves.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_networks(save_dir, params, epoch='latest'):
    """Save each top-level group (G, GS, D, DS, ...) as its own file."""
    os.makedirs(save_dir, exist_ok=True)
    for name, tree in params.items():
        save_pytree(os.path.join(save_dir, f'{epoch}_net_{name}.npz'), tree)
        if epoch != 'latest':
            save_pytree(os.path.join(save_dir, f'latest_net_{name}.npz'), tree)


def load_networks(save_dir, like_params, epoch='latest'):
    out = {}
    for name, like in like_params.items():
        f = os.path.join(save_dir, f'{epoch}_net_{name}.npz')
        if not os.path.exists(f):
            raise FileNotFoundError(f)
        out[name] = load_pytree(f, like)
    return out


def has_native_checkpoint(model_dir, epoch='latest'):
    return (os.path.exists(os.path.join(model_dir, f'{epoch}_net_G.npz'))
            or os.path.exists(os.path.join(model_dir, f'{epoch}_net_GA.npz')))


# ---------------------------------------------------------------------------
# orbax backend (optional; same directory layout, 'orbax' subdirs)
# ---------------------------------------------------------------------------

def save_networks_orbax(save_dir, params, epoch='latest'):
    """Checkpoint via orbax (atomic, async-capable). Layout:
    <save_dir>/orbax/<epoch>/<net-name>."""
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    # numbered epochs also refresh the 'latest' alias, mirroring the npz
    # backend exactly (load_networks_orbax defaults to epoch='latest')
    epochs = [str(epoch)] if str(epoch) == 'latest' \
        else [str(epoch), 'latest']
    for ep in epochs:
        path = os.path.abspath(os.path.join(save_dir, 'orbax', ep))
        for name, tree in params.items():
            ckptr.save(os.path.join(path, name), tree, force=True)
    ckptr.wait_until_finished()


def load_networks_orbax(save_dir, like_params, epoch='latest'):
    import orbax.checkpoint as ocp
    path = os.path.abspath(os.path.join(save_dir, 'orbax', str(epoch)))
    ckptr = ocp.StandardCheckpointer()
    out = {}
    for name, like in like_params.items():
        out[name] = ckptr.restore(os.path.join(path, name), like)
    return out
