"""Training loop for the DeepLIIF family.

Mirrors the reference epoch loop (reference cli.py:194-570): per-iteration
loss printing at print_freq, latest/epoch checkpointing, linear LR decay via
the optax schedule, optional validation (losses + cell-count RMSE against
val/metrics.json ground truth, cli.py:495-564).

TPU-native differences: one jitted train step per iteration (G and D updates
fused into a single XLA program), params replicated + batch sharded over the
device mesh instead of DP/DDP, jax PRNG keys instead of global seeds.
"""

from __future__ import annotations

import json
import math
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from . import parallel
from .config import save_options
from .data import create_dataset
from .models import deepliif as dl
from .nets import vgg
from .utils import checkpoints
from .utils.visualizer import Visualizer


def _family_module(model):
    """Resolve the model-family module once, so def/state/step dispatch
    shares one branch point (every family module exposes ``def_from_opt``
    and ``create_train_state``; the reference resolves families the same
    way via find_model_using_name, models/__init__.py:53-114)."""
    if model == 'CycleGAN':
        from .models import cyclegan as m
    elif model == 'DeepLIIFExt':
        from .models import deepliif_ext as m
    elif model == 'SDG':
        from .models import sdg as m
    elif model == 'DeepLIIFKD':
        from .models import deepliif_kd as m
    else:
        m = dl
    return m


def check_weights(model, modalities_no, seg_weights, loss_g_weights,
                  loss_d_weights):
    """(reference util/checks.py:3-17)"""
    expected = modalities_no + 1 if model in ('DeepLIIF', 'DeepLIIFKD') else modalities_no
    for name, w in (('seg_weights', seg_weights),
                    ('loss_G_weights', loss_g_weights),
                    ('loss_D_weights', loss_d_weights)):
        assert len(w) == expected, f'{name} needs {expected} entries, got {len(w)}'
        assert abs(sum(w) - 1.0) < 1e-6, f'{name} must sum to 1 (got {sum(w)})'


class PlateauController:
    """ReduceLROnPlateau(mode='min', rel threshold) host-side controller
    (reference networks.py:74-75: factor=0.2, threshold=0.01, patience=5).

    The reference steps its scheduler with a metric that is never set (stays
    0, base_model.py:48,136); here the monitored metric is the mean epoch
    loss (or mean validation loss when --with-val is on), which is the
    documented intent of the policy.
    """

    def __init__(self, factor=0.2, threshold=0.01, patience=5):
        self.factor = factor
        self.threshold = threshold
        self.patience = patience
        self.best = None
        self.num_bad = 0
        self.mult = 1.0

    def step(self, metric):
        """Returns True if the LR multiplier was just reduced."""
        if self.best is None or metric < self.best * (1 - self.threshold):
            self.best = metric
            self.num_bad = 0
            return False
        self.num_bad += 1
        if self.num_bad > self.patience:
            self.mult *= self.factor
            self.num_bad = 0
            return True
        return False


def _set_injected_lr(state, lr_g, lr_d):
    """Write new learning rates into inject_hyperparams optimizer states."""
    for attr, new_lr in (('g_opt_state', lr_g), ('d_opt_state', lr_d)):
        s = getattr(state, attr)
        if not hasattr(s, 'hyperparams'):
            continue
        old = s.hyperparams['learning_rate']
        new = jnp.asarray(new_lr, dtype=getattr(old, 'dtype', jnp.float32))
        if hasattr(old, 'sharding'):
            new = jax.device_put(new, old.sharding)
        hp = dict(s.hyperparams)
        hp['learning_rate'] = new
        setattr(state, attr, s._replace(hyperparams=hp))


def _batch_to_device(batch, d, mesh=None, shardings=None):
    """Host batch -> device arrays. With a mesh, the batch axis shards on
    'data' (shardings prebuilt once by train_model); in multi-host runs
    each process contributes its rank-strided LOCAL batch and the global
    array is assembled across processes — the reference's
    DistributedSampler + DDP-allreduce combination in one step."""
    out = {k: v for k, v in batch.items() if not k.endswith('_paths')}
    if mesh is None or shardings is None:
        return {k: jnp.asarray(v) for k, v in out.items()}
    nproc = jax.process_count()
    if nproc > 1:
        put = {}
        for k, v in out.items():
            v = np.asarray(v)
            gshape = list(v.shape)
            ax = 1 if k in ('B_mods', 'B_segs') else 0
            gshape[ax] *= nproc
            put[k] = jax.make_array_from_process_local_data(
                shardings[k], v, tuple(gshape))
        return put
    return {k: jax.device_put(jnp.asarray(v), shardings[k])
            for k, v in out.items()}


def _cell_count_rmse(model_outputs, gt_metrics, tile_size, model):
    """RMSE of num_pos/num_neg/num_total/percent_pos vs metrics.json GT."""
    from . import postprocessing as pp
    from .utils import tensor2im
    from PIL import Image
    diffs = {k: [] for k in ('num_total', 'num_pos', 'num_neg', 'percent_pos')}
    for name, (input_img, seg_arr) in model_outputs.items():
        if name not in gt_metrics:
            continue
        seg_img = tensor2im(seg_arr)
        resolution = '40x' if tile_size > 384 else ('20x' if tile_size > 192 else '10x')
        try:
            _, _, scoring = pp.compute_final_results(
                Image.fromarray(tensor2im(input_img)), Image.fromarray(seg_img),
                None, resolution,
                seg_thresh=gt_metrics[name].get('prob_thresh',
                                                gt_metrics[name].get('seg_thresh', 150)))
        except Exception:
            continue
        for k in diffs:
            diffs[k].append((scoring[k] - gt_metrics[name][k]) ** 2)
    return {f'rmse_{k}': math.sqrt(np.mean(v)) if v else 0.0
            for k, v in diffs.items()}


def train_model(opt):
    """Run the full training; returns the final TrainState.

    ONE loop for every family (reference cli.py:422-570 does the same):
    DeepLIIF/DeepLIIFKD/DeepLIIFExt/SDG run a single fused G+D jitted step;
    CycleGAN's step driver interleaves its two jitted steps with the host
    image-pool query — but iteration saves, --save-by-iter, continue-train
    resume, epoch_base, debug caps, display and LR policies are the same
    code path for all five."""
    model = getattr(opt, 'model', 'DeepLIIF')
    fam = _family_module(model)
    d = fam.def_from_opt(opt)
    if model == 'DeepLIIFExt':
        check_weights('DeepLIIFExt', d.modalities_no, [1 / d.modalities_no] *
                      d.modalities_no, list(d.loss_g_weights),
                      list(d.loss_d_weights))
    elif model not in ('CycleGAN', 'SDG'):
        check_weights(opt.model, d.modalities_no, list(d.seg_weights),
                      list(d.loss_g_weights), list(d.loss_d_weights))

    dataset = create_dataset(opt, phase='train')
    # per-host steps: the loader strides indices rank::world, so the LR
    # schedule must advance by real (global) epochs
    world = max(1, getattr(dataset, 'world_size', 1))
    steps_per_epoch = max(1, len(dataset) // max(1, opt.batch_size * world))
    print(f'The number of training images = {len(dataset)}')

    save_options(opt)

    key = jax.random.PRNGKey(getattr(opt, 'seed', None) or 0)
    vgg_params = vgg.init()
    teacher = (fam.load_teacher(opt.model_dir_teacher)
               if model == 'DeepLIIFKD' else None)
    state, g_tx, d_tx = fam.create_train_state(key, d, opt, steps_per_epoch)

    if getattr(opt, 'verbose', False):
        # reference --verbose prints per-net architectures; parameter counts
        # are the functional equivalent for a params-pytree model
        for group_name, group in (('G', state.g_params),
                                  ('D', state.d_params)):
            for net, tree in group.items():
                n = sum(int(np.prod(np.shape(x)))
                        for x in jax.tree_util.tree_leaves(tree))
                print(f'[network {group_name}:{net}] parameters: {n / 1e6:.3f} M')

    save_dir = os.path.join(opt.checkpoints_dir, opt.name)
    epoch_base = 0
    if getattr(opt, 'continue_train', False):
        epoch = getattr(opt, 'epoch', 'latest')
        try:
            nets_loaded = checkpoints.load_networks(
                save_dir, {**state.g_params, **state.d_params}, epoch)
            state.g_params.update({k: nets_loaded[k] for k in state.g_params})
            state.d_params.update({k: nets_loaded[k] for k in state.d_params})
            print(f'resumed networks from {save_dir} @ {epoch}')
            optim_path = os.path.join(save_dir, f'{epoch}_optim.npz')
            if os.path.exists(optim_path):
                opt_state = checkpoints.load_pytree(
                    optim_path, {'g': state.g_opt_state, 'd': state.d_opt_state,
                                 'step': state.step})
                state.g_opt_state = opt_state['g']
                state.d_opt_state = opt_state['d']
                state.step = opt_state['step']
                print(f'resumed optimizer state @ step {int(state.step)}')
            if str(epoch).isdigit():
                epoch_base = int(epoch)
        except FileNotFoundError as e:
            raise FileNotFoundError(f'--continue-train set but checkpoint missing: {e}')

    devices = jax.devices()
    batch = getattr(opt, 'batch_size', 1)
    # batch_size is PER HOST (the loader yields that many rank-strided
    # samples); the sharded step sees the global batch across processes
    global_batch = batch * jax.process_count()
    use_mesh = len(devices) > 1 and global_batch % len(devices) == 0
    # CycleGAN data-parallels on a single-host mesh (reference wraps every
    # family in DP/DDP uniformly, networks.py:118-139); multi-host would
    # need cross-host gathers around the host image-pool query, so it
    # falls back to per-host stepping there
    if model == 'CycleGAN' and jax.process_count() > 1:
        use_mesh = False

    # build the un-jitted step body per model family
    if model == 'DeepLIIFExt':
        step_body = fam.make_train_step_body(d, g_tx, d_tx)
    elif model == 'SDG':
        step_body = fam.make_train_step_body(d, g_tx, d_tx, vgg_params)
    elif model == 'DeepLIIFKD':
        step_body = fam.make_train_step_body(d, g_tx, d_tx, vgg_params,
                                             teacher[0], teacher[1])
    elif model == 'CycleGAN':
        # CycleGAN's step is two jitted programs with the image-pool query
        # (host-side ring-buffer state, reference CycleGAN_model.py:108-109)
        # between them: G update -> pool swap of the fakes -> D update on
        # the pooled fakes. The driver presents the same
        # (state, batch, rng) -> (state, metrics, g_out) signature as the
        # other families so the surrounding loop is shared.
        cg = fam
        cg_mesh = parallel.get_mesh() if use_mesh else None
        if cg_mesh is not None:
            state = parallel.replicate(cg_mesh, state)
            vgg_params = parallel.replicate(cg_mesh, vgg_params)
            from jax.sharding import NamedSharding, PartitionSpec as P
            cg_sh = NamedSharding(cg_mesh, P(None, 'data'))
            print(f'data-parallel CycleGAN over {len(devices)} devices')
        else:
            cg_sh = None
        g_step, d_step = cg.make_train_steps(d, g_tx, d_tx, vgg_params,
                                             mesh=cg_mesh)
        pool_size = getattr(opt, 'pool_size', 50)
        seed0 = getattr(opt, 'seed', None) or 0
        pools_a = [cg.ImagePool(pool_size, seed0 + i)
                   for i in range(d.modalities_no)]
        pools_b = [cg.ImagePool(pool_size, seed0 + 100 + i)
                   for i in range(d.modalities_no)]

        def step_body(state, jbatch, rng):
            real_as = jnp.broadcast_to(
                jnp.asarray(jbatch['A'])[None],
                (d.modalities_no,) + tuple(jbatch['A'].shape))
            real_bs = jnp.asarray(jbatch['B_mods'])[:d.modalities_no]
            if cg_sh is not None:
                real_as = jax.device_put(real_as, cg_sh)
                real_bs = jax.device_put(real_bs, cg_sh)
            state, gm, outs = g_step(state, real_as, real_bs, rng)
            # pool query on host; the re-uploaded pooled fakes are placed
            # by d_step's in_shardings on the mesh path
            fb = jnp.stack([jnp.asarray(pools_b[i].query(
                np.asarray(outs['fake_bs'][i])))
                for i in range(d.modalities_no)])
            fa = jnp.stack([jnp.asarray(pools_a[i].query(
                np.asarray(outs['fake_as'][i])))
                for i in range(d.modalities_no)])
            state, dm = d_step(state, fb, fa, real_as, real_bs)
            return state, {**gm, **dm}, {'mods': outs['fake_bs']}
    else:
        step_body = dl.make_train_step_body(d, g_tx, d_tx, vgg_params)

    if model == 'CycleGAN':
        # CycleGAN does not fuse into ONE sharded program (host pool
        # between its two steps); its driver shards each step over the
        # mesh itself (cg_sh above), so the generic batch sharding stays
        # off here
        mesh = None
        data_sh = None
        step_fn = step_body   # already drives jitted inner steps
    elif use_mesh:
        mesh = parallel.get_mesh()
        state = parallel.replicate(mesh, state)
        vgg_params = parallel.replicate(mesh, vgg_params)
        from jax.sharding import NamedSharding, PartitionSpec as P
        repl = parallel.replicated(mesh)

        def _data_sharding(keys):
            # key set depends on the model family (B_segs only for Ext);
            # built from the first real batch so in_shardings' pytree
            # matches the argument exactly
            return {k: NamedSharding(mesh, P(None, 'data')
                                     if k in ('B_mods', 'B_segs')
                                     else P('data')) for k in keys}

        step_fn = None   # jitted on the first batch
        data_sh = None
        print(f'data-parallel over {len(devices)} devices')
    else:
        mesh = None
        data_sh = None
        step_fn = jax.jit(step_body, donate_argnums=(0,))

    # --with-val computes validation losses for EVERY family (reference
    # calculate_losses() is family-generic, cli.py:495-511); the KD
    # student is DeepLIIF topology so it shares dl's eval. Cell-count
    # RMSE stays DeepLIIF/KD-only (_run_validation), as the reference's
    # does (cli.py:514).
    eval_fn = None
    if getattr(opt, 'with_val', False):
        eval_fam = dl if model in ('DeepLIIF', 'DeepLIIFKD') else fam
        eval_fn = eval_fam.make_eval_losses(d, vgg_params)

    visualizer = Visualizer(opt)
    rng = jax.random.PRNGKey((getattr(opt, 'seed', None) or 0) + 1)

    total_iters = 0
    print_freq = getattr(opt, 'print_freq', 100)
    display_freq = getattr(opt, 'display_freq', 400)
    save_latest_freq = getattr(opt, 'save_latest_freq', 500)
    save_epoch_freq = getattr(opt, 'save_epoch_freq', 100)

    n_epochs = getattr(opt, 'n_epochs', 100)
    n_epochs_decay = getattr(opt, 'n_epochs_decay', 100)
    epoch_count = getattr(opt, 'epoch_count', 1)
    save_by_iter = getattr(opt, 'save_by_iter', False)

    lr_policy = getattr(opt, 'lr_policy', 'linear')
    lr_g0 = getattr(opt, 'lr_g', 2e-4)
    plateau = PlateauController() if lr_policy == 'plateau' else None
    from .nets import make_lr_schedule
    lr_sched = make_lr_schedule(opt, steps_per_epoch)

    metrics = {}
    # plateau without validation monitors the MEAN train loss_G over the
    # epoch (PlateauController's documented contract) — that needs a
    # per-step scalar fetch, so only pay it when that policy is active
    track_epoch_loss = plateau is not None and eval_fn is None
    for epoch in range(epoch_count, n_epochs + n_epochs_decay + 1):
        epoch_start = time.time()
        iter_data_time = time.time()
        epoch_iter = 0
        epoch_g_sum, epoch_g_n = 0.0, 0
        visualizer.reset()
        dataset.set_epoch(epoch)

        for data in dataset:
            iter_start = time.time()
            t_data = iter_start - iter_data_time
            total_iters += batch
            epoch_iter += batch

            rng, step_rng = jax.random.split(rng)
            if mesh is not None and step_fn is None:
                data_sh = _data_sharding(
                    [k for k in data if not k.endswith('_paths')])
                step_fn = jax.jit(step_body,
                                  in_shardings=(repl, data_sh, repl),
                                  donate_argnums=(0,))
            jbatch = _batch_to_device(data, d, mesh, data_sh)
            state, metrics, g_out = step_fn(state, jbatch, step_rng)
            if track_epoch_loss:
                epoch_g_sum += float(np.mean(np.asarray(
                    metrics.get('loss_G', 0.0))))
                epoch_g_n += 1

            if total_iters % print_freq == 0:
                m = {k: float(v) if np.ndim(v) == 0 else float(np.mean(v))
                     for k, v in metrics.items()}
                t_comp = (time.time() - iter_start) / batch
                visualizer.print_current_losses(epoch, epoch_iter, m, t_comp, t_data)
                visualizer.plot_current_losses(
                    epoch, epoch_iter / max(1, len(dataset)), m)

            monitor = getattr(opt, 'monitor_image', None)
            display_now = (total_iters % display_freq == 0 if monitor is None
                           else data['A_paths'][0].endswith(monitor))
            if display_now:
                vis = {'real_A': np.asarray(data['A'][0][..., :3])}
                mods = np.asarray(g_out['mods'])
                for i in range(mods.shape[0]):
                    vis[f'fake_B_{i+1}'] = mods[i][0]
                if 'seg' in g_out:
                    vis['fake_B_S'] = np.asarray(g_out['seg'])[0]
                if 'segs' in g_out:
                    segs = np.asarray(g_out['segs'])
                    for i in range(segs.shape[0]):
                        vis[f'fake_BS_{i+1}'] = segs[i][0]
                visualizer.display_current_results(vis, epoch, True)

            if total_iters % save_latest_freq == 0:
                # --save-by-iter keeps every snapshot under iter_<N> instead
                # of overwriting latest (reference cli.py:472-475)
                suffix = f'iter_{total_iters}' if save_by_iter else 'latest'
                _save_state(save_dir, state, suffix, getattr(opt, 'remote_transfer_cmd', None), getattr(opt, 'checkpoint_format', 'npz'))
            iter_data_time = time.time()

            if (getattr(opt, 'debug', False)
                    and epoch_iter >= getattr(opt, 'debug_data_size', 10)):
                # reference cli.py:479-481: debug mode caps each epoch
                print(f'debug mode, epoch {epoch} stopped at epoch iter '
                      f'{epoch_iter}')
                break

        if epoch % save_epoch_freq == 0:
            _save_state(save_dir, state, 'latest', getattr(opt, 'remote_transfer_cmd', None), getattr(opt, 'checkpoint_format', 'npz'))
            _save_state(save_dir, state, str(epoch + epoch_base), getattr(opt, 'remote_transfer_cmd', None), getattr(opt, 'checkpoint_format', 'npz'))

        val_losses = None
        if eval_fn is not None:
            val_losses = _run_validation(opt, d, state, eval_fn, visualizer,
                                         epoch, rng)

        if plateau is not None:
            monitored = (float(np.mean(list(val_losses.values())))
                         if val_losses else
                         (epoch_g_sum / epoch_g_n if epoch_g_n else 0.0))
            if plateau.step(monitored):
                _set_injected_lr(state, lr_g0 * plateau.mult,
                                 getattr(opt, 'lr_d', 2e-4) * plateau.mult)
                print(f'plateau: reducing learning rate (metric {monitored:.4f})')
            lr_now = lr_g0 * plateau.mult
        else:
            lr_now = lr_g0 * float(lr_sched(int(jax.device_get(state.step))))
        print(f'learning rate = {lr_now:.7f}')
        print(f'End of epoch {epoch} / {n_epochs + n_epochs_decay} \t '
              f'Time Taken: {time.time() - epoch_start:.0f} sec')

    _save_state(save_dir, state, 'latest', getattr(opt, 'remote_transfer_cmd', None), getattr(opt, 'checkpoint_format', 'npz'))
    visualizer.plot_to_png()
    return state, metrics


def _save_state(save_dir, state, suffix, remote_transfer_cmd=None,
                checkpoint_format='npz'):
    params = {}
    params.update(state.g_params)
    params.update(state.d_params)
    checkpoints.save_networks(save_dir, params, suffix)
    if checkpoint_format == 'orbax':
        try:
            checkpoints.save_networks_orbax(save_dir, params, suffix)
        except Exception as e:
            print(f'orbax checkpoint failed ({e}); npz checkpoint written')
    optim_path = os.path.join(save_dir, f'{suffix}_optim.npz')
    checkpoints.save_pytree(optim_path,
                            {'g': state.g_opt_state, 'd': state.d_opt_state,
                             'step': state.step})
    if remote_transfer_cmd:
        _remote_transfer(remote_transfer_cmd, save_dir, suffix, optim_path)


def _remote_transfer(cmd, save_dir, suffix, optim_path):
    """Invoke a user-supplied 'module.function(path)' on each saved file
    (reference --remote-transfer-cmd, base_model.py:49-56)."""
    import importlib
    try:
        mod_name, fn_name = cmd.rsplit('.', 1)
        fn = getattr(importlib.import_module(mod_name), fn_name)
    except Exception as e:
        print(f'remote-transfer-cmd {cmd!r} not loadable: {e}')
        return
    for f in sorted(os.listdir(save_dir)):
        if f.startswith(f'{suffix}_net_') or f == os.path.basename(optim_path):
            try:
                fn(os.path.join(save_dir, f))
            except Exception as e:
                print(f'remote transfer failed for {f}: {e}')


def _run_validation(opt, d, state, eval_fn, visualizer, epoch, rng):
    """Returns the mean validation losses dict (or None if no val set)."""
    try:
        dataset_val = create_dataset(opt, phase='val')
    except FileNotFoundError:
        print('with_val set but no val directory found; skipping validation')
        return None
    losses_acc = []
    outputs = {}
    gt_path = os.path.join(opt.dataroot, 'val', 'metrics.json')
    # seg outputs feed only the cell-count RMSE vs metrics.json — without
    # that ground truth the second (eager) generator forward per sample
    # would be pure waste on a platform with ~30 ms/op dispatch overhead.
    # RMSE is DeepLIIF/KD-only (seg + counts), like the reference
    # (cli.py:514); other families get val losses only.
    want_outputs = (os.path.exists(gt_path)
                    and getattr(opt, 'model', 'DeepLIIF')
                    in ('DeepLIIF', 'DeepLIIFKD'))
    for data in dataset_val:
        jbatch = _batch_to_device(data, d)
        m = eval_fn(state, jbatch, rng)
        losses_acc.append({k: float(np.mean(v)) for k, v in m.items()})
        if want_outputs:
            name = os.path.splitext(os.path.basename(data['A_paths'][0]))[0]
            mods, seg = dl.generator_forward(state.g_params, jbatch['A'], d)
            if seg is not None:
                outputs[name] = (np.asarray(jbatch['A'][0]),
                                 np.asarray(seg[0]))
    avg = None
    if losses_acc:
        avg = {k: float(np.mean([x[k] for x in losses_acc]))
               for k in losses_acc[0]}
        visualizer.plot_current_losses_val(epoch, avg)
    if os.path.exists(gt_path) and outputs:
        with open(gt_path) as f:
            gt = json.load(f)
        rmse = _cell_count_rmse(outputs, gt, getattr(opt, 'crop_size', 512),
                                opt.model)
        visualizer.plot_current_metrics(epoch, rmse)
        print('val cell-count RMSE:', rmse)
    return avg
