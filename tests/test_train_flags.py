"""Observability tests for the train/eval/wsi plumbing flags:
--save-by-iter, lr-policy=plateau, eval --seg-weights, test-wsi
--seg-intermediate (VERDICT round-1 item 7)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

import jax

from deepliif_tpu.config import Options, TRAIN_DEFAULTS
from deepliif_tpu.train_loop import (PlateauController, _set_injected_lr,
                                     train_model)


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
        name='flags',
        checkpoints_dir=str(tmp_path / 'ckpt'),
        model='DeepLIIF', modalities_no=2, seg_gen=True, seg_no=1,
        netG='resnet_6blocks', net_g='resnet_6blocks',
        net_gs='unet_32', netD='n_layers', net_d='n_layers',
        ngf=8, ndf=8,
        load_size=64, crop_size=64, scale_size=64,
        n_epochs=1, n_epochs_decay=0,
        seg_weights=[0.4, 0.3, 0.3],
        loss_G_weights=[1 / 3] * 3, loss_D_weights=[1 / 3] * 3,
        seed=0, print_freq=1, save_epoch_freq=1,
        batch_size=1, num_threads=0,
    ))
    p.update(over)
    return Options(d_params=p, mode='train')


def test_plateau_controller_reduces_after_patience():
    """mode=min, rel threshold 0.01, patience 5, factor 0.2 (reference
    networks.py:74-75)."""
    c = PlateauController()
    assert c.step(1.0) is False  # sets best
    reduced_at = None
    for i in range(1, 8):
        if c.step(1.0):  # no improvement
            reduced_at = i
            break
    assert reduced_at == 6  # patience 5 -> reduce on the 6th bad epoch
    assert c.mult == pytest.approx(0.2)
    # a real improvement resets the counter
    assert c.step(0.5) is False
    assert c.num_bad == 0


def test_plateau_training_injects_lr(tmp_path):
    """lr_policy=plateau builds an inject_hyperparams optimizer whose LR the
    host can rescale without recompiling; one epoch must train."""
    _write_rows(str(tmp_path / 'data' / 'train'), 4)
    opt = _opt(tmp_path, lr_policy='plateau')
    state, metrics = train_model(opt)
    assert np.isfinite(float(metrics['loss_G']))
    assert hasattr(state.g_opt_state, 'hyperparams')
    lr0 = float(np.asarray(state.g_opt_state.hyperparams['learning_rate']))
    _set_injected_lr(state, lr0 * 0.2, lr0 * 0.2)
    lr1 = float(np.asarray(state.g_opt_state.hyperparams['learning_rate']))
    assert lr1 == pytest.approx(lr0 * 0.2)


def test_save_by_iter_checkpoints(tmp_path):
    """--save-by-iter writes iter_<N> snapshots instead of overwriting latest
    (reference cli.py:472-475)."""
    _write_rows(str(tmp_path / 'data' / 'train'), 4, count=2)
    opt = _opt(tmp_path, save_by_iter=True, save_latest_freq=1)
    train_model(opt)
    exp = tmp_path / 'ckpt' / 'flags'
    assert (exp / 'iter_1_net_G.npz').exists()
    assert (exp / 'iter_2_net_G.npz').exists()
    # the end-of-epoch saves still write latest
    assert (exp / 'latest_net_G.npz').exists()


@pytest.fixture(scope='module')
def tiny_model_dir(tmp_path_factory):
    from deepliif_tpu.models import deepliif as dl
    from deepliif_tpu.utils import checkpoints
    md = tmp_path_factory.mktemp('tiny_model_flags')
    d = dl.DeepLIIFDef(
        modalities_no=2, net_g=('resnet_6blocks',) * 2, net_gs=('unet_32',) * 3,
        ngf=8, ndf=8, seg_weights=(0.4, 0.3, 0.3))
    params = dl.init_params(jax.random.PRNGKey(7), d, with_discriminators=False)
    checkpoints.save_networks(str(md), params)
    with open(md / 'config.json', 'w') as f:
        json.dump({
            'model': 'DeepLIIF', 'modalities_no': 2, 'seg_gen': True,
            'seg_no': 1, 'input_no': 1, 'netG': 'resnet_6blocks',
            'net_gs': 'unet_32', 'ngf': 8, 'ndf': 8, 'norm': 'batch',
            'no_dropout': False, 'padding': 'zero',
            'upsample': 'convtranspose', 'scale_size': 64,
            'seg_weights': [0.4, 0.3, 0.3],
            'modalities_names': ['IHC', 'ModA', 'Marker'],
            'background_colors': [(201, 211, 208), (10, 10, 10)],
        }, f)
    return str(md)


def test_eval_seg_weights_changes_output(tiny_model_dir, tmp_path):
    """eval --seg-weights must actually reach the ensemble aggregation."""
    from click.testing import CliRunner
    from deepliif_tpu.cli import cli

    dataroot = tmp_path / 'ds'
    _write_rows(str(dataroot / 'test'), 4, count=1)
    runner = CliRunner()
    outs = {}
    for tag, w in (('a', '1,0,0'), ('b', '0,0,1')):
        out_dir = tmp_path / f'eval_{tag}'
        res = runner.invoke(cli, [
            'eval', '--dataroot', str(dataroot), '--model-dir', tiny_model_dir,
            '--output-dir', str(out_dir), '--num-test', '1',
            '--seg-weights', w], catch_exceptions=False)
        assert res.exit_code == 0, res.output
        seg_files = [f for f in os.listdir(out_dir) if 'fake_B_5' in f]
        assert seg_files, os.listdir(out_dir)
        outs[tag] = np.asarray(Image.open(out_dir / seg_files[0]))
    assert not np.array_equal(outs['a'], outs['b'])


def test_wsi_seg_intermediate_forwarded(tiny_model_dir, tmp_path):
    """test-wsi --seg-intermediate produces per-branch seg canvases."""
    from deepliif_tpu.utils.wsi import infer_results_for_wsi

    in_dir = tmp_path / 'wsi_in'
    os.makedirs(in_dir)
    rng = np.random.default_rng(3)
    Image.fromarray(rng.integers(0, 255, (64, 64, 3), np.uint8)).save(
        in_dir / 'slide.png')
    out_dir = tmp_path / 'wsi_out'
    infer_results_for_wsi(str(in_dir), 'slide.png', str(out_dir),
                          tiny_model_dir, tile_size=64,
                          seg_intermediate=True)
    names = os.listdir(out_dir)
    assert any('_s.' in n or '_s_' in n for n in names), names


def test_debug_mode_caps_epoch(tmp_path, capsys):
    """--debug stops each epoch at --debug-data-size iterations (reference
    cli.py:479-481)."""
    _write_rows(str(tmp_path / 'data' / 'train'), 4, count=6)
    opt = _opt(tmp_path, debug=True, debug_data_size=2, verbose=True,
               no_html=True)
    train_model(opt)
    out = capsys.readouterr().out
    assert 'debug mode, epoch 1 stopped at epoch iter 2' in out
    # --verbose prints per-net parameter counts
    assert '[network G:' in out and 'parameters:' in out
    # --no-html suppresses the gallery
    assert not os.path.exists(
        os.path.join(str(tmp_path / 'ckpt'), 'flags', 'web', 'index.html'))


def test_train_cli_flag_mapping():
    """--lr sets both optimizers; --n-layers-d maps to n_layers_D;
    torch-compat display/gpu flags are accepted and dropped."""
    from click.testing import CliRunner
    from deepliif_tpu.cli import cli as cli_group
    r = CliRunner().invoke(cli_group, ['train', '--help'])
    assert r.exit_code == 0
    for flag in ('--lr', '--init-type', '--n-layers-d', '--net-ds',
                 '--label-smoothing', '--dataset-mode', '--debug',
                 '--gpu-ids', '--display-port', '--no-html', '--verbose'):
        assert flag in r.output, flag


def test_n_layers_d_and_lambdas_survive_train_options():
    """Regression: train mode hard-assigned n_layers_D/lambda_L1/
    lambda_feat AFTER applying d_params, silently discarding the CLI's
    --n-layers-d and lambda flags."""
    from deepliif_tpu.config import Options, TRAIN_DEFAULTS
    p = dict(TRAIN_DEFAULTS)
    p.update(dataroot='/tmp/x', name='t', n_layers_D=3,
             lambda_L1=50.0, lambda_feat=25.0)
    opt = Options(d_params=p, mode='train')
    assert opt.n_layers_D == 3
    assert opt.lambda_L1 == 50.0 and opt.lambda_feat == 25.0
    # defaults still backfill when absent
    p2 = dict(TRAIN_DEFAULTS); p2.update(dataroot='/tmp/x', name='t')
    p2.pop('n_layers_D', None)
    opt2 = Options(d_params=p2, mode='train')
    assert opt2.n_layers_D == 4


def test_json_config_values_are_not_literal_reparsed(tmp_path):
    """JSON configs are already typed: an experiment named '2014' or
    'none' must stay a string (train_opt.txt strings still parse)."""
    import json
    from deepliif_tpu.config import Options
    cfg = tmp_path / 'config.json'
    json.dump({'model': 'DeepLIIF', 'dataroot': 'none',
               'remote_transfer_cmd': '2014.send',
               'modalities_no': 2, 'seg_gen': True, 'netG': 'resnet_6blocks',
               'net_gs': 'unet_32'}, open(cfg, 'w'))
    opt = Options(path_file=str(cfg), mode='test')
    # _literal would have turned these into None / a float
    assert opt.dataroot == 'none'
    assert opt.remote_transfer_cmd == '2014.send'
