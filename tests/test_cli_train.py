"""CLI training smoke tests on the reference sample dataset (tiny nets),
mirroring the reference tests/test_cli_train.py strategy: run the command,
assert success and checkpoint artifacts."""

import json
import os
import subprocess
import sys

import pytest

DATAROOT = '/root/reference/Datasets/Sample_Dataset'
requires_reference = pytest.mark.skipif(
    not os.path.isdir(DATAROOT), reason='reference sample dataset not present')


def _run_cli(args, cwd='/root/repo'):
    from conftest import cpu_subprocess_env
    env = cpu_subprocess_env(
        XLA_FLAGS='--xla_force_host_platform_device_count=1')
    return subprocess.run([sys.executable, '-m', 'deepliif_tpu.cli'] + args,
                          capture_output=True, text=True, env=env, cwd=cwd,
                          timeout=1200)


@requires_reference
def test_cli_train_one_epoch(tmp_path):
    ckpt = tmp_path / 'ckpt'
    res = _run_cli([
        'train',
        '--dataroot', DATAROOT,
        '--name', 'smoke',
        '--checkpoints-dir', str(ckpt),
        '--modalities-no', '4',
        '--net-g', 'resnet_6blocks',
        '--net-gs', 'unet_32',
        '--ngf', '8', '--ndf', '8',
        '--load-size', '64', '--crop-size', '64', '--scale-size', '64',
        '--n-epochs', '1', '--n-epochs-decay', '1',
        '--max-dataset-size', '2',
        '--seed', '0',
        '--print-freq', '1',
        '--save-epoch-freq', '1',
    ])
    assert res.returncode == 0, res.stderr[-3000:]
    exp = ckpt / 'smoke'
    assert (exp / 'latest_net_G.npz').exists()
    assert (exp / 'latest_net_GS.npz').exists()
    assert (exp / 'latest_net_D.npz').exists()
    assert (exp / 'train_opt.txt').exists()
    assert (exp / 'config.json').exists()
    assert (exp / 'loss_log.txt').exists()
    # training must be resumable from what it saved
    cfg = json.load(open(exp / 'config.json'))
    assert cfg['model'] == 'DeepLIIF'


@requires_reference
def test_cli_test_command(tmp_path):
    """Train 1 tiny epoch, then run `test` against the saved model dir."""
    ckpt = tmp_path / 'ckpt'
    res = _run_cli([
        'train', '--dataroot', DATAROOT, '--name', 'smoke2',
        '--checkpoints-dir', str(ckpt),
        '--modalities-no', '4', '--net-g', 'resnet_6blocks',
        '--net-gs', 'unet_32', '--ngf', '8', '--ndf', '8',
        '--load-size', '64', '--crop-size', '64', '--scale-size', '64',
        '--n-epochs', '1', '--n-epochs-decay', '1', '--max-dataset-size', '1',
        '--seed', '0',
    ])
    assert res.returncode == 0, res.stderr[-3000:]

    out = tmp_path / 'results'
    res = _run_cli([
        'test',
        '--input-dir', os.path.join(DATAROOT, 'test'),
        '--output-dir', str(out),
        '--tile-size', '64',
        '--model-dir', str(ckpt / 'smoke2'),
        '--filename-pattern', '6_2.png',
    ])
    assert res.returncode == 0, res.stderr[-3000:]
    files = os.listdir(out)
    assert any('Seg' in f for f in files), files
    assert any(f.endswith('.json') for f in files), files
