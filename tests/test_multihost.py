"""Multi-host smoke test: 2 jax.distributed CPU processes run trainlaunch
for one epoch; verifies (a) both ranks train to finite losses, (b) the
per-host rank::world loader striding splits indices disjointly — the
DistributedSampler-equivalent contract (reference cli.py:247-265,
data/__init__.py:82-84; here data/__init__.py:36-57).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r'''
import json, os, sys
import jax
jax.distributed.initialize(
    coordinator_address=os.environ['COORD'],
    num_processes=2,
    process_id=int(os.environ['PROC_ID']))
assert jax.process_count() == 2

from deepliif_tpu.config import Options, TRAIN_DEFAULTS
from deepliif_tpu.data import create_dataset
from deepliif_tpu.train_loop import train_model

p = dict(TRAIN_DEFAULTS)
p.update(dict(
    dataroot=os.environ['DATAROOT'], name='mh',
    checkpoints_dir=os.path.join(os.environ['OUT'], f"ckpt{os.environ['PROC_ID']}"),
    model='DeepLIIF', modalities_no=2, seg_gen=True, seg_no=1,
    netG='resnet_6blocks', net_g='resnet_6blocks', net_gs='unet_32',
    netD='n_layers', net_d='n_layers', ngf=8, ndf=8,
    load_size=64, crop_size=64, scale_size=64,
    n_epochs=1, n_epochs_decay=0, seg_weights=[0.4, 0.3, 0.3],
    loss_G_weights=[1/3]*3, loss_D_weights=[1/3]*3,
    seed=0, print_freq=1, save_epoch_freq=1, batch_size=1, num_threads=0,
))
opt = Options(d_params=p, mode='train')

# record which rows this rank sees (striding contract)
ds = create_dataset(opt, phase='train')
ds.set_epoch(1)
seen = [os.path.basename(b['A_paths'][0]) for b in ds]

state, metrics = train_model(opt)
out = {
    'rank': jax.process_index(),
    'world': jax.process_count(),
    'seen': seen,
    'loss_G': float(jax.numpy.mean(metrics['loss_G'])),
    'loss_D': float(jax.numpy.mean(metrics['loss_D'])),
    'steps': int(state.step),
}
with open(os.path.join(os.environ['OUT'], f"rank{os.environ['PROC_ID']}.json"), 'w') as f:
    json.dump(out, f)
print('RANK', out['rank'], 'OK', flush=True)
'''


def _free_port():
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_training(tmp_path):
    # 4 tiny training rows (1 input + 2 mods + 1 seg)
    train_dir = tmp_path / 'data' / 'train'
    os.makedirs(train_dir)
    rng = np.random.default_rng(0)
    for i in range(4):
        row = rng.integers(0, 255, (64, 64 * 4, 3), np.uint8)
        Image.fromarray(row).save(train_dir / f'r{i}.png')

    port = _free_port()
    from conftest import cpu_subprocess_env
    env_base = cpu_subprocess_env()
    env_base.update({
        'COORD': f'127.0.0.1:{port}',
        'DATAROOT': str(tmp_path / 'data'),
        'OUT': str(tmp_path),
        'XLA_FLAGS': '--xla_force_host_platform_device_count=1',
    })

    procs = []
    for pid in (0, 1):
        env = dict(env_base, PROC_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, '-c', WORKER], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=850)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    r0 = json.load(open(tmp_path / 'rank0.json'))
    r1 = json.load(open(tmp_path / 'rank1.json'))
    assert r0['world'] == r1['world'] == 2
    # disjoint, complete striding
    assert set(r0['seen']).isdisjoint(r1['seen'])
    assert len(r0['seen']) + len(r1['seen']) == 4
    for r in (r0, r1):
        assert np.isfinite(r['loss_G']) and np.isfinite(r['loss_D'])
        assert r['steps'] == 2  # 4 rows / 2 hosts / batch 1
    # DDP-equivalence: with the global (cross-process) mesh, gradients
    # all-reduce over the global batch, so both ranks — starting from the
    # same seeded init — must hold IDENTICAL parameters after training
    a = np.load(tmp_path / 'ckpt0' / 'mh' / 'latest_net_G.npz')
    b = np.load(tmp_path / 'ckpt1' / 'mh' / 'latest_net_G.npz')
    assert set(a.files) == set(b.files)
    for k in a.files:
        np.testing.assert_allclose(a[k], b[k], rtol=0, atol=0,
                                   err_msg=f'rank params diverged at {k}')
