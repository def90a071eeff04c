"""import-model CLI: torch-era model dir -> native npz dir, parity-checked,
and usable by the inference engine afterwards."""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip('torch')


@pytest.fixture(scope='module')
def torch_model_dir(tmp_path_factory):
    """Synthetic reference-layout DeepLIIF dir: 2 resnet translators +
    3 unet seg nets saved as latest_net_*.pth + config.json."""
    from tests.test_torch_import import (torch_resnet_g, torch_unet_g,
                                         _rand_init)
    md = tmp_path_factory.mktemp('torch_model')
    for i in (1, 2):
        net = _rand_init(torch_resnet_g(3, 3, ngf=8, n_blocks=2))
        torch.save(net.state_dict(), md / f'latest_net_G{i}.pth')
    for i in range(3):
        net = _rand_init(torch_unet_g(3, 3, num_downs=5, ngf=8))
        torch.save(net.state_dict(), md / f'latest_net_GS{i}.pth')
    with open(md / 'config.json', 'w') as f:
        json.dump({
            'model': 'DeepLIIF', 'modalities_no': 2, 'seg_gen': True,
            'seg_no': 1, 'input_no': 1, 'netG': 'resnet_2blocks',
            'net_gs': 'unet_32', 'ngf': 8, 'ndf': 8, 'norm': 'batch',
            'no_dropout': False, 'padding': 'reflect',
            'upsample': 'convtranspose', 'scale_size': 32,
            'seg_weights': [0.4, 0.3, 0.3],
            'modalities_names': ['IHC', 'ModA', 'ModB'],
            'mod_id_seg': 'S', 'input_id': 0,
        }, f)
    return str(md)


def test_import_model_cli(torch_model_dir, tmp_path):
    from click.testing import CliRunner
    from deepliif_tpu.cli import cli

    out_dir = tmp_path / 'native'
    res = CliRunner().invoke(cli, [
        'import-model', '--torch-dir', torch_model_dir,
        '--output-dir', str(out_dir)], catch_exceptions=False)
    assert res.exit_code == 0, res.output
    assert 'parity check passed' in res.output
    assert (out_dir / 'latest_net_G.npz').exists() or \
           (out_dir / 'latest_net_G1.npz').exists(), os.listdir(out_dir)

    # the imported dir is a first-class model dir for the engine
    from deepliif_tpu.models import InferenceSession
    session = InferenceSession(str(out_dir))
    tiles = np.random.default_rng(0).integers(0, 255, (1, 32, 32, 3), np.uint8)
    out = session.run_tiles(tiles)
    assert 'GS' in out and out['GS'].shape == (1, 32, 32, 3)
