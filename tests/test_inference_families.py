"""Tiled inference through the engine for Ext / SDG / CycleGAN model dirs."""

import json

import numpy as np
import pytest
from PIL import Image

import jax

from deepliif_tpu.models import cyclegan as cg
from deepliif_tpu.models import deepliif_ext as ext
from deepliif_tpu.models import sdg as sdg_m
from deepliif_tpu.utils import checkpoints


def _img(w=100, h=80, seed=0):
    rng = np.random.default_rng(seed)
    return Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8))


@pytest.fixture(scope='module')
def ext_dir(tmp_path_factory):
    md = tmp_path_factory.mktemp('ext_model')
    d = ext.DeepLIIFExtDef(modalities_no=2, net_g=('resnet_6blocks',) * 2,
                           net_gs=('unet_32',) * 2, ngf=8, ndf=8,
                           loss_g_weights=(0.5, 0.5), loss_d_weights=(0.5, 0.5))
    params = ext.init_params(jax.random.PRNGKey(3), d, with_discriminators=False)
    checkpoints.save_networks(str(md), params)
    with open(md / 'config.json', 'w') as f:
        json.dump({'model': 'DeepLIIFExt', 'modalities_no': 2, 'seg_gen': True,
                   'seg_no': 2, 'input_no': 1, 'netG': 'resnet_6blocks',
                   'net_gs': 'unet_32', 'ngf': 8, 'norm': 'batch',
                   'no_dropout': False, 'padding': 'zero', 'scale_size': 64,
                   'seg_weights': [0.5, 0.5],
                   'modalities_names': ['mod0', 'mod1', 'mod2']}, f)
    return str(md)


def test_ext_inference_and_postprocess(ext_dir):
    from deepliif_tpu.models import infer_modalities
    images, scoring = infer_modalities(_img(), 64, ext_dir)
    assert {'mod1', 'mod2', 'Seg1', 'Seg2'} <= set(images)
    # Ext postprocess adds per-seg overlaid/refined + per-seg scoring
    assert 'Seg1_Overlaid' in images and 'Seg2_Refined' in images
    assert 'Seg1' in scoring and 'num_total' in scoring['Seg1']
    for im in images.values():
        assert im.size == (100, 80)


def test_sdg_inference(tmp_path):
    md = tmp_path / 'sdg_model'
    md.mkdir()
    d = sdg_m.SDGDef(modalities_no=2, input_no=2, net_g=('resnet_6blocks',) * 2,
                     ngf=8, loss_g_weights=(0.5, 0.5), loss_d_weights=(0.5, 0.5))
    params = sdg_m.init_params(jax.random.PRNGKey(4), d, with_discriminators=False)
    checkpoints.save_networks(str(md), params)
    with open(md / 'config.json', 'w') as f:
        json.dump({'model': 'SDG', 'modalities_no': 2, 'seg_gen': False,
                   'seg_no': 0, 'input_no': 2, 'netG': 'resnet_6blocks',
                   'ngf': 8, 'norm': 'batch', 'no_dropout': False,
                   'padding': 'zero', 'scale_size': 64,
                   'modalities_names': ['in1', 'in2', 'm1', 'm2']}, f)
    from deepliif_tpu.models import infer_modalities
    # SDG input: two modalities side by side (width = 2x)
    wide = Image.fromarray(np.concatenate(
        [np.asarray(_img(64, 64, 1)), np.asarray(_img(64, 64, 2))], axis=1))
    images, scoring = infer_modalities(wide, 64, str(md))
    assert set(images) == {'mod1', 'mod2'}
    assert scoring is None
    assert images['mod1'].size == (64, 64)


def test_cyclegan_inference(tmp_path):
    md = tmp_path / 'cg_model'
    md.mkdir()
    d = cg.CycleGANDef(modalities_no=1, net_g=('resnet_6blocks',), ngf=8,
                       loss_g_weights=(1.0,), loss_d_weights=(1.0,))
    params = cg.init_params(jax.random.PRNGKey(5), d, with_discriminators=False)
    checkpoints.save_networks(str(md), params)
    with open(md / 'config.json', 'w') as f:
        json.dump({'model': 'CycleGAN', 'modalities_no': 1, 'seg_gen': False,
                   'seg_no': 0, 'input_no': 1, 'netG': 'resnet_6blocks',
                   'ngf': 8, 'norm': 'batch', 'no_dropout': False,
                   'padding': 'zero', 'scale_size': 64, 'BtoA': False,
                   'modalities_names': ['m0', 'm1']}, f)
    from deepliif_tpu.models import inference
    images = inference(_img(64, 64), tile_size=64, overlap_size=0,
                       model_path=str(md))
    assert 'GA_1' in images  # raw net-name keys (reference behavior)
    assert images['GA_1'].size == (64, 64)
