"""wsi-cells path regressions: the marker modality must reach the cell
quantifier (reference infer_cells_for_wsi uses inference(seg_only=True),
whose output KEEPS the marker — models/__init__.py:853-875)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

import jax


@pytest.fixture(scope='module')
def model_and_slide(tmp_path_factory):
    from deepliif_tpu.models import deepliif as dl
    from deepliif_tpu.utils import checkpoints

    root = tmp_path_factory.mktemp('wsicells')
    md = root / 'model'
    md.mkdir()
    d = dl.DeepLIIFDef(modalities_no=2, net_g=('resnet_6blocks',) * 2,
                       net_gs=('unet_32',) * 3, ngf=8, ndf=8,
                       seg_weights=(0.4, 0.3, 0.3))
    params = dl.init_params(jax.random.PRNGKey(7), d,
                            with_discriminators=False)
    checkpoints.save_networks(str(md), params)
    with open(md / 'config.json', 'w') as f:
        json.dump({'model': 'DeepLIIF', 'modalities_no': 2, 'seg_gen': True,
                   'seg_no': 1, 'input_no': 1, 'netG': 'resnet_6blocks',
                   'net_gs': 'unet_32', 'ngf': 8, 'ndf': 8, 'norm': 'batch',
                   'no_dropout': False, 'padding': 'zero',
                   'upsample': 'convtranspose', 'scale_size': 64,
                   'seg_weights': [0.4, 0.3, 0.3],
                   'modalities_names': ['IHC', 'A', 'Marker']}, f)
    wsi_dir = root / 'wsi'
    wsi_dir.mkdir()
    rng = np.random.default_rng(3)
    slide = rng.integers(0, 255, (120, 120, 3), np.uint8)
    Image.fromarray(slide).save(wsi_dir / 'slide.png')
    return str(md), str(wsi_dir)


def test_wsi_cells_marker_reaches_quantifier(model_and_slide, tmp_path,
                                             monkeypatch):
    """v3/v4 cell data quantifies marker intensity from the inferred
    Marker modality; regression for the seg_only filter that deleted it
    (silent marker=0 for every cell)."""
    from deepliif_tpu import postprocessing as pp
    from deepliif_tpu.utils.wsi import infer_cells_for_wsi

    md, wsi_dir = model_and_slide
    seen_markers = []
    real = pp.compute_cell_results

    def spy(seg, marker, resolution, version=3, **kw):
        seen_markers.append(marker)
        return real(seg, marker, resolution, version=version, **kw)

    monkeypatch.setattr(pp, 'compute_cell_results', spy)
    out = tmp_path / 'out'
    results = infer_cells_for_wsi(wsi_dir, 'slide.png', str(out), md,
                                  tile_size=64, region_size=128, version=4)
    assert seen_markers and all(m is not None for m in seen_markers)
    assert results['dataVersion'] == 4
    assert os.path.exists(out / 'slide_cells.json')


def test_parse_multipart_preserves_binary_tails():
    """Part content ending in CR/LF bytes or '--' must come through
    byte-exact (only the delimiter's own CRLF is removed)."""
    from deepliif_tpu.serve import parse_multipart

    for payload in (b'abc\r\n', b'abc\n\n', b'abc--', b'abc\r', b''):
        body = (b'--BND\r\n'
                b'Content-Disposition: form-data; name="img"; '
                b'filename="x.bin"\r\n'
                b'Content-Type: application/octet-stream\r\n\r\n'
                + payload +
                b'\r\n--BND--\r\n')
        fields = parse_multipart(body, 'multipart/form-data; boundary=BND')
        assert fields['img'] == payload, payload


def test_dispatch_close_fails_fast(model_and_slide):
    """run_tiles after close() raises instead of hanging forever on a
    dead dispatcher thread; queued work is resolved on shutdown."""
    from deepliif_tpu.models import InferenceSession
    from deepliif_tpu.serve.dispatch import DispatchSession

    md, _ = model_and_slide
    ds = DispatchSession(InferenceSession(md, n_devices=1))
    tiles = np.zeros((1, 64, 64, 3), np.uint8)
    out = ds.run_tiles(tiles)
    assert out
    ds.close()
    with pytest.raises(RuntimeError, match='closed'):
        ds.run_tiles(tiles)
