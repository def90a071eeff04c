"""MIRAX (.mrxs) container reading (deepliif_tpu.utils.mirax).

The reference reaches .mrxs through Bio-Formats (util/__init__.py:500-556);
here the documented container layout is read natively. Fixtures come from
tests/mirax_fixture.py."""

import numpy as np
import pytest

from deepliif_tpu.utils.wsi import WSIReader
from mirax_fixture import write_mrxs


def _mosaic(cameras=(2, 2), divisions=2, tile=(32, 32), overlap=8,
            smooth=False):
    """Ground-truth canvas + the tile crops that tile it.

    Cameras sit on a (cam_span - overlap) stride grid; subtiles within a
    camera are contiguous, so adjacent-camera overlap pixels repeat the
    same canvas content (what a real scanner's registration produces)."""
    cx_n, cy_n = cameras
    tw, th = tile
    span_x, span_y = divisions * tw, divisions * th
    sx, sy = span_x - overlap, span_y - overlap
    w = sx * (cx_n - 1) + span_x
    h = sy * (cy_n - 1) + span_y
    if smooth:
        yy, xx = np.mgrid[0:h, 0:w]
        canvas = np.stack([(xx * 255 // max(w - 1, 1)),
                           (yy * 255 // max(h - 1, 1)),
                           ((xx + yy) * 255 // max(w + h - 2, 1))],
                          axis=-1).astype(np.uint8)
    else:
        canvas = np.random.default_rng(7).integers(
            0, 255, (h, w, 3)).astype(np.uint8)
    positions = {(cx, cy): (cx * sx, cy * sy)
                 for cy in range(cy_n) for cx in range(cx_n)}
    tiles = {}
    for (cx, cy), (px, py) in positions.items():
        for dy in range(divisions):
            for dx in range(divisions):
                gx, gy = cx * divisions + dx, cy * divisions + dy
                x0, y0 = px + dx * tw, py + dy * th
                tiles[(gx, gy)] = canvas[y0:y0 + th, x0:x0 + tw]
    return canvas, tiles, positions


def test_region_reads_match_canvas(tmp_path):
    canvas, tiles, positions = _mosaic()
    path = str(tmp_path / 'slide.mrxs')
    write_mrxs(path, tiles, (2, 2), (32, 32), divisions=2, overlap=(8, 8),
               positions=positions)
    r = WSIReader(path)
    assert r.size == (canvas.shape[1], canvas.shape[0])
    assert np.array_equal(r.read_region(0, 0, *r.size), canvas)
    # interior region crossing camera and subtile boundaries
    assert np.array_equal(r.read_region(25, 17, 60, 70),
                          canvas[17:87, 25:85])
    info = r.get_information()
    assert info['magnification'] == 20.0
    r.close()


def test_missing_tile_renders_fill_color(tmp_path):
    canvas, tiles, positions = _mosaic()
    del tiles[(1, 1)]  # subtile of camera (0, 0)
    path = str(tmp_path / 'slide.mrxs')
    write_mrxs(path, tiles, (2, 2), (32, 32), divisions=2, overlap=(8, 8),
               positions=positions, fill_bgr=0x0000FF)  # BGR -> red fill
    r = WSIReader(path)
    out = r.read_region(0, 0, *r.size)
    assert np.all(out[40:56, 40:56] == (255, 0, 0))  # hole, no overlap zone
    assert np.array_equal(out[:32, :32], canvas[:32, :32])
    r.close()


def test_overlap_grid_fallback_without_position_buffer(tmp_path):
    canvas, tiles, _ = _mosaic()
    path = str(tmp_path / 'slide.mrxs')
    write_mrxs(path, tiles, (2, 2), (32, 32), divisions=2, overlap=(8, 8),
               positions=None)
    r = WSIReader(path)
    assert r.size == (canvas.shape[1], canvas.shape[0])
    assert np.array_equal(r.read_region(0, 0, *r.size), canvas)
    r.close()


def test_raw_position_buffer_and_bmp_tiles(tmp_path):
    canvas, tiles, positions = _mosaic(divisions=1, tile=(64, 64))
    path = str(tmp_path / 'slide.mrxs')
    write_mrxs(path, tiles, (2, 2), (64, 64), overlap=(8, 8),
               positions=positions, raw_position_buffer=True,
               image_format='BMP24')
    r = WSIReader(path)
    assert np.array_equal(r.read_region(0, 0, *r.size), canvas)
    r.close()


def test_jpeg_tiles_decode_close(tmp_path):
    canvas, tiles, positions = _mosaic(smooth=True)
    path = str(tmp_path / 'slide.mrxs')
    write_mrxs(path, tiles, (2, 2), (32, 32), divisions=2, overlap=(8, 8),
               positions=positions, image_format='JPEG')
    r = WSIReader(path)
    out = r.read_region(0, 0, *r.size)
    assert np.mean(np.abs(out.astype(int) - canvas.astype(int))) < 3.0
    r.close()


def test_paged_index_chain(tmp_path):
    canvas, tiles, positions = _mosaic()
    path = str(tmp_path / 'slide.mrxs')
    write_mrxs(path, tiles, (2, 2), (32, 32), divisions=2, overlap=(8, 8),
               positions=positions, page_size=3)  # 16 tiles -> 6 pages
    r = WSIReader(path)
    assert np.array_equal(r.read_region(0, 0, *r.size), canvas)
    r.close()


def test_missing_container_dir_raises_clearly(tmp_path):
    from PIL import Image
    path = str(tmp_path / 'orphan.mrxs')
    Image.new('RGB', (8, 8)).save(path, 'BMP')
    with pytest.raises(ValueError, match='container directory missing'):
        WSIReader(path)


def test_wsi_inference_end_to_end_on_mrxs(tmp_path):
    """`test-wsi` over a .mrxs container: region streaming + stitching +
    scoring run unchanged on the MIRAX reader (the format only changes
    WSIReader's dispatch)."""
    import json
    import os
    import jax
    from deepliif_tpu.models import deepliif as dl
    from deepliif_tpu.utils import checkpoints
    from deepliif_tpu.utils.wsi import infer_results_for_wsi

    md = tmp_path / 'model'
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
                   'modalities_names': ['IHC', 'A', 'B'],
                   'background_colors': [(201, 211, 208), (10, 10, 10)]}, f)

    _, tiles, positions = _mosaic()  # 120x120 slide
    wsi_dir = tmp_path / 'wsi'
    wsi_dir.mkdir()
    write_mrxs(str(wsi_dir / 'slide.mrxs'), tiles, (2, 2), (32, 32),
               divisions=2, overlap=(8, 8), positions=positions)

    out = tmp_path / 'out'
    scoring = infer_results_for_wsi(str(wsi_dir), 'slide.mrxs', str(out),
                                    str(md), tile_size=64, region_size=128)
    assert {'num_total', 'num_pos', 'num_neg', 'percent_pos'} <= set(scoring)
    files = os.listdir(out)
    assert any(f.startswith('slide_Seg') and f.endswith('.ome.tiff')
               for f in files), files
    assert 'slide.json' in files


def test_wsi_resolution_from_mrxs_metadata(tmp_path):
    from deepliif_tpu.utils.wsi import get_wsi_resolution
    _, tiles, positions = _mosaic()
    path = str(tmp_path / 'slide.mrxs')
    write_mrxs(path, tiles, (2, 2), (32, 32), divisions=2, overlap=(8, 8),
               positions=positions, magnification=40.0)
    assert get_wsi_resolution(path) == 512
