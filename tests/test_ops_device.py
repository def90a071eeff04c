"""On-device quantification: counts must match the host (reference-parity)
pipeline on random masks and the golden tiles."""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from deepliif_tpu import postprocessing as pp
from deepliif_tpu.ops import (flood_background, label_components,
                              overlay_images, posneg_mask, quantify,
                              label_components_pallas)


def test_label_components_matches_scipy():
    from scipy import ndimage
    rng = np.random.default_rng(0)
    fg = rng.random((80, 100)) < 0.35
    lab = np.asarray(label_components(jnp.asarray(fg)))
    lab_s, n_s = ndimage.label(fg, structure=np.ones((3, 3), bool))
    assert len(np.unique(lab)) - 1 == n_s
    nz = fg.ravel()
    pairs = set(zip(lab.ravel()[nz].tolist(), lab_s.ravel()[nz].tolist()))
    assert len(pairs) == n_s  # bijection


def test_flood_background_matches_host():
    seg = np.zeros((40, 40, 3), np.uint8)
    seg[10:20, 10:20] = (200, 0, 0)
    seg[15, 15] = (0, 100, 0)  # hole -> unknown enclosed
    host = pp.create_posneg_mask(seg, 120)
    pp.mark_background(host)
    dev = np.asarray(flood_background(posneg_mask(jnp.asarray(seg), 120)))
    np.testing.assert_array_equal(dev, host)


@pytest.mark.parametrize('seed', [0, 1])
def test_quantify_counts_match_host(seed):
    rng = np.random.default_rng(seed)
    seg = np.zeros((96, 96, 3), np.uint8)
    # scatter random blobs
    for _ in range(12):
        y, x = rng.integers(5, 85, 2)
        r = rng.integers(2, 7)
        color = (200, 0, 0) if rng.random() < 0.5 else (0, 0, 200)
        seg[max(0, y - r):y + r, max(0, x - r):x + r] = color
    dev = jax.jit(lambda s: quantify(s, seg_thresh=120, noise_thresh=4,
                                     large_noise_thresh=16000))(jnp.asarray(seg))
    # counts from the host pipeline
    _, _, scoring = pp.compute_final_results(
        np.zeros_like(seg), seg, None, '40x', size_thresh=0, seg_thresh=120)
    assert int(dev['num_total']) == scoring['num_total']
    assert int(dev['num_pos']) == scoring['num_pos']
    assert int(dev['num_neg']) == scoring['num_neg']


def test_quantify_golden_tile_counts():
    import os
    src = '/root/reference/Datasets/Sample_Dataset/val'
    if not os.path.isdir(src):
        pytest.skip('reference dataset absent')
    img = Image.open(os.path.join(src, 'Lung1.png'))
    w, h = img.size
    gt = np.asarray(img.crop((w - h, 0, w, h)).convert('RGB'))
    # size_thresh=78 = the golden default for this tile
    dev = quantify(jnp.asarray(gt), seg_thresh=150, size_thresh=78)
    assert int(dev['num_total']) == 60
    assert int(dev['num_pos']) == 11
    assert int(dev['num_neg']) == 49


def test_overlay_images_shapes():
    seg = np.zeros((32, 32, 3), np.uint8)
    seg[5:12, 5:12] = (200, 0, 0)
    dev = quantify(jnp.asarray(seg), seg_thresh=120, size_thresh=0)
    overlay, refined = overlay_images(jnp.zeros((32, 32, 3), jnp.uint8),
                                      dev['class_image'])
    overlay, refined = np.asarray(overlay), np.asarray(refined)
    assert (refined[..., 0] > 0).any()      # positive fill
    assert (refined[..., 1] > 0).any()      # boundary
    assert (overlay == [255, 0, 0]).all(-1).any()  # red outline


def test_mesh_sharded_labeling_matches_single_device():
    """Mesh-sharded labeling (halo-exchange sweeps over the 8-device mesh)
    produces IDENTICAL labels to the single-device path — the cross-device
    quantification building block for WSI-scale canvases."""
    from deepliif_tpu import parallel
    rng = np.random.default_rng(7)
    fg = rng.random((48, 64)) < 0.45
    mesh = parallel.get_mesh(8)
    ref8 = np.asarray(label_components(jnp.asarray(fg), conn8=True))
    out8 = np.asarray(label_components(jnp.asarray(fg), conn8=True,
                                       mesh=mesh, sweeps_per_jump=4))
    np.testing.assert_array_equal(out8, ref8)
    ref4 = np.asarray(label_components(jnp.asarray(fg), conn8=False))
    out4 = np.asarray(label_components(jnp.asarray(fg), conn8=False,
                                       mesh=mesh, sweeps_per_jump=4))
    np.testing.assert_array_equal(out4, ref4)


def test_mesh_sharded_full_quantifier_matches_single_device():
    """compute_final_results_device with a forced mesh: counts, thresholds
    and both result images byte-equal to the single-device program."""
    import os
    from deepliif_tpu import parallel
    from deepliif_tpu.ops.labeling import compute_final_results_device
    src = '/root/reference/Datasets/Sample_Dataset/test_DeepLIIF_results'
    segs = sorted(f for f in os.listdir(src) if f.endswith('_fake_B_5.png'))
    seg = np.asarray(Image.open(os.path.join(src, segs[0])).convert('RGB'))
    marker = np.asarray(Image.open(os.path.join(
        src, segs[0].replace('_fake_B_5', '_fake_B_4'))).convert('L'))
    orig = np.zeros_like(seg)

    ov1, rf1, sc1 = compute_final_results_device(orig, seg, marker, '40x',
                                                 mesh=None)
    mesh = parallel.get_mesh(8)
    ov8, rf8, sc8 = compute_final_results_device(orig, seg, marker, '40x',
                                                 mesh=mesh)
    assert sc8 == sc1
    np.testing.assert_array_equal(ov8, ov1)
    np.testing.assert_array_equal(rf8, rf1)


def test_pallas_labeling_interpret_matches():
    rng = np.random.default_rng(3)
    fg = rng.random((32, 64)) < 0.3
    ref = np.asarray(label_components(jnp.asarray(fg)))
    pal = np.asarray(label_components_pallas(jnp.asarray(fg), interpret=True))
    np.testing.assert_array_equal(ref, pal)


def test_pallas_labeling_conn4_interpret_matches():
    """4-connectivity (the background-flood mask) through the Pallas sweep
    kernel matches the XLA path."""
    rng = np.random.default_rng(5)
    fg = rng.random((48, 40)) < 0.55
    ref = np.asarray(label_components(jnp.asarray(fg), conn8=False))
    pal = np.asarray(label_components_pallas(jnp.asarray(fg), conn8=False,
                                             interpret=True))
    np.testing.assert_array_equal(ref, pal)


def test_device_auto_thresholds_match_host():
    from deepliif_tpu.ops.labeling import (auto_marker_threshold,
                                           auto_size_threshold)
    import os
    src = '/root/reference/Datasets/Sample_Dataset/val'
    if os.path.isdir(src):
        img = Image.open(os.path.join(src, 'Lung1.png'))
        w, h = img.size
        gt = img.crop((w - h, 0, w, h))
        mask, cells, lab, defaults = pp.get_cells_info(gt, None, '40x', 4, 150,
                                                       16000)
        sizes = np.zeros(512 * 512 + 1, np.int32)
        for i, c in enumerate(cells, start=1):
            sizes[i] = c[0]
        dev = int(auto_size_threshold(jnp.asarray(sizes), '40x'))
        assert dev == defaults['size_thresh'] == 78
    rng = np.random.default_rng(0)
    mk = rng.integers(0, 255, (200, 200)).astype(np.uint8)
    mk[rng.random((200, 200)) < 0.3] = 0
    host = pp.calculate_default_marker_threshold(mk)
    dev = int(auto_marker_threshold(jnp.asarray(mk)))
    assert abs(host - dev) <= 1


def test_compute_final_results_device_matches_host_golden():
    """Full device orchestrator (auto KDE size threshold included) matches
    the host compute_final_results scoring on the golden val tiles."""
    import os
    from deepliif_tpu.ops.labeling import compute_final_results_device
    src = '/root/reference/Datasets/Sample_Dataset/val'
    if not os.path.isdir(src):
        pytest.skip('reference dataset absent')
    for name, expected in (('Lung1', (60, 11, 49)), ('Bladder1', (183, 15, 168))):
        img = Image.open(os.path.join(src, f'{name}.png'))
        w, h = img.size
        gt = np.asarray(img.crop((w - h, 0, w, h)).convert('RGB'))
        orig = np.asarray(img.crop((0, 0, h, h)).convert('RGB'))
        ho, hr, hs = pp.compute_final_results(orig, gt, None, '40x',
                                              seg_thresh=150)
        do, dr, ds = compute_final_results_device(orig, gt, None, '40x',
                                                  seg_thresh=150)
        assert (ds['num_total'], ds['num_pos'], ds['num_neg']) == \
               (hs['num_total'], hs['num_pos'], hs['num_neg'])
        assert ds['size_thresh'] == hs['size_thresh']
        # refined masks agree on cell interiors up to the host's sequential
        # quirk of border-labeling each kept cell's seed pixel (one pixel
        # per cell leaves the fill and joins the boundary there)
        dev_red = int((dr[..., 0] > 0).sum())
        host_red = int((hr[..., 0] > 0).sum())
        assert abs(dev_red - host_red) <= ds['num_total'], (dev_red, host_red)


def test_compute_final_results_device_padding_invariance():
    """The 256-multiple padding inside the device path must not change
    counts."""
    from deepliif_tpu.ops.labeling import compute_final_results_device
    rng = np.random.default_rng(0)
    seg = np.zeros((130, 190, 3), np.uint8)
    for _ in range(8):
        y, x = rng.integers(10, 110, 2)
        r = rng.integers(3, 8)
        color = (220, 0, 0) if rng.random() < 0.5 else (0, 0, 220)
        seg[y - r:y + r, x - r:x + r] = color
    orig = rng.integers(0, 255, (130, 190, 3), np.uint8)
    _, _, hs = pp.compute_final_results(orig, seg, None, '40x', seg_thresh=120)
    do, dr, ds = compute_final_results_device(orig, seg, None, '40x',
                                              seg_thresh=120)
    assert do.shape == orig.shape
    assert (ds['num_total'], ds['num_pos'], ds['num_neg']) == \
           (hs['num_total'], hs['num_pos'], hs['num_neg'])


def test_device_stitch_matches_host():
    """ownership_maps gather == stitch_batch paste for overlapped tilings."""
    from deepliif_tpu.utils.tiler import InferenceTiler
    rng = np.random.default_rng(2)
    for (h, w, ts, ov) in [(130, 190, 64, 4), (64, 64, 64, 4), (100, 257, 64, 8)]:
        img = rng.integers(0, 255, (h, w, 3), np.uint8)
        tiler = InferenceTiler(img, ts, ov)
        tiles = tiler.tiles()
        tiler.stitch_batch('k', tiles)
        host = tiler.results()['k']
        tile_idx, ty, tx = tiler.ownership_maps()
        dev = np.asarray(jnp.asarray(tiles)[tile_idx, ty[:, None], tx[None, :]])
        dev = dev[:tiler.orig_height, :tiler.orig_width]
        np.testing.assert_array_equal(dev, host, err_msg=str((h, w, ts, ov)))


def test_infer_modalities_device_quant(tmp_path):
    """device_quant=True produces the same scoring as the host path."""
    import json
    import os
    from deepliif_tpu.models import deepliif as dl
    from deepliif_tpu.models import infer_modalities
    from deepliif_tpu.utils import checkpoints

    md = tmp_path / 'model'
    md.mkdir()
    d = dl.DeepLIIFDef(modalities_no=2, net_g=('resnet_6blocks',) * 2,
                       net_gs=('unet_32',) * 3, ngf=8, ndf=8,
                       seg_weights=(0.4, 0.3, 0.3))
    params = dl.init_params(jax.random.PRNGKey(7), d, with_discriminators=False)
    checkpoints.save_networks(str(md), params)
    with open(md / 'config.json', 'w') as f:
        json.dump({'model': 'DeepLIIF', 'modalities_no': 2, 'seg_gen': True,
                   'seg_no': 1, 'input_no': 1, 'netG': 'resnet_6blocks',
                   'net_gs': 'unet_32', 'ngf': 8, 'ndf': 8, 'norm': 'batch',
                   'no_dropout': False, 'padding': 'zero',
                   'upsample': 'convtranspose', 'scale_size': 64,
                   'seg_weights': [0.4, 0.3, 0.3],
                   'modalities_names': ['IHC', 'ModA', 'Marker']}, f)
    rng = np.random.default_rng(1)
    img = Image.fromarray(rng.integers(0, 255, (96, 128, 3), np.uint8))
    _, host_score = infer_modalities(img, 64, str(md))
    images, dev_score = infer_modalities(img, 64, str(md), device_quant=True)
    for k in ('num_total', 'num_pos', 'num_neg', 'percent_pos'):
        assert dev_score[k] == host_score[k], (k, dev_score, host_score)
    assert 'SegOverlaid' in images and 'SegRefined' in images


def test_fused_device_seg_pipeline(tmp_path):
    """device_quant=True runs the fused path: seg tiles stay on device, are
    stitched there via ownership_maps, and feed the device quantifier with
    no host round-trip. Outputs ('Seg' image bytes, scoring) must equal the
    host path exactly."""
    import json
    from types import SimpleNamespace

    import jax
    from PIL import Image

    from deepliif_tpu.models import deepliif as dl, infer_modalities
    from deepliif_tpu.utils import checkpoints

    md = tmp_path / 'model'
    md.mkdir()
    d = dl.DeepLIIFDef(modalities_no=2, net_g=('resnet_6blocks',) * 2,
                       net_gs=('unet_32',) * 3, ngf=8, ndf=8,
                       seg_weights=(0.4, 0.3, 0.3))
    params = dl.init_params(jax.random.PRNGKey(7), d,
                            with_discriminators=False)
    checkpoints.save_networks(str(md), params)
    json.dump({'model': 'DeepLIIF', 'modalities_no': 2, 'seg_gen': True,
               'seg_no': 1, 'input_no': 1, 'netG': 'resnet_6blocks',
               'net_gs': 'unet_32', 'ngf': 8, 'ndf': 8, 'norm': 'batch',
               'no_dropout': False, 'padding': 'zero',
               'upsample': 'convtranspose', 'scale_size': 64,
               'seg_weights': [0.4, 0.3, 0.3],
               'modalities_names': ['IHC', 'ModA', 'Marker'],
               'background_colors': [(201, 211, 208), (10, 10, 10)]},
              open(md / 'config.json', 'w'))

    rng = np.random.default_rng(3)
    img = Image.fromarray(rng.integers(0, 255, (100, 150, 3), np.uint8))

    host_images, host_scoring = infer_modalities(img, 64, str(md),
                                                 device_quant=False)
    dev_images, dev_scoring = infer_modalities(img, 64, str(md),
                                               device_quant=True)

    assert set(host_images) == set(dev_images)
    np.testing.assert_array_equal(np.asarray(host_images['Seg']),
                                  np.asarray(dev_images['Seg']))
    for k in ('num_total', 'num_pos', 'num_neg', 'percent_pos'):
        assert host_scoring[k] == dev_scoring[k], (k, host_scoring,
                                                   dev_scoring)


def test_mesh_sharded_labeling_rejects_thin_shards():
    """Shard width below the halo would produce an opaque shard_map shape
    error; the guard raises a clear ValueError instead."""
    from deepliif_tpu import parallel
    from deepliif_tpu.ops.labeling import label_components

    mesh = parallel.get_mesh(8)
    fg = jnp.zeros((16, 64), bool)  # shard width 8 < default halo 32
    with pytest.raises(ValueError, match='shard width'):
        label_components(fg, mesh=mesh)
