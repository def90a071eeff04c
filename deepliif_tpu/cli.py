"""Command-line interface.

Same command surface as the reference click CLI (reference cli.py:66-1064):
train, trainlaunch, serialize, test, test-wsi, prepare-training-data,
prepare-testing-data, visualize — with TPU-native semantics:

  * multi-device is one code path (mesh data parallelism inside the jitted
    step), so `trainlaunch` configures jax.distributed for multi-host pods
    instead of re-exec'ing under torchrun;
  * `serialize` converts a model dir (torch .pth/.pt or native .npz) to the
    native stacked-npz format and runs an eager-vs-serialized parity check
    like the reference (sum|diff| <= 10, reference util/__init__.py:718-741);
  * determinism comes from jax PRNG keys; the --seed flag seeds data order
    and weights (reference cli.py:30-58 global-seed machinery not needed).
"""

from __future__ import annotations

import glob
import json
import os


import click
import numpy as np

from .config import Options, TRAIN_DEFAULTS, print_options, get_opt


def allowed_file(filename):
    excluding = ['Hema', 'DAPI', 'DAPILap2', 'Ki67', 'Seg', 'Marked',
                 'SegRefined', 'SegOverlaid', 'Marker', 'Lap2']
    name, ext = os.path.splitext(filename)
    return ext in ('.png', '.jpg', '.tif', '.jpeg') and \
        name.split('_')[-1] not in excluding


def ensure_exists(d):
    os.makedirs(d, exist_ok=True)


@click.group()
def cli():
    """DeepLIIF-TPU: TPU-native multitask cGAN for computational pathology."""


# ---------------------------------------------------------------------------
# train
# ---------------------------------------------------------------------------

@cli.command()
@click.option('--dataroot', required=True,
              help='path to images (should have subfolders train, val, etc.)')
@click.option('--name', default='experiment_name',
              help='name of the experiment, where to store samples and models')
@click.option('--checkpoints-dir', default='./checkpoints', help='models are saved here')
@click.option('--model', default='DeepLIIF',
              type=click.Choice(['DeepLIIF', 'DeepLIIFExt', 'SDG', 'CycleGAN', 'DeepLIIFKD']))
@click.option('--modalities-no', default=4, type=int, help='number of targets')
@click.option('--input-no', default=1, type=int,
              help='number of input modalities (SDG multi-input)')
@click.option('--seg-no', default=1, type=int, help='number of seg tiles per row')
@click.option('--seg-gen', default=True, type=bool, help='enable segmentation generators')
@click.option('--net-g', default='resnet_9blocks', help='generator architecture')
@click.option('--net-gs', default='unet_512', help='segmentation generator architecture')
@click.option('--net-d', default='n_layers', help='discriminator architecture')
@click.option('--ngf', default=64, type=int)
@click.option('--ndf', default=64, type=int)
@click.option('--norm', default='batch', help='batch | instance | none | spectral')
@click.option('--no-dropout', is_flag=True)
@click.option('--padding', default='zero', help='reflect | replicate | zero')
@click.option('--upsample', default='convtranspose',
              help='convtranspose | resize_conv | pixel_shuffle')
@click.option('--batch-size', default=1, type=int)
@click.option('--load-size', default=512, type=int)
@click.option('--crop-size', default=512, type=int)
@click.option('--scale-size', default=512, type=int)
@click.option('--preprocess', default='resize_and_crop')
@click.option('--no-flip', is_flag=True)
@click.option('--gan-mode', default='vanilla', help='vanilla | lsgan | wgangp')
@click.option('--gan-mode-s', default='lsgan', help='GAN mode for seg branch')
@click.option('--optimizer', default='adam')
@click.option('--beta1', default=0.5, type=float)
@click.option('--lr-g', default=0.0002, type=float)
@click.option('--lr-d', default=0.0002, type=float)
@click.option('--lr-policy', default='linear')
@click.option('--lr-decay-iters', default=50, type=int)
@click.option('--n-epochs', default=100, type=int)
@click.option('--n-epochs-decay', default=100, type=int)
@click.option('--epoch-count', default=1, type=int)
@click.option('--continue-train', is_flag=True)
@click.option('--epoch', default='latest')
@click.option('--seg-weights', default='', help='comma-separated seg weights')
@click.option('--loss-weights-g', default='', help='comma-separated G loss weights')
@click.option('--loss-weights-d', default='', help='comma-separated D loss weights')
@click.option('--seed', default=None, type=int)
@click.option('--with-val', is_flag=True, help='compute val losses + cell count metrics')
@click.option('--print-freq', default=100, type=int)
@click.option('--display-freq', default=400, type=int)
@click.option('--save-latest-freq', default=500, type=int)
@click.option('--save-by-iter', is_flag=True,
              help='save iter_<N> snapshots instead of overwriting latest')
@click.option('--save-epoch-freq', default=100, type=int)
@click.option('--max-dataset-size', default=None, type=int)
@click.option('--precision', default='float32', type=click.Choice(['float32', 'bfloat16']))
@click.option('--remote', default=False, type=bool, help='pickle plot snapshots for `visualize`')
@click.option('--remote-transfer-cmd', default=None,
              help='module.function invoked with each saved checkpoint path')
@click.option('--model-dir-teacher', default=None,
              help='teacher model dir (required for DeepLIIFKD)')
@click.option('--pool-size', default=50, type=int, help='CycleGAN image pool size')
@click.option('--lr', default=None, type=float,
              help='sets both --lr-g and --lr-d (reference single-lr flag)')
@click.option('--init-type', default='normal',
              help='normal | xavier | kaiming | orthogonal')
@click.option('--init-gain', default=0.02, type=float)
@click.option('--n-layers-d', default=4, type=int,
              help='PatchGAN depth (reference n_layers_D)')
@click.option('--net-ds', default='n_layers',
              help='Ext seg discriminator architecture')
@click.option('--input-nc', default=3, type=int)
@click.option('--output-nc', default=3, type=int)
@click.option('--label-smoothing', default=0.0, type=float,
              help='CycleGAN GAN-loss label smoothing')
@click.option('--modalities-names', default=None,
              help='comma-separated modality names')
@click.option('--num-threads', default=2, type=int, help='loader workers')
@click.option('--serial-batches', is_flag=True)
@click.option('--dataset-mode', default=None,
              help='aligned | unaligned | single (default by model)')
@click.option('--direction', default='AtoB', help='CycleGAN direction')
@click.option('--debug', is_flag=True,
              help='cap each epoch at --debug-data-size iterations')
@click.option('--debug-data-size', default=10, type=int)
@click.option('--verbose', is_flag=True, help='print parameter counts per net')
@click.option('--load-iter', default=0, type=int,
              help='resume from the iter_<N> checkpoint (with --save-by-iter)')
@click.option('--gpu-ids', default=None, help='ignored on TPU (torch compat)')
@click.option('--display-server', default=None, help='ignored (no visdom)')
@click.option('--display-port', default=None, help='ignored (no visdom)')
@click.option('--display-env', default=None, help='ignored (no visdom)')
@click.option('--display-id', default=None, help='ignored (no visdom)')
@click.option('--display-ncols', default=None, help='ignored (no visdom)')
@click.option('--display-winsize', default=None, help='ignored (no visdom)')
@click.option('--no-html', is_flag=True, help='skip HTML epoch galleries')
@click.option('--update-html-freq', default=None, type=int,
              help='ignored (galleries follow --display-freq)')
@click.option('--local-rank', default=None, help='ignored (torch DDP compat)')
@click.option('--checkpoint-format', default='npz',
              type=click.Choice(['npz', 'orbax']),
              help='checkpoint backend (orbax: atomic, async-capable)')
@click.option('--monitor-image', default=None,
              help='only display visuals for rows whose path ends with this')
def train(**kwargs):
    """Train a model (single chip or data-parallel over all local devices)."""
    d_params = dict(TRAIN_DEFAULTS)
    d_params.update({k: v for k, v in kwargs.items() if v is not None})
    m = d_params['modalities_no']
    model = d_params['model']

    # torch-compat flags accepted and dropped (reference cli.py surface)
    for ignored in ('gpu_ids', 'display_server', 'display_port',
                    'display_env', 'display_id', 'display_ncols',
                    'display_winsize', 'update_html_freq', 'local_rank'):
        if d_params.pop(ignored, None) is not None:
            click.echo(f'note: --{ignored.replace("_", "-")} is ignored on TPU')
    lr = d_params.pop('lr', None)
    if lr is not None:
        d_params['lr_g'] = d_params['lr_d'] = lr
    d_params['n_layers_D'] = d_params.pop('n_layers_d', 4)
    names = d_params.pop('modalities_names', None)
    if names:
        d_params['modalities_names'] = [s.strip() for s in names.split(',')]
    load_iter = d_params.pop('load_iter', 0)
    if load_iter:
        d_params['epoch'] = f'iter_{load_iter}'
        d_params['continue_train'] = True

    def default_weights(default):
        if model in ('DeepLIIF', 'DeepLIIFKD') and m == 4:
            return default
        if model in ('DeepLIIF', 'DeepLIIFKD'):
            return [1 / (m + 1)] * (m + 1)
        return [1 / m] * m

    for key, default in (('seg_weights', [0.25, 0.15, 0.25, 0.1, 0.25]),
                         ('loss_weights_g', [0.2] * 5),
                         ('loss_weights_d', [0.2] * 5)):
        val = d_params.get(key, '')
        d_params[key] = ([float(x) for x in val.split(',')] if val
                         else default_weights(default))
    d_params['loss_G_weights'] = d_params.pop('loss_weights_g')
    d_params['loss_D_weights'] = d_params.pop('loss_weights_d')
    d_params['netG'] = d_params['net_g']
    d_params['netD'] = d_params['net_d']
    d_params['phase'] = 'train'
    if not d_params.get('dataset_mode'):
        d_params['dataset_mode'] = ('unaligned' if model == 'CycleGAN'
                                    else 'aligned')

    # infer per-modality background colors from empty training tiles
    # (reference cli.py:326-331) — used by the inference empty-tile fill
    if model in ('DeepLIIF', 'DeepLIIFKD', 'DeepLIIFExt'):
        from .utils.background import infer_background_colors
        train_dir = os.path.join(d_params['dataroot'], 'train')
        if os.path.isdir(train_dir):
            colors = infer_background_colors(
                train_dir, input_no=d_params.get('input_no', 1),
                modalities_no=m, seg_no=d_params.get('seg_no', 1),
                return_list=True)
            if colors is not None:
                d_params['background_colors'] = colors

    opt = Options(d_params=d_params, mode='train')
    print_options(opt)

    from .train_loop import train_model
    train_model(opt)


@cli.command(context_settings=dict(ignore_unknown_options=True,
                                   allow_extra_args=True))
@click.pass_context
def trainlaunch(ctx):
    """Multi-host training launcher.

    The reference re-execs under torchrun for DDP (reference cli.py:697-758).
    On TPU pods each host runs the same program; this command initializes
    jax.distributed from the TPU environment and runs `train` with the
    remaining arguments.
    """
    import jax
    try:
        jax.distributed.initialize()
        click.echo(f'jax.distributed initialized: process {jax.process_index()} '
                   f'of {jax.process_count()}')
    except Exception as e:
        click.echo(f'jax.distributed not initialized ({e}); running single-host')
    cli.main(args=['train'] + list(ctx.args), standalone_mode=False)


# ---------------------------------------------------------------------------
# serialize
# ---------------------------------------------------------------------------

@cli.command()
@click.option('--model-dir', default='./model-server/DeepLIIF_Latest_Model/',
              help='reads models from here')
@click.option('--output-dir', help='saves results here', default=None)
@click.option('--verify/--no-verify', 'do_verify', default=True,
              help='run the eager-vs-serialized parity check')
@click.option('--epoch', default='latest',
              help='checkpoint suffix to serialize (reference --epoch)')
@click.option('--tile-size', default=None, type=int,
              help='parity-check tile size (default: model scale_size)')
@click.option('--device', default=None, help='ignored on TPU (torch compat)')
@click.option('--verbose', is_flag=True, help='print serialized net names')
def serialize(model_dir, output_dir, do_verify, epoch, tile_size, device,
              verbose):
    """Convert a model dir (torch or native) to the native npz artifact.

    Parity contract as the reference serialize (cli.py:763-830): the
    serialized model's output on a blank tile must match the source within
    sum|diff| <= 10 over a 512x512x3 tile in uint8 scale.
    """
    from .models import InferenceSession
    from .utils import checkpoints

    output_dir = output_dir or model_dir
    ensure_exists(output_dir)

    if device is not None:
        click.echo('note: --device is ignored on TPU')
    session = InferenceSession(model_dir, epoch=epoch)
    checkpoints.save_networks(output_dir, session.params)
    if verbose:
        for name in session.params:
            click.echo(f'serialized net {name}')
    for fn in ('train_opt.txt', 'config.json'):
        src = os.path.join(model_dir, fn)
        if os.path.exists(src) and os.path.abspath(model_dir) != os.path.abspath(output_dir):
            import shutil
            shutil.copy(src, os.path.join(output_dir, fn))
    click.echo(f'serialized networks -> {output_dir}')

    if do_verify:
        import numpy as np
        size = tile_size or getattr(session.opt, 'scale_size', 512)
        nc = 3 * getattr(session.opt, 'input_no', 1)
        rng = np.random.default_rng(0)
        tile = rng.integers(0, 255, (1, size, size, nc), np.uint8)
        reloaded = InferenceSession(output_dir)
        out1 = session.run_tiles(tile)
        out2 = reloaded.run_tiles(tile)
        diff = sum(float(np.abs(out1[k].astype(np.int64)
                                - out2[k].astype(np.int64)).sum())
                   for k in out1)
        assert diff <= 10, f'serialized-vs-original parity failed: {diff}'
        click.echo(f'parity check passed (sum|diff| = {diff:.1f} <= 10)')


@cli.command(name='import-model')
@click.option('--torch-dir', required=True,
              help='reference model dir (latest_net_G*.pth or G*.pt)')
@click.option('--output-dir', required=True, help='native model dir to write')
@click.option('--verify/--no-verify', 'do_verify', default=True,
              help='run the imported-vs-source parity check')
def import_model(torch_dir, output_dir, do_verify):
    """Convert a pretrained reference (torch) model dir to the native npz
    format. Activates the pixel-parity contract: once a pretrained dir is
    imported, tests/test_golden_parity.py checks SSIM >= 0.9997 against the
    shipped reference outputs (reference tests/test_cli_inference.py:8)."""
    from .models import InferenceSession
    from .utils import checkpoints

    ensure_exists(output_dir)
    session = InferenceSession(torch_dir)  # auto-imports torch state dicts
    checkpoints.save_networks(output_dir, session.params)
    import shutil
    for fn in ('train_opt.txt', 'config.json'):
        src = os.path.join(torch_dir, fn)
        if os.path.exists(src):
            shutil.copy(src, os.path.join(output_dir, fn))
    click.echo(f'imported {torch_dir} -> {output_dir}')

    if do_verify:
        import numpy as np
        size = getattr(session.opt, 'scale_size', 512)
        nc = 3 * getattr(session.opt, 'input_no', 1)
        tile = np.random.default_rng(0).integers(0, 255, (1, size, size, nc),
                                                 np.uint8)
        out1 = session.run_tiles(tile)
        out2 = InferenceSession(output_dir).run_tiles(tile)
        diff = sum(float(np.abs(out1[k].astype(np.int64)
                                - out2[k].astype(np.int64)).sum())
                   for k in out1)
        assert diff <= 10, f'import parity failed: sum|diff|={diff}'
        click.echo(f'parity check passed (sum|diff| = {diff:.1f} <= 10)')


# ---------------------------------------------------------------------------
# test
# ---------------------------------------------------------------------------

@cli.command()
@click.option('--input-dir', default='./Sample_Large_Tissues/', help='reads images from here')
@click.option('--output-dir', help='saves results here')
@click.option('--tile-size', type=click.IntRange(min=1), required=True)
@click.option('--model-dir', default='./model-server/DeepLIIF_Latest_Model/')
@click.option('--filename-pattern', default='*')
@click.option('--eager-mode', is_flag=True,
              help='kept for CLI parity; eager and serialized collapse to one jit path')
@click.option('--epoch', default='latest')
@click.option('--seg-intermediate', is_flag=True)
@click.option('--seg-only', is_flag=True)
@click.option('--mod-only', is_flag=True)
@click.option('--color-dapi', is_flag=True)
@click.option('--color-marker', is_flag=True)
@click.option('--btoa', '--BtoA', 'btoa', is_flag=True)
@click.option('--max-batch', default=None, type=int,
              help='tile-batch bucket cap (default: 128 bf16 / 16 f32 per '
                   'chip, scaled by the device count; 128 is the measured '
                   'v5e optimum)')
@click.option('--precision', default=None,
              type=click.Choice(['float32', 'bfloat16', 'int8']),
              help='override the model dir compute precision; int8 runs '
                   'interior convs on the int8 MXU path (fidelity table in '
                   'docs/Performance.md)')
@click.option('--int8-scope', default=None,
              type=click.Choice(['all', 'resblocks']),
              help='which convs --precision int8 quantizes: all (default) '
                   'or resblocks only — the fused-kernel trunk path that '
                   'keeps every other conv in the float path '
                   '(docs/Performance.md "fused int8 resblock kernel")')
@click.option('--device-quant', type=click.Choice(['auto', 'on', 'off']),
              default='auto', is_flag=False, flag_value='on',
              help='quantification engine: on = one jitted XLA program '
                   '(labeling/thresholds/overlays on device), off = host '
                   'path, auto = device when the seg canvas is already '
                   'device-resident, large, and D2H bandwidth is '
                   'PCIe-class (measured crossover, docs/Performance.md). '
                   'Bare --device-quant means on.')
@click.option('--gpu-ids', default=None, help='ignored on TPU (torch compat)')
def test(input_dir, output_dir, tile_size, model_dir, filename_pattern,
         eager_mode, epoch, seg_intermediate, seg_only, mod_only, color_dapi,
         color_marker, btoa, max_batch, precision, int8_scope, device_quant,
         gpu_ids):
    if gpu_ids is not None:
        click.echo('note: --gpu-ids is ignored on TPU')
    if int8_scope is not None:
        os.environ['DEEPLIIF_INT8_SCOPE'] = int8_scope
    """Run tiled inference + quantification over a directory of images."""
    from PIL import Image
    from .models import infer_modalities

    output_dir = output_dir or input_dir
    ensure_exists(output_dir)
    if mod_only:
        seg_only = seg_intermediate = False
    elif seg_intermediate and seg_only:
        seg_intermediate = False

    if filename_pattern == '*':
        image_files = [fn for fn in os.listdir(input_dir) if allowed_file(fn)]
    else:
        image_files = [os.path.basename(f)
                       for f in glob.glob(os.path.join(input_dir, filename_pattern))]
    click.echo(f'{len(image_files)} image files')

    opt = get_opt(model_dir, mode='test')
    opt.BtoA = btoa
    opt.epoch = epoch
    seg_weights = getattr(opt, 'seg_weights', None)
    print_options(opt)

    with click.progressbar(image_files, label=f'Processing {len(image_files)} images',
                           item_show_func=lambda fn: fn) as bar:
        for filename in bar:
            img = Image.open(os.path.join(input_dir, filename)).convert('RGB')
            images, scoring = infer_modalities(
                img, tile_size, model_dir, opt=opt,
                return_seg_intermediate=seg_intermediate,
                seg_only=seg_only, mod_only=mod_only, seg_weights=seg_weights,
                max_batch=max_batch,
                device_quant={'on': True, 'off': False}.get(device_quant,
                                                            'auto'),
                precision=precision)
            stem = filename.rsplit('.', 1)[0]
            for name, im in images.items():
                im.save(os.path.join(output_dir, f'{stem}_{name}.png'))
            if scoring is not None:
                with open(os.path.join(output_dir, f'{stem}.json'), 'w') as f:
                    json.dump(scoring, f, indent=2)


@cli.command(name='eval')
@click.option('--dataroot', required=True,
              help='dataset root containing the phase subfolder of aligned rows')
@click.option('--model-dir', required=True)
@click.option('--phase', default='test')
@click.option('--output-dir', default=None, help='default: <model-dir>/eval_<phase>')
@click.option('--num-test', default=50, type=int, help='how many rows to process')
@click.option('--seg-weights', default='', help='comma-separated; default: training weights')
def eval_dataset(dataroot, model_dir, phase, output_dir, num_test, seg_weights):
    """Dataset-driven eval over aligned rows (the reference's legacy
    `python test.py`, test.py:40-129): runs the generator ensemble on the A
    tile of each row and writes real_A / fake_B_* images + an HTML gallery.
    """
    import numpy as np
    import jax.numpy as jnp
    from .config import get_opt
    from .data.aligned import AlignedDataset
    from .models import init_nets
    from .utils.visualizer import save_images

    opt = get_opt(model_dir, mode='test')
    opt.dataroot = dataroot
    opt.preprocess = 'none'
    opt.no_flip = True
    weights = ([float(x) for x in seg_weights.split(',')] if seg_weights
               else None)
    session = init_nets(model_dir)
    output_dir = output_dir or os.path.join(model_dir, f'eval_{phase}')
    ensure_exists(output_dir)

    ds = AlignedDataset(opt, phase=phase)
    n = min(num_test, len(ds))
    for i in range(n):
        item = ds[i]
        a_u8 = ((item['A'] + 1) * 127.5).astype(np.uint8)[None]
        res = session.run_tiles(a_u8, seg_weights=weights)
        visuals = {'real_A': a_u8[0]}
        for k, v in res.items():
            name = ('fake_B_5' if k == 'GS'
                    else f"fake_B_{k[1:]}")
            visuals[name] = v[0]
        save_images(output_dir, visuals, item['A_paths'])
        click.echo(f'processed {os.path.basename(item["A_paths"])}')
    # simple gallery
    files = sorted(os.listdir(output_dir))
    rows = ''.join(f'<div style="display:inline-block;margin:4px;'
                   f'text-align:center"><img src="{f}" width="200"/>'
                   f'<br/>{f}</div>' for f in files if f.endswith('.png'))
    with open(os.path.join(output_dir, 'index.html'), 'w') as f:
        f.write(f'<html><body><h1>eval {phase}</h1>{rows}</body></html>')
    click.echo(f'wrote {n} results to {output_dir}')


def _resolve_wsi_tile_size(tile_size, input_dir, filename):
    """Autodetect the tile size from the slide's objective magnification
    when --tile-size is omitted (reference get_wsi_resolution,
    models/__init__.py:730-782); fallback 512 (40x)."""
    if tile_size is not None:
        return tile_size
    from .utils.wsi import get_wsi_resolution
    detected = get_wsi_resolution(os.path.join(input_dir, filename))
    if detected:
        click.echo(f'tile size {detected} from slide magnification metadata')
        return detected
    click.echo('no magnification metadata; using tile size 512 (40x)')
    return 512


@cli.command(name='test-wsi')
@click.option('--input-dir', required=True)
@click.option('--filename', required=True)
@click.option('--output-dir', required=True)
@click.option('--tile-size', type=click.IntRange(min=1), default=None,
              help='default: from slide magnification metadata, else 512')
@click.option('--model-dir', default='./model-server/DeepLIIF_Latest_Model/')
@click.option('--region-size', default=20000, type=int)
@click.option('--seg-intermediate', is_flag=True)
@click.option('--seg-only', is_flag=True)
@click.option('--color-dapi', is_flag=True,
              help='color the DAPI modality (reference test_wsi flag)')
@click.option('--color-marker', is_flag=True,
              help='color the marker modality (reference test_wsi flag)')
def test_wsi(input_dir, filename, output_dir, tile_size, model_dir,
             region_size, seg_intermediate, seg_only, color_dapi,
             color_marker):
    """Whole-slide inference: region streaming + stitched pyramid output."""
    from .utils.wsi import infer_results_for_wsi
    tile_size = _resolve_wsi_tile_size(tile_size, input_dir, filename)
    infer_results_for_wsi(input_dir, filename, output_dir, model_dir,
                          tile_size, region_size, seg_only=seg_only,
                          seg_intermediate=seg_intermediate,
                          color_dapi=color_dapi, color_marker=color_marker)


@cli.command(name='wsi-cells')
@click.option('--input-dir', required=True)
@click.option('--filename', required=True)
@click.option('--output-dir', required=True)
@click.option('--tile-size', type=click.IntRange(min=1), default=None,
              help='default: from slide magnification metadata, else 512')
@click.option('--model-dir', default='./model-server/DeepLIIF_Latest_Model/')
@click.option('--region-size', default=20000, type=int)
@click.option('--version', default=4, type=click.Choice(['3', '4', '5', '6']))
def wsi_cells(input_dir, filename, output_dir, tile_size, model_dir,
              region_size, version):
    """Per-cell encoded data for a WSI (global coordinates, averaged
    auto-thresholds) — the reference infer_cells_for_wsi path."""
    from .utils.wsi import infer_cells_for_wsi
    tile_size = _resolve_wsi_tile_size(tile_size, input_dir, filename)
    results = infer_cells_for_wsi(input_dir, filename, output_dir, model_dir,
                                  tile_size, region_size, version=int(version))
    click.echo(f'{len(results["cells"])} cells -> {output_dir}')


# ---------------------------------------------------------------------------
# data preparation
# ---------------------------------------------------------------------------

@cli.command(name='prepare-training-data')
@click.option('--input-dir', required=True, help='path to input images')
@click.option('--output-dir', required=True, help='path to output images')
@click.option('--validation-ratio', default=0.2, type=float)
@click.option('--seed', default=0, type=int)
def prepare_training_data(input_dir, output_dir, validation_ratio, seed):
    """Stitch paired stains (IHC/Hematoxylin/DAPI/Lap2/Marker/Seg) into
    training rows and split train/val (reference cli.py:941-982)."""
    import random
    from PIL import Image
    rng = random.Random(seed)
    train_dir = os.path.join(output_dir, 'train')
    val_dir = os.path.join(output_dir, 'val')
    ensure_exists(train_dir)
    ensure_exists(val_dir)
    stains = ['IHC', 'Hematoxylin', 'DAPI', 'Lap2', 'Marker', 'Seg']
    n = 0
    for img in sorted(os.listdir(input_dir)):
        if 'IHC' not in img:
            continue
        tiles = []
        for stain in stains:
            p = os.path.join(input_dir, img.replace('IHC', stain))
            tiles.append(np.asarray(
                Image.open(p).convert('RGB').resize((512, 512), Image.BICUBIC)))
        row = np.concatenate(tiles, axis=1)
        save_dir = val_dir if rng.random() < validation_ratio else train_dir
        Image.fromarray(row).save(os.path.join(save_dir, img))
        n += 1
    click.echo(f'wrote {n} training rows')


@cli.command(name='prepare-testing-data')
@click.option('--input-dir', required=True, help='path to input images')
@click.option('--dataset-dir', required=True, help='path to output dataset directory')
def prepare_testing_data(input_dir, dataset_dir):
    """Stitch IHC-only test rows (reference cli.py:985-1008)."""
    from PIL import Image
    test_dir = os.path.join(dataset_dir, 'test')
    ensure_exists(test_dir)
    n = 0
    for img in sorted(os.listdir(input_dir)):
        if 'IHC' not in img:
            continue
        a = np.asarray(Image.open(os.path.join(input_dir, img))
                       .convert('RGB').resize((512, 512), Image.BICUBIC))
        Image.fromarray(np.concatenate([a] * 6, axis=1)).save(
            os.path.join(test_dir, img))
        n += 1
    click.echo(f'wrote {n} test rows')


@cli.command(name='compute-statistics')
@click.option('--gt-dir', required=True, help='ground-truth images')
@click.option('--model-output-dir', required=True, help='inferred images')
@click.option('--model-name', default='DeepLIIF-TPU')
@click.option('--image-size', default=512, type=int)
@click.option('--output-csv', default=None, help='default: <model-output-dir>/statistics.csv')
@click.option('--with-swd', is_flag=True, help='also compute sliced Wasserstein distance')
@click.option('--with-aji', is_flag=True, help='also compute Aggregated Jaccard Index')
def compute_statistics(gt_dir, model_output_dir, model_name, image_size,
                       output_csv, with_swd, with_aji):
    """Evaluation harness (reference DeepLIIF_Statistics/ComputeStatistics.py:
    36-236): per-modality MSE/SSIM and per-class segmentation metrics over a
    directory of inferred images vs ground truth, written as CSV."""
    import csv
    import numpy as np
    from PIL import Image
    from . import stats

    output_csv = output_csv or os.path.join(model_output_dir, 'statistics.csv')
    rows = []
    seg_imgs, gt_seg_imgs = [], []
    for fn in sorted(os.listdir(model_output_dir)):
        if not fn.endswith('.png'):
            continue
        gt_path = os.path.join(gt_dir, fn)
        if not os.path.exists(gt_path):
            continue
        pred = np.asarray(Image.open(os.path.join(model_output_dir, fn))
                          .convert('RGB').resize((image_size, image_size)))
        gt = np.asarray(Image.open(gt_path).convert('RGB')
                        .resize((image_size, image_size)))
        # the reference protocol (ComputeStatistics.py:80-85): both images
        # through rgb2gray + img_as_float (so values in [0,1]), MSE on the
        # gray floats, SSIM with an 11x11 Gaussian window, population
        # covariance, and data_range=255 — reproduced bug-for-bug (the
        # [0,1]-scale/255-range mismatch is part of the published numbers)
        def _gray01(x):
            return (x @ np.asarray([0.2125, 0.7154, 0.0721])) / 255.0

        pg, gg = _gray01(pred.astype(np.float64)), _gray01(gt.astype(np.float64))
        row = {'Model': model_name, 'image_name': fn,
               'MSE': stats.mse(pg, gg),
               'SSIM': stats.ssim(pg, gg, data_range=255,
                                  gaussian_weights=True, sigma=1.5,
                                  use_sample_covariance=False),
               'PSNR': stats.psnr(pred, gt)}
        if 'Seg' in fn:
            seg = stats.segmentation_metrics_posneg(pred, gt, include_aji=with_aji)
            for cls, m in seg.items():
                for k, v in m.items():
                    row[f'{cls}_{k}'] = round(v, 3)
            seg_imgs.append(pred)
            gt_seg_imgs.append(gt)
        rows.append(row)

    if with_swd and seg_imgs:
        swd_res = stats.swd(seg_imgs, gt_seg_imgs)
        click.echo(f'SWD (seg vs gt): {swd_res}')

    if not rows:
        click.echo('no matching image pairs found')
        return
    keys = sorted({k for r in rows for k in r}, key=lambda k: (k != 'Model', k))
    with open(output_csv, 'w', newline='') as f:
        writer = csv.DictWriter(f, fieldnames=keys)
        writer.writeheader()
        writer.writerows(rows)
    mean_ssim = float(np.mean([r['SSIM'] for r in rows]))
    click.echo(f'{len(rows)} pairs -> {output_csv} (mean SSIM {mean_ssim:.4f})')


@cli.command()
@click.option('--model-dir', required=True, help='model directory to serve')
@click.option('--host', default='0.0.0.0')
@click.option('--port', default=8080, type=int)
@click.option('--max-batch', default=None, type=int,
              help='tile-batch bucket cap (default: 128 bf16 / 16 f32 per '
                   'chip, scaled by the device count)')
@click.option('--precision', default=None,
              type=click.Choice(['float32', 'bfloat16', 'int8']),
              help='override the model dir compute precision')
@click.option('--int8-scope', default=None,
              type=click.Choice(['all', 'resblocks']),
              help='which convs --precision int8 quantizes (see `test`)')
@click.option('--max-image-dim', default=4096, type=int,
              help='reject larger request images with 400 (the reference '
                   'cloud client bound, DeepliifClient.java:23-24); larger '
                   'inputs belong on test-wsi')
@click.option('--request-timeout', default=60.0, type=float,
              help='per-request budget in seconds -> 504 (the reference '
                   'cloud contract, README.md:406); 0 disables')
def serve(model_dir, host, port, max_batch, precision, int8_scope,
          max_image_dim, request_timeout):
    """Run the REST API server (POST /api/infer, /api/postprocess) —
    the reference cloud contract, so the ImageJ plugin works unchanged."""
    from .serve import serve as run_server
    if int8_scope is not None:
        os.environ['DEEPLIIF_INT8_SCOPE'] = int8_scope
    run_server(model_dir, host, port, max_batch, precision=precision,
               max_image_dim=max_image_dim,
               request_timeout=request_timeout or None)


@cli.command()
@click.option('--fixed', required=True,
              help='reference image the moving image is aligned to (IHC)')
@click.option('--moving', required=True,
              help='image to align (mpIF); resampled onto the fixed frame')
@click.option('--output', required=True, help='path for the aligned image')
@click.option('--translate', default=None,
              help='manual dx,dy (skips auto estimation)')
@click.option('--scale', default=1.0, type=float, help='manual scale factor')
@click.option('--rotate', default=0.0, type=float,
              help='manual rotation, degrees')
def register(fixed, moving, output, translate, scale, rotate):
    """Co-register an IHC/mpIF image pair: the headless equivalent of the
    reference's Tk registration app (reference
    Registration/Registration_App.py:22-281). With no manual transform,
    the translation is estimated automatically by FFT phase correlation;
    manual --translate/--scale/--rotate reproduce the app's controls.
    Prints the applied transform as JSON."""
    from PIL import Image
    from deepliif_tpu.utils.registration import apply_affine, register_pair
    fixed_img = Image.open(fixed).convert('RGB')
    moving_img = Image.open(moving).convert('RGB')
    if translate is None and scale == 1.0 and rotate == 0.0:
        aligned, info = register_pair(fixed_img, moving_img)
    else:
        dx, dy = (0, 0)
        if translate is not None:
            dx, dy = (int(v) for v in translate.split(','))
        aligned = apply_affine(moving_img, translate=(dx, dy), scale=scale,
                               rotate_deg=rotate, output_size=fixed_img.size)
        info = {'dx': dx, 'dy': dy, 'scale': scale, 'rotate_deg': rotate}
    ensure_exists(os.path.dirname(os.path.abspath(output)))
    aligned.save(output)
    print(json.dumps(info))


@cli.command()
@click.option('--pickle-dir', required=True,
              help='directory where the pickled snapshots are stored')
@click.option('--display-env', default=None, help='ignored (no visdom)')
def visualize(pickle_dir, display_env):
    """Poll pickled training snapshots and regenerate plots AND the image
    gallery (reference cli.py:1018-1052 replays both into visdom; we render
    JSON + a PNG/HTML gallery under <pickle-dir>/web/)."""
    import pickle
    import time as _time
    path_plot = os.path.join(pickle_dir, 'plot_current_losses.pickle')
    path_disp = os.path.join(pickle_dir, 'display_current_results.pickle')
    click.echo(f'watching {pickle_dir} (ctrl-c to stop)')
    mtimes = {path_plot: 0, path_disp: 0}
    history = []
    while True:
        try:
            if os.path.exists(path_plot):
                mtime = os.path.getmtime(path_plot)
                if mtime > mtimes[path_plot]:
                    mtimes[path_plot] = mtime
                    with open(path_plot, 'rb') as f:
                        rec = pickle.load(f)
                    history.append(rec)
                    out = os.path.join(pickle_dir, 'live_losses.json')
                    with open(out, 'w') as f:
                        json.dump(history, f)
                    click.echo(f'update @ x={rec["x"]:.3f}: '
                               + ' '.join(f'{k}={v:.3f}' for k, v in rec['losses'].items()))
            if os.path.exists(path_disp):
                mtime = os.path.getmtime(path_disp)
                if mtime > mtimes[path_disp]:
                    mtimes[path_disp] = mtime
                    with open(path_disp, 'rb') as f:
                        disp = pickle.load(f)
                    replay_display_snapshot(pickle_dir, disp)
                    click.echo(f'image grid @ epoch {disp.get("epoch")}: '
                               + ', '.join(disp.get('visuals', {})))
            _time.sleep(3)
        except KeyboardInterrupt:
            break


def replay_display_snapshot(pickle_dir, disp):
    """Write a display_current_results snapshot as PNGs + HTML gallery."""
    from PIL import Image
    web = os.path.join(pickle_dir, 'web')
    img_dir = os.path.join(web, 'images')
    ensure_exists(img_dir)
    epoch = disp.get('epoch', 0)
    for label, arr in disp.get('visuals', {}).items():
        Image.fromarray(np.asarray(arr)).save(
            os.path.join(img_dir, f'epoch{epoch:03d}_{label}.png'))
    files = sorted(os.listdir(img_dir), reverse=True)
    rows = ''.join(
        f'<div style="display:inline-block;margin:4px;text-align:center">'
        f'<img src="images/{f}" width="256"/><br/>{f}</div>'
        for f in files[:200])
    with open(os.path.join(web, 'index.html'), 'w') as f:
        f.write(f'<html><body><h1>replay</h1>{rows}</body></html>')


if __name__ == '__main__':
    cli()
