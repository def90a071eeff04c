"""Evaluation metrics suite.

Re-implements the reference's offline evaluation tooling
(/root/reference/DeepLIIF_Statistics/) in numpy/JAX:
  * segmentation: IOU/precision/recall/F1/Dice/pixAcc with the reference's
    zero-TP special case (Segmentation_Metrics.py:13-58) and AJI
    (Aggregated Jaccard Index, greedy matching, :66-105), per pos/neg channel;
  * image: MSE, PSNR, SSIM (skimage-default 7x7 uniform window);
  * SWD (sliced Wasserstein distance over Laplacian pyramids, swd.py);
  * Inception Score / FID with a pluggable feature extractor — pretrained
    InceptionV3 weights are not downloadable in this environment, so the
    default embedding is the fixed-seed VGG19 features (documented
    deviation; pass your own `features_fn` for paper-parity numbers);
  * get_cell_count_metrics: ground-truth cell-count generator feeding the
    --with-val RMSE (reference deepliif/stat/__init__.py:8-96).
"""

from __future__ import annotations

import json
import os

import numpy as np
from scipy import ndimage

_S8 = np.ones((3, 3), bool)


# ---------------------------------------------------------------------------
# segmentation metrics
# ---------------------------------------------------------------------------

def compute_metrics(mask_img, gt_img):
    """Binary metrics with the reference's zero-TP convention
    (Segmentation_Metrics.py:13-40)."""
    mask = np.asarray(mask_img) > 0
    gt = np.asarray(gt_img) > 0
    tp = int(np.sum(mask & gt))
    fp = int(np.sum(mask & ~gt))
    fn = int(np.sum(~mask & gt))
    tn = int(np.sum(~mask & ~gt))
    if tp == 0:
        if gt.any() or fp > 0:
            return dict(IOU=0., precision=0., recall=0., f1=0., Dice=0., PixAcc=0.)
        return dict(IOU=1., precision=1., recall=1., f1=1., Dice=1., PixAcc=1.)
    iou = tp / (tp + fp + fn)
    precision = tp / (tp + fp)
    recall = tp / (tp + fn)
    f1 = 2 * precision * recall / (precision + recall)
    dice = 2 * tp / (2 * tp + fp + fn)
    pixacc = (tp + tn) / (tp + tn + fp + fn)
    return dict(IOU=iou, precision=precision, recall=recall, f1=f1,
                Dice=dice, PixAcc=pixacc)


def compute_aji(gt_image, mask_image):
    """Aggregated Jaccard Index with greedy unmarked-best matching
    (Segmentation_Metrics.py:66-105), vectorized via label histograms."""
    gt_lab, n_gt = ndimage.label(np.asarray(gt_image) > 0, structure=_S8)
    mk_lab, n_mk = ndimage.label(np.asarray(mask_image) > 0, structure=_S8)
    if n_gt == 0 and n_mk == 0:
        return 0.0
    gt_sizes = np.bincount(gt_lab.ravel(), minlength=n_gt + 1)
    mk_sizes = np.bincount(mk_lab.ravel(), minlength=n_mk + 1)
    # pairwise intersections via joint histogram
    joint = np.zeros((n_gt + 1, n_mk + 1), np.int64)
    np.add.at(joint, (gt_lab.ravel(), mk_lab.ravel()), 1)

    marked = np.zeros(n_mk + 1, bool)
    total_intersection = 0
    total_union = 0
    for g in range(1, n_gt + 1):
        inter = joint[g].copy()
        inter[0] = 0
        inter[marked] = 0
        best, best_i = 0, -1
        # reference picks the first strictly-larger intersection in mask order
        for i in range(1, n_mk + 1):
            if inter[i] > best:
                best, best_i = int(inter[i]), i
        if best > 0:
            marked[best_i] = True
            total_intersection += best
            total_union += int(gt_sizes[g] + mk_sizes[best_i] - best)
    total_u = int(mk_sizes[1:][~marked[1:]].sum())
    denom = total_union + total_u
    return total_intersection / denom if denom > 0 else 0.0


def segmentation_metrics_posneg(mask_rgb, gt_rgb, include_aji=False):
    """Per pos (R) / neg (B) channel metrics (Segmentation_Metrics.py:120-180)."""
    mask_rgb = np.asarray(mask_rgb)
    gt_rgb = np.asarray(gt_rgb)
    out = {}
    for name, ch in (('Positive', 0), ('Negative', 2)):
        m = compute_metrics(mask_rgb[..., ch], gt_rgb[..., ch])
        if include_aji:
            m['AJI'] = compute_aji(gt_rgb[..., ch], mask_rgb[..., ch])
        out[name] = {k: v * 100 for k, v in m.items()}
    return out


# ---------------------------------------------------------------------------
# image similarity
# ---------------------------------------------------------------------------

def mse(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(((a - b) ** 2).mean())


def psnr(a, b, data_range=255.0):
    m = mse(a, b)
    if m == 0:
        return float('inf')
    return float(10 * np.log10(data_range ** 2 / m))


def ssim(a, b, data_range=None, win_size=7, gaussian_weights=False,
         sigma=1.5, use_sample_covariance=True):
    """Mean SSIM (K1=0.01, K2=0.03). Defaults match skimage's defaults
    (uniform win_size window, sample covariance); the reference evaluation
    protocol (DeepLIIF_Statistics/ComputeStatistics.py:84) is
    gaussian_weights=True, sigma=1.5, use_sample_covariance=False —
    an 11x11 Gaussian window with population covariance."""
    a = np.asarray(a, np.float64)
    orig_b = np.asarray(b)
    b = orig_b.astype(np.float64)
    if a.ndim == 3:
        return float(np.mean([
            ssim(a[..., c], b[..., c], data_range, win_size,
                 gaussian_weights, sigma, use_sample_covariance)
            for c in range(a.shape[-1])]))
    if data_range is None:
        # dtype range for uint8 (the skimage default); observed range as
        # the float fallback
        data_range = 255.0 if orig_b.dtype == np.uint8 \
            else b.max() - b.min()
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    if gaussian_weights:
        # skimage: truncate the kernel at 3.5 sigma -> win 11 for 1.5
        truncate = 3.5
        win_size = 2 * int(truncate * sigma + 0.5) + 1

        def f(x):
            return ndimage.gaussian_filter(x, sigma, truncate=truncate)
    else:
        def f(x):
            return ndimage.uniform_filter(x, win_size)
    if use_sample_covariance:
        n = win_size ** 2
        cov_norm = n / (n - 1)
    else:
        cov_norm = 1.0

    ux, uy = f(a), f(b)
    uxx, uyy, uxy = f(a * a), f(b * b), f(a * b)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux ** 2 + uy ** 2 + c1) * (vx + vy + c2))
    pad = (win_size - 1) // 2
    return float(s[pad:-pad, pad:-pad].mean())


# ---------------------------------------------------------------------------
# SWD (sliced Wasserstein distance; reference swd.py:97-157)
# ---------------------------------------------------------------------------

_GAUSS5 = np.array([1, 4, 6, 4, 1], np.float64)
_GAUSS5 = np.outer(_GAUSS5, _GAUSS5) / 256.0


def _pyr_down(x):
    # blur + stride 2 (per channel)
    out = np.stack([ndimage.convolve(x[..., c], _GAUSS5, mode='reflect')
                    for c in range(x.shape[-1])], -1)
    return out[::2, ::2]


def _pyr_up(x, shape):
    up = np.zeros((x.shape[0] * 2, x.shape[1] * 2, x.shape[2]))
    up[::2, ::2] = x * 4
    up = np.stack([ndimage.convolve(up[..., c], _GAUSS5, mode='reflect')
                   for c in range(x.shape[-1])], -1)
    return up[:shape[0], :shape[1]]


def laplacian_pyramid(img, n_levels):
    pyr = [np.asarray(img, np.float64)]
    for _ in range(n_levels):
        pyr.append(_pyr_down(pyr[-1]))
    lap = []
    for i in range(len(pyr) - 1):
        lap.append(pyr[i] - _pyr_up(pyr[i + 1], pyr[i].shape))
    lap.append(pyr[-1])
    return lap


def swd(images_a, images_b, n_levels=None, n_descriptors=128, patch=7,
        n_repeat_projection=128, proj_per_repeat=4, seed=0):
    """Sliced Wasserstein distance between two image sets, the reference
    protocol exactly (DeepLIIF_Statistics/swd.py:97-157, compute_swd
    :153-157): images scaled to [0,1]; Laplacian pyramid with
    n_pyramids = round(log2(H/16)); per level, the SAME ``n_descriptors``
    random patch positions are extracted from every image of BOTH sets
    (paired sampling); patches normalize per CHANNEL over the whole
    stack; projections are Gaussian normalized by per-column std (128
    repeats x 4); sorted-projection L1, scaled x1e3. Returns per-level +
    mean distances on the reference's scale."""
    rng = np.random.default_rng(seed)
    a = np.asarray(images_a, np.float64) / 255.0
    b = np.asarray(images_b, np.float64) / 255.0
    if a.shape != b.shape:
        raise ValueError(f'image sets must match: {a.shape} vs {b.shape}')
    if a.ndim == 3:
        a, b = a[..., None], b[..., None]
    h = a.shape[1]
    if n_levels is None:
        n_levels = max(0, int(np.rint(np.log2(max(1, h // 16)))))
    pyr_a = [laplacian_pyramid(img, n_levels) for img in a]
    pyr_b = [laplacian_pyramid(img, n_levels) for img in b]

    def patches(pyrs, level, ys, xs):
        out = []
        for p in pyrs:
            lap = p[level]
            for y, x in zip(ys, xs):
                out.append(lap[y:y + patch, x:x + patch])
        # (n_img * n_desc, ph, pw, C) -> per-CHANNEL normalization over
        # the whole stack (reference extract_patches :90-92)
        d = np.asarray(out)
        mean = d.mean(axis=(0, 1, 2), keepdims=True)
        std = d.std(axis=(0, 1, 2), keepdims=True)
        d = (d - mean) / (std + 1e-8)
        return d.reshape(len(out), -1)

    results = {}
    level_vals = []
    for level in range(n_levels + 1):
        lh, lw = pyr_a[0][level].shape[:2]
        if lh < patch or lw < patch:
            continue
        # reference: one shared index draw per level, patch origins over
        # the (H-6)x(W-6) interior, identical for both sets
        n_pos = (lh - patch + 1) * (lw - patch + 1)
        idx = rng.permutation(n_pos)[:n_descriptors]
        ys, xs = idx // (lw - patch + 1), idx % (lw - patch + 1)
        pa = patches(pyr_a, level, ys, xs)
        pb = patches(pyr_b, level, ys, xs)
        dists = []
        for _ in range(n_repeat_projection):
            proj = rng.normal(size=(pa.shape[1], proj_per_repeat))
            proj /= proj.std(axis=0, keepdims=True)
            sa = np.sort(pa @ proj, axis=0)
            sb = np.sort(pb @ proj, axis=0)
            dists.append(np.abs(sa - sb).mean())
        results[f'level_{level}'] = float(np.mean(dists) * 1e3)
        level_vals.append(results[f'level_{level}'])
    if not level_vals:
        raise ValueError(
            f'images too small for SWD: every pyramid level is below the '
            f'{patch}px patch size')
    results['mean'] = float(np.mean(level_vals))
    return results


# ---------------------------------------------------------------------------
# IS / FID with pluggable features
# ---------------------------------------------------------------------------

def load_inception_npz(path):
    """Load converted torchvision inception_v3 weights (produced by
    `utils.torch_import.convert_inception_v3`) into the stats.inception
    pytree."""
    import jax.numpy as jnp
    data = np.load(path)
    p = {}
    for key in data.files:
        node = p
        parts = key.split('.')
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = jnp.asarray(data[key])
    return p


def inception_features_fn(weights_path, batch=16):
    """Paper-comparable FID features: Inception-V3 pool3 from converted
    torchvision weights (reference DeepLIIF_Statistics/fid.py semantics).
    One download away in egress-blocked environments — see
    docs/Statistics notes."""
    from . import inception
    return inception.make_features_fn(load_inception_npz(weights_path),
                                      batch=batch)


def default_features_fn():
    """FID embedding. If converted Inception-V3 weights are available
    (DEEPLIIF_INCEPTION_NPZ env var, or ./inception_v3.npz), uses the real
    Inception pool3 features — paper-comparable. Otherwise falls back to a
    fixed-seed VGG19 embedding (mean-pooled slice-5 features): relative
    comparisons only."""
    import os
    explicit = os.environ.get('DEEPLIIF_INCEPTION_NPZ')
    if explicit:
        if not os.path.exists(explicit):
            # never silently fall back to the VGG embedding (a different
            # numeric scale) when the user asked for Inception
            raise FileNotFoundError(
                f'DEEPLIIF_INCEPTION_NPZ={explicit} does not exist '
                '(see scripts/download_inception_weights.sh)')
        return inception_features_fn(explicit)
    if os.path.exists('inception_v3.npz'):
        print('FID/IS embedding: Inception-V3 (./inception_v3.npz)')
        return inception_features_fn('inception_v3.npz')
    import jax
    import jax.numpy as jnp
    from ..nets import vgg
    params = vgg.init(jax.random.PRNGKey(19))

    @jax.jit
    def fn(x):  # x: (B,H,W,3) in [-1,1]
        feats = vgg.features(params, x)[-1]
        return feats.mean(axis=(1, 2))

    def wrapper(images_u8):
        x = jnp.asarray(np.asarray(images_u8, np.float32) / 127.5 - 1.0)
        return np.asarray(fn(x))
    return wrapper


def frechet_distance(feats_a, feats_b, eps=1e-6):
    from scipy import linalg
    mu1, mu2 = feats_a.mean(0), feats_b.mean(0)
    s1 = np.cov(feats_a, rowvar=False)
    s2 = np.cov(feats_b, rowvar=False)
    diff = mu1 - mu2
    covmean = linalg.sqrtm(s1 @ s2)
    if not np.isfinite(covmean).all():
        offset = np.eye(s1.shape[0]) * eps
        covmean = linalg.sqrtm((s1 + offset) @ (s2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(s1) + np.trace(s2) - 2 * np.trace(covmean))


def fid(images_a, images_b, features_fn=None):
    features_fn = features_fn or default_features_fn()
    return frechet_distance(features_fn(images_a), features_fn(images_b))


def inception_score(images, classifier_fn=None, splits=10):
    """IS = exp(E KL(p(y|x) || p(y))). classifier_fn: images -> logits."""
    if classifier_fn is None:
        feats_fn = default_features_fn()

        def classifier_fn(imgs):
            f = feats_fn(imgs)
            e = np.exp(f - f.max(1, keepdims=True))
            return e / e.sum(1, keepdims=True)
    probs = classifier_fn(images)
    scores = []
    n = len(probs)
    for i in range(splits):
        part = probs[i * n // splits:(i + 1) * n // splits]
        if len(part) == 0:
            continue
        py = part.mean(0, keepdims=True)
        kl = (part * (np.log(part + 1e-12) - np.log(py + 1e-12))).sum(1).mean()
        scores.append(np.exp(kl))
    return float(np.mean(scores)), float(np.std(scores))


# ---------------------------------------------------------------------------
# cell-count ground truth (reference deepliif/stat/__init__.py:8-96)
# ---------------------------------------------------------------------------

def get_cell_count_metrics(dir_seg, dir_input=None, dir_save=None,
                           model='DeepLIIF', tile_size=512, single_tile=False,
                           use_marker=False, suffix_seg='5', suffix_marker='4',
                           save_individual=False, seg_thresh=None):
    from PIL import Image
    from ..models import postprocess

    dir_save = dir_save or dir_seg
    dir_input = dir_input or dir_seg
    if single_tile:
        fns = {('_'.join(x.split('_')[:-1]))
               for x in os.listdir(dir_seg)
               if x.endswith(f'_{suffix_seg}.png') or x.endswith(f'_{suffix_marker}.png')}
        fns = sorted(fns)
    else:
        fns = sorted(x for x in os.listdir(dir_seg) if x.endswith('.png'))

    d_metrics = {}
    for fn in fns:
        if single_tile:
            img_gt = Image.open(os.path.join(dir_seg, f'{fn}_{suffix_seg}.png'))
            img_marker = Image.open(os.path.join(dir_seg, f'{fn}_{suffix_marker}.png'))
            img_input = Image.open(os.path.join(dir_input, f'{fn}.png'))
            k = fn
        else:
            img = Image.open(os.path.join(dir_seg, fn))
            w, h = img.size
            img_input = img.crop((0, 0, h, h))
            img_gt = img.crop((w - h, 0, w, h))
            img_marker = img.crop((w - h * 2, 0, w - h, h))
            k = os.path.splitext(fn)[0]
        images = {'Seg': img_gt}
        if use_marker:
            images['Marker'] = img_marker
        kwargs = {} if seg_thresh is None else {'seg_thresh': seg_thresh}
        _, scoring = postprocess(img_input, images, tile_size, model, **kwargs)
        d_metrics[k] = scoring
        if save_individual:
            with open(os.path.join(dir_save, f'{k}.json'), 'w') as f:
                json.dump(scoring, f, indent=2)

    with open(os.path.join(dir_save, 'metrics.json'), 'w') as f:
        json.dump(d_metrics, f, indent=2)
    return d_metrics
