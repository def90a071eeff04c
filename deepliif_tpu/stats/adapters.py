"""Benchmark-dataset helper algorithms.

Equivalents of the reference's offline HelperFunctions
(/root/reference/DeepLIIF_Statistics/HelperFunctions.py:18-667): extraction
of detection points from masks, marker-based watershed splitting of touching
cells, and point-set detection metrics used when comparing against
cell-detection benchmarks (BCData, NuClick, PathoNet-style point
annotations).
"""

from __future__ import annotations

import heapq

import numpy as np
from scipy import ndimage

_S8 = np.ones((3, 3), bool)


def detection_points_from_mask(mask, min_size=1):
    """Centroids (x, y) of connected components of a binary mask."""
    lab, n = ndimage.label(np.asarray(mask) > 0, structure=_S8)
    pts = []
    if n:
        sizes = np.bincount(lab.ravel())
        centers = ndimage.center_of_mass(np.ones_like(lab), lab,
                                         np.arange(1, n + 1))  # list of (y, x)
        for i, (cy, cx) in enumerate(centers, start=1):
            if sizes[i] >= min_size:
                pts.append((float(cx), float(cy)))
    return pts


def watershed(elevation, markers, mask=None):
    """Marker-based watershed by ordered flooding (priority queue).

    elevation : 2D array (lower floods first)
    markers   : 2D int array, >0 seed labels, 0 unknown
    mask      : optional boolean region to flood
    Returns the label image.
    """
    elevation = np.asarray(elevation, np.float64)
    labels = np.asarray(markers, np.int32).copy()
    if mask is None:
        mask = np.ones_like(labels, bool)
    else:
        mask = np.asarray(mask, bool)
    h, w = labels.shape
    heap = []
    counter = 0
    ys, xs = np.nonzero(labels > 0)
    for y, x in zip(ys, xs):
        heapq.heappush(heap, (elevation[y, x], counter, y, x))
        counter += 1
    nbrs = ((-1, 0), (1, 0), (0, -1), (0, 1))
    while heap:
        _, _, y, x = heapq.heappop(heap)
        lbl = labels[y, x]
        for dy, dx in nbrs:
            ny, nx = y + dy, x + dx
            if 0 <= ny < h and 0 <= nx < w and mask[ny, nx] and labels[ny, nx] == 0:
                labels[ny, nx] = lbl
                heapq.heappush(heap, (elevation[ny, nx], counter, ny, nx))
                counter += 1
    return labels


def split_touching_cells(mask, min_distance_ratio=0.5):
    """Split touching cells in a binary mask via distance-transform watershed
    (the reference's cell-splitting approach for benchmark masks)."""
    mask = np.asarray(mask) > 0
    dist = ndimage.distance_transform_edt(mask)
    if dist.max() == 0:
        return np.zeros(mask.shape, np.int32)
    # seeds: local maxima of the distance transform
    footprint = np.ones((5, 5), bool)
    maxima = (dist == ndimage.maximum_filter(dist, footprint=footprint)) & \
        (dist > min_distance_ratio * dist.max())
    markers, _ = ndimage.label(maxima, structure=_S8)
    return watershed(-dist, markers, mask=mask)


def match_detections(pred_points, gt_points, max_distance=10.0):
    """Greedy nearest matching of predicted points to GT points within
    max_distance; returns precision/recall/F1 and the match count."""
    pred = list(pred_points)
    gt = list(gt_points)
    if not pred or not gt:
        tp = 0
    else:
        p = np.asarray(pred, np.float64)
        g = np.asarray(gt, np.float64)
        d = np.sqrt(((p[:, None, :] - g[None, :, :]) ** 2).sum(-1))
        tp = 0
        used_p = np.zeros(len(pred), bool)
        used_g = np.zeros(len(gt), bool)
        order = np.dstack(np.unravel_index(np.argsort(d.ravel()), d.shape))[0]
        for pi, gi in order:
            if d[pi, gi] > max_distance:
                break
            if not used_p[pi] and not used_g[gi]:
                used_p[pi] = used_g[gi] = True
                tp += 1
    fp = len(pred) - tp
    fn = len(gt) - tp
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall else 0.0)
    return {'tp': tp, 'fp': fp, 'fn': fn, 'precision': precision,
            'recall': recall, 'f1': f1}


# ---------------------------------------------------------------------------
# benchmark-dataset file readers (reference HelperFunctions.py:18-667)
# ---------------------------------------------------------------------------

def read_bcdata_points(positive_path, negative_path):
    """BCData point annotations: HDF5 files with a 'coordinates' dataset of
    (x, y) pairs per class (reference read_BC_detection_point,
    HelperFunctions.py:51-66). h5py is not installed in every environment;
    a sibling .npy file with the same coordinates array is accepted as a
    fallback. Returns (positive_points, negative_points) as (x, y) lists."""
    import os

    def load(path):
        if path is None or not os.path.exists(path):
            return []
        if path.endswith('.npy'):
            return [tuple(map(int, c)) for c in np.load(path)]
        try:
            import h5py
        except ImportError as e:
            alt = path.rsplit('.', 1)[0] + '.npy'
            if os.path.exists(alt):
                return [tuple(map(int, c)) for c in np.load(alt)]
            raise ImportError(
                'h5py is required for BCData .h5 annotations (or provide a '
                f'.npy fallback next to {path})') from e
        with h5py.File(path, 'r') as f:
            return [tuple(map(int, c)) for c in np.asarray(f['coordinates'])]

    return load(positive_path), load(negative_path)


def points_to_mask(points, shape=(640, 640)):
    """Point list -> sparse uint8 mask with 255 at each (x, y) (reference
    read_BC_detection_mask, HelperFunctions.py:27-49)."""
    mask = np.zeros(shape, np.uint8)
    for x, y in points:
        if 0 <= int(y) < shape[0] and 0 <= int(x) < shape[1]:
            mask[int(y), int(x)] = 255
    return mask


def read_pathonet_points(points_txt):
    """PathoNet '<image>_points.txt' rows of (x, y, class): class 1 is
    immunonegative, everything else immunopositive (reference
    read_PathoNet_data, HelperFunctions.py:230-248). Returns
    (positive_points, negative_points) as (x, y) int tuples."""
    points = np.loadtxt(points_txt)
    if points.ndim == 1:
        points = points[None]
    pos, neg = [], []
    for p in points:
        (neg if int(p[2]) == 1 else pos).append((int(p[0]), int(p[1])))
    return pos, neg


def read_nuclick_mask(npy_path):
    """NuClick instance-labeled .npy mask -> RGB evaluation mask: cell
    interiors blue (0,0,255), instance boundaries white, ~2 px (reference
    read_NuClick_mask, HelperFunctions.py:111-141)."""
    lab = np.load(npy_path)
    out = np.zeros(lab.shape + (3,), np.uint8)
    out[lab > 0] = (0, 0, 255)
    # boundary: pixel whose 8-neighborhood contains a different label
    grown = ndimage.maximum_filter(lab, size=3)
    shrunk = ndimage.minimum_filter(lab, size=3)
    boundary = (grown != shrunk)
    boundary = ndimage.binary_dilation(boundary, structure=_S8)
    out[boundary & (grown > 0)] = (255, 255, 255)
    return out


def read_instance_mask_dir(input_dir, image_size, mode='segmentation'):
    """Mask-RCNN-style per-instance output dirs: files named
    '<image>_<instance>_<class>_<score>.png' with class 1 = positive
    (reference read_mask_rcnn_segmentation_masks / _detection_masks,
    HelperFunctions.py:257-309).

    mode='segmentation' -> {image: {'positive','negative','binary'} masks};
    mode='detection'    -> {image: {'positive','negative','binary'} center
    lists (y, x)}."""
    import os
    from PIL import Image

    masks = {}
    for fn in sorted(os.listdir(input_dir)):
        if not fn.endswith('.png'):
            continue
        parts = fn[:-4].split('_')
        if len(parts) < 4:
            continue
        image_name = '_'.join(parts[:-3]) + '_' + parts[-3]
        cell_type = 'positive' if parts[-2] == '1' else 'negative'
        img = np.asarray(Image.open(os.path.join(input_dir, fn)).convert('RGB')
                         .resize((image_size, image_size)))
        bw = (img > 250).any(axis=2)
        if not bw.any():
            continue
        if mode == 'segmentation':
            entry = masks.setdefault(image_name, {
                k: np.zeros((image_size, image_size), np.uint8)
                for k in ('positive', 'negative', 'binary')})
            entry[cell_type][bw] = 1
            entry['binary'][bw] = 1
        else:
            ys, xs = np.nonzero(bw)
            # (x, y), matching every other point producer in this module
            # (detection_points_from_mask etc.) so match_detections never
            # compares transposed coordinates
            center = (int((xs.min() + xs.max()) / 2),
                      int((ys.min() + ys.max()) / 2))
            entry = masks.setdefault(image_name,
                                     {'positive': [], 'negative': [],
                                      'binary': []})
            entry[cell_type].append(center)
            entry['binary'].append(center)
    return masks


# ---------------------------------------------------------------------------
# log-area error maps (reference create_log_area_mask*, HelperFunctions.py:
# 543-637): per predicted component, log2(pred_size / matched_gt_size)
# clamped to [-2, 2]; unmatched components get the sentinel 5 (yellow).
# ---------------------------------------------------------------------------

_UNMATCHED = 5.0


def log_area_values(predicted, gt):
    """Per-pixel log2 area-ratio value map for one class channel."""
    smooth = 1e-4
    out = np.zeros(predicted.shape, np.float64)
    lab, n = ndimage.label(predicted > 0)
    lab_gt, _ = ndimage.label(gt > 0)
    for c in range(1, n + 1):
        comp = lab == c
        overlap = lab_gt[comp & (gt > 0)]
        overlap = overlap[overlap > 0]
        if overlap.size == 0:
            out[comp] = _UNMATCHED
            continue
        gt_size = int((lab_gt == overlap[0]).sum())
        v = np.log2((comp.sum() + smooth) / (gt_size + smooth))
        out[comp] = min(v, 2.0) if v >= 0 else max(v, -2.0)
    return out


def _log_area_colorize(values, kind):
    """Value -> RGB per the reference color rules (positive: reds,
    negative: blues; unmatched yellow)."""
    h, w = values.shape
    img = np.zeros((h, w, 3), np.uint8)
    pos = kind == 'positive'
    exact = (values >= -0.5) & (values <= 0.5)
    img[exact] = (255, 0, 0) if pos else (0, 0, 255)
    over = values > 0.5
    if over.any():
        v = np.clip(127.5 / values[over], 0, 255).astype(np.uint8)
        img[over] = 0
        img[..., 0 if pos else 2][over] = v
    under = (values < -0.5) & (values != _UNMATCHED)
    if under.any():
        v = (255 - np.clip(127.5 / np.abs(values[under]), 0, 255)).astype(np.uint8)
        if pos:
            img[..., 0][under] = 255
            img[..., 1][under] = v
            img[..., 2][under] = v
        else:
            img[..., 0][under] = v
            img[..., 1][under] = v
            img[..., 2][under] = 255
    img[values == _UNMATCHED] = (255, 255, 0)
    return img


def log_area_error_map(predicted_mask, gt_mask):
    """RGB log-area error map over a (H, W, 3) posneg mask pair: channel 0 =
    positive cells, channel 2 = negative cells (reference
    create_log_area_mask, HelperFunctions.py:609-620)."""
    vals_pos = log_area_values(predicted_mask[:, :, 0], gt_mask[:, :, 0])
    vals_neg = log_area_values(predicted_mask[:, :, 2], gt_mask[:, :, 2])
    out = np.zeros(predicted_mask.shape[:2] + (3,), np.uint8)
    pos_px = predicted_mask[:, :, 0] > 0
    neg_px = predicted_mask[:, :, 2] > 0
    out[pos_px] = _log_area_colorize(vals_pos, 'positive')[pos_px]
    out[neg_px] = _log_area_colorize(vals_neg, 'negative')[neg_px]
    return out


def log_area_colormap_legend(kind='positive'):
    """Vertical legend strip for the log-area colormap (reference
    create_color_map_image, HelperFunctions.py:621-637)."""
    values = np.linspace(-2, 2, 400)[None, :].repeat(100, axis=0)
    img = _log_area_colorize(values, kind)
    return img
