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
        (dist > min_distance_ratio * dist.max() * 0.2)
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
