"""Device-side (XLA / Pallas) compute ops beyond the network zoo:
connected-component labeling, on-device cell counting, auto thresholds,
overlay rendering."""

from .labeling import (auto_marker_threshold, auto_size_threshold,
                       flood_background, label_components,
                       label_components_pallas, overlay_images, posneg_mask,
                       quantify)
