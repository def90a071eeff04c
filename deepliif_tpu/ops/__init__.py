"""Device-side (XLA / Pallas) compute ops beyond the network zoo:
connected-component labeling, on-device cell counting, overlay rendering."""

from .labeling import (label_components, flood_background, posneg_mask,
                       quantify, overlay_images, label_components_pallas)
