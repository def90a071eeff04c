"""Sub-pixel phase decomposition of stride-2 transposed conv (EXPERIMENT).

Numerically exact alternative to nets.layers.conv_transpose2d's input-dilated
form with 4x fewer MACs, but measured 19% SLOWER end-to-end on v5e: the phase
interleave is a full-tensor HBM shuffle and XLA:TPU already lowers
lhs_dilation convs efficiently on the MXU. See nets/layers.py:conv_transpose2d
for the production path and docs/Performance.md for the measurement.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_DN = ('NHWC', 'HWIO', 'NHWC')


def conv_transpose2d_phases(x, w, k):
    """Derivation from the dilated form with left pad L = k-1-padding:
    out[o] = sum_t P[o+t]*w[t] where P[L + 2i] = x[i]:

      k=3 (L=1): out[2m]   = w[1] x[m]
                 out[2m+1] = w[0] x[m] + w[2] x[m+1]
      k=4 (L=2): out[2m]   = w[0] x[m-1] + w[2] x[m]
                 out[2m+1] = w[1] x[m]   + w[3] x[m+1]

    Each 2D phase (ry, rx) is a dense conv of the per-axis taps; phases are
    interleaved back with a pixel-shuffle reshape.
    """
    n, h, wd, _ = x.shape
    if k == 3:
        # per-axis: phase 0 -> taps [w1] pad (0,0); phase 1 -> [w0, w2] pad (0,1)
        taps = {0: ([1], (0, 0)), 1: ([0, 2], (0, 1))}
    else:
        # k=4: phase 0 -> [w0, w2] pad (1,0); phase 1 -> [w1, w3] pad (0, 1)
        taps = {0: ([0, 2], (1, 0)), 1: ([1, 3], (0, 1))}

    phases = []
    for ry in (0, 1):
        row = []
        for rx in (0, 1):
            ti, py = taps[ry]
            tj, px = taps[rx]
            sub = w[jnp.asarray(ti)][:, jnp.asarray(tj)]
            ph = jax.lax.conv_general_dilated(
                x, sub, (1, 1), [py, px], dimension_numbers=_DN)
            row.append(ph)
        phases.append(row)
    # interleave: out[2my+ry, 2mx+rx] = phases[ry][rx][my, mx]
    stacked = jnp.stack([jnp.stack(r, axis=3) for r in phases], axis=2)
    # (N, H, 2, W, 2, C) -> (N, 2H, 2W, C)
    return stacked.reshape(n, h * 2, wd * 2, stacked.shape[-1])
